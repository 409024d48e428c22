"""Inference fast path: weights-only coarse pass + scanned whole-frame
rendering must be output-identical to the reference-parity slow path.

The fast path (RenderConfig.coarse_shading=False + make_frame_render_fn)
is a pure execution-strategy change: apply_field_density shares
trunk+sigma with the full query, so the importance-resampling weights —
and therefore every fine buffer — are bit-identical; the scanned frame
renderer only re-tiles the dispatch. These tests pin that equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.render import (
    RenderConfig,
    make_ray_batch,
    render_rays,
    make_frame_render_fn,
    render_frame,
)

B, NS, NI = 24, 16, 8


@pytest.fixture(scope="module")
def setup():
    fcfg = FieldConfig(depth=4, width=64, coarse_radiance_number=2)
    rcfg = RenderConfig(
        field=fcfg, n_samples=NS, n_importance=NI, perturb=False,
        raw_noise_std=0.0, approximate_radiance=True,
        normal_type="normal_map_from_depth_gradient_epsilon",
        correct_depth_for_prefiltered_radiance_infer=True)
    k1, k2 = jax.random.split(jax.random.key(3))
    variables = {"coarse": init_field_params(k1, fcfg),
                 "fine": init_field_params(k2, fcfg)}
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    rng = np.random.default_rng(11)
    rays_o = jnp.asarray(rng.standard_normal((B, 3)), jnp.float32) * 0.1
    rays_d = jnp.asarray(rng.standard_normal((B, 3)), jnp.float32)
    batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)
    return variables, consts, rcfg, batch, rays_o, rays_d


def _render(variables, consts, batch, rcfg):
    return jax.jit(
        lambda k, b: render_rays(k, variables, consts, b, rcfg)
    )(jax.random.key(0), batch)


def test_coarse_shading_off_matches_fine_buffers(setup):
    variables, consts, rcfg, batch, _, _ = setup
    full = _render(variables, consts, batch, rcfg)
    fast = _render(variables, consts, batch,
                   rcfg.replace(coarse_shading=False))
    # every fine (unsuffixed) buffer identical
    for k, v in full.items():
        if k.endswith("0"):
            continue
        assert k in fast, k
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(v),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    # the coarse shading graph is really gone
    assert "color_map0" in full and "color_map0" not in fast
    assert "depth_map0" in fast


def test_sweep_scan_matches_batched(setup):
    variables, consts, rcfg, batch, _, _ = setup
    for nt in ("normal_map_from_depth_gradient_epsilon",
               "normal_map_from_depth_gradient_direction_epsilon"):
        r = rcfg.replace(normal_type=nt)
        batched = _render(variables, consts, batch, r)
        scanned = _render(variables, consts, batch,
                          r.replace(sweep_scan=True))
        np.testing.assert_allclose(
            np.asarray(scanned["target_normal_map"]),
            np.asarray(batched["target_normal_map"]),
            rtol=1e-5, atol=1e-5, err_msg=nt)
        np.testing.assert_allclose(
            np.asarray(scanned["color_map"]), np.asarray(batched["color_map"]),
            rtol=1e-5, atol=1e-5, err_msg=nt)


def test_frame_render_matches_chunked(setup):
    variables, consts, rcfg, batch, rays_o, rays_d = setup
    rcfg_fast = rcfg.replace(coarse_shading=False)
    keys = ("color_map", "radiance_map", "albedo_map", "depth_map")
    fn = make_frame_render_fn(variables, consts, rcfg_fast,
                              output_keys=keys)
    chunk = 8  # B=24 -> 3 tiles
    out = render_frame(fn, jax.random.key(0), rays_o, rays_d, 2.0, 6.0,
                       chunk)
    ref = _render(variables, consts, batch, rcfg_fast)
    assert set(out) == set(keys)
    for k in keys:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    assert out["color_map"].shape == (B, 3)


def test_frame_render_pads_non_multiple(setup):
    variables, consts, rcfg, _, rays_o, rays_d = setup
    rcfg_fast = rcfg.replace(coarse_shading=False)
    fn = make_frame_render_fn(variables, consts, rcfg_fast,
                              output_keys=("color_map",))
    n = B - 3  # 21 rays, chunk 8 -> pad 3
    out = render_frame(fn, jax.random.key(0), rays_o[:n], rays_d[:n],
                       2.0, 6.0, 8)
    batch_n = make_ray_batch(rays_o[:n], rays_d[:n], 2.0, 6.0)
    ref = _render(variables, consts, batch_n, rcfg_fast)
    np.testing.assert_allclose(np.asarray(out["color_map"]),
                               np.asarray(ref["color_map"]),
                               rtol=1e-5, atol=1e-6)
    assert out["color_map"].shape == (n, 3)
