"""Pallas fused-field kernel parity vs the jnp reference apply
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    apply_field,
    apply_field_density,
)
from ibl_nerf_tpu.ops.embedding import positional_encoding
from ibl_nerf_tpu.kernels.fused_field import (
    pack_field_weights,
    fused_field_apply,
    fused_field_density,
)

CFG = FieldConfig(depth=8, width=256, coarse_radiance_number=3)


@pytest.fixture(scope="module")
def setup():
    params = init_field_params(jax.random.key(0), CFG)
    packed = pack_field_weights(params, CFG)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (4, 16, 3)).astype(np.float32)
    dirs = rng.standard_normal((4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, packed, jnp.asarray(pts), jnp.asarray(dirs)


class TestFusedField:
    def test_full_apply_parity(self, setup):
        params, packed, pts, dirs = setup
        out = fused_field_apply(packed, pts, dirs, CFG, interpret=True)
        assert out.shape == (4, 16, 18)

        pe = positional_encoding(pts, CFG.multires)
        de = positional_encoding(dirs, CFG.multires_views)
        de = jnp.broadcast_to(de[:, None, :], (*pts.shape[:-1], de.shape[-1]))
        ref = apply_field(params, pe, de, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_density_parity(self, setup):
        params, packed, pts, _ = setup
        out = fused_field_density(packed, pts, CFG, interpret=True)
        pe = positional_encoding(pts, CFG.multires)
        ref = apply_field_density(params, pe, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_renderer_with_pallas_path(self, setup):
        """Full renderer with use_pallas routes the no-grad sweeps
        (ε-normals + reflected march) through the kernel — outputs match
        the pure-XLA renderer."""
        from ibl_nerf_tpu.render import RenderConfig, render_rays, make_ray_batch

        params, _, _, _ = setup
        small = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
        rng = np.random.default_rng(5)
        ro = jnp.asarray(rng.uniform(-1, 1, (6, 3)).astype(np.float32))
        rd = rng.standard_normal((6, 3)).astype(np.float32)
        rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
        batch = make_ray_batch(ro, rd, 2.0, 6.0)
        variables = {"coarse": params, "fine": params}
        consts = {"brdf_lut": jnp.full((8, 8, 3), 0.4, jnp.float32)}

        outs = {}
        for use_pallas in (False, True):
            rcfg = RenderConfig(
                field=small, n_samples=8, n_importance=8, perturb=False,
                approximate_radiance=True,
                normal_type="normal_map_from_depth_gradient_epsilon",
                use_pallas=use_pallas)
            outs[use_pallas] = render_rays(
                jax.random.key(0), variables, consts, batch, rcfg)
        for k in ("color_map", "target_normal_map", "reflected_radiance_map"):
            np.testing.assert_allclose(
                np.asarray(outs[True][k]), np.asarray(outs[False][k]),
                atol=1e-4, rtol=1e-3, err_msg=k)

    def test_nondivisible_point_count(self, setup):
        """Point counts not divisible by TILE are zero-padded."""
        params, packed, _, dirs = setup
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-1, 1, (7, 19, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
        out = fused_field_apply(packed, pts, d, CFG, interpret=True)
        assert out.shape == (7, 19, 18)
        pe = positional_encoding(pts, CFG.multires)
        de = positional_encoding(d, CFG.multires_views)
        de = jnp.broadcast_to(de[:, None, :], (*pts.shape[:-1], de.shape[-1]))
        ref = apply_field(params, pe, de, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
