"""compute_dtype modes: bfloat16 / mixed / bf16_grad vs float32.

Each mode must render all maps close to the f32 reference (bf16
matmul tolerance) and keep the gradient path alive and finite.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.render import RenderConfig, make_ray_batch, render_rays


@pytest.fixture(scope="module")
def setup():
    fcfg = FieldConfig(depth=2, width=32, coarse_radiance_number=2)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, perturb=False,
        approximate_radiance=True,
        normal_type="normal_map_from_depth_gradient_epsilon")
    variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                 "fine": init_field_params(jax.random.key(2), fcfg)}
    for v in variables.values():
        v["sigma"]["b"] = v["sigma"]["b"] + 0.5
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    rng = np.random.default_rng(1)
    rays_o = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    rays_d = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)
    return rcfg, variables, consts, batch


@pytest.mark.parametrize("dtype", ["bfloat16", "mixed", "bf16_grad", "amp"])
def test_dtype_mode_close_to_f32_and_grads_flow(setup, dtype):
    rcfg, variables, consts, batch = setup
    out32 = render_rays(jax.random.key(0), variables, consts, batch, rcfg)
    out = render_rays(jax.random.key(0), variables, consts, batch,
                      rcfg.replace(compute_dtype=dtype))
    assert set(out) == set(out32)
    for k in ("color_map", "radiance_map", "albedo_map", "depth_map"):
        a, b = np.asarray(out32[k]), np.asarray(out[k])
        assert np.isfinite(b).all(), k
        # bf16 matmuls: ~3 decimal digits; depth scales with far plane
        np.testing.assert_allclose(b, a, atol=0.1, err_msg=f"{dtype}:{k}")

    def loss(variables):
        o = render_rays(jax.random.key(0), variables, consts, batch,
                        rcfg.replace(compute_dtype=dtype))
        return jnp.mean(o["color_map"] ** 2) + jnp.mean(o["radiance_map"] ** 2)

    grads = jax.grad(loss)(variables)
    g = grads["fine"]["trunk"][0]["w"]
    assert g.dtype == jnp.float32  # master params stay f32
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_mixed_modes_detach_the_right_path(setup):
    """mixed keeps the gradient path f32 (grads == f32 grads exactly);
    bf16_grad keeps the no-grad sweeps f32 (target normals == f32's)."""
    rcfg, variables, consts, batch = setup

    def grad_of(dtype):
        def loss(variables):
            o = render_rays(jax.random.key(0), variables, consts, batch,
                            rcfg.replace(compute_dtype=dtype))
            return jnp.mean(o["radiance_map"] ** 2)
        return jax.grad(loss)(variables)["fine"]["trunk"][0]["w"]

    # radiance_map only touches the gradient path -> identical grads
    np.testing.assert_array_equal(np.asarray(grad_of("mixed")),
                                  np.asarray(grad_of("float32")))

    # ε-normal estimation runs the no-grad query: f32 in bf16_grad mode.
    # The finite difference divides by ε, so compare at a large ε where
    # the bf16 primary-march depth noise doesn't dominate the quotient.
    rcfg_eps = rcfg.replace(epsilon=0.5)
    out32 = render_rays(jax.random.key(0), variables, consts, batch,
                        rcfg_eps)
    outg = render_rays(jax.random.key(0), variables, consts, batch,
                       rcfg_eps.replace(compute_dtype="bf16_grad"))
    cos = np.sum(np.asarray(outg["target_normal_map"])
                 * np.asarray(out32["target_normal_map"]), axis=-1)
    assert (cos > 0.99).all(), cos


def test_amp_keeps_everything_f32_but_rounds_operands(setup):
    """amp: all live tensors f32 (raw outputs, grads); only the matmul
    OPERANDS are bf16 — so grads must be closer to f32's than the
    full-bf16 mode's grads are (dW accumulates and lands in f32), and
    every intermediate dtype stays f32."""
    rcfg, variables, consts, batch = setup

    def grad_of(dtype):
        def loss(variables):
            # radiance_map: the pure MLP gradient path, no ε-normal
            # finite-difference quotient (which chaotically amplifies
            # ANY sub-f32 rounding of the primary-march depth and makes
            # a value comparison meaningless for every bf16-ish mode).
            o = render_rays(jax.random.key(0), variables, consts, batch,
                            rcfg.replace(compute_dtype=dtype))
            return jnp.mean(o["radiance_map"] ** 2)
        return jax.grad(loss)(variables)["fine"]["trunk"][0]["w"]

    g32 = np.asarray(grad_of("float32"))
    gamp = np.asarray(grad_of("amp"))
    gbf = np.asarray(grad_of("bfloat16"))
    assert gamp.dtype == np.float32
    err_amp = np.linalg.norm(gamp - g32) / np.linalg.norm(g32)
    err_bf = np.linalg.norm(gbf - g32) / np.linalg.norm(g32)
    # fine z positions come from amp-rounded coarse weights via
    # sample_pdf, so some value drift is inherent; 0.1 bounds it.
    assert err_amp < 0.1, err_amp
    assert err_amp <= err_bf * 1.5, (err_amp, err_bf)

    out = render_rays(jax.random.key(0), variables, consts, batch,
                      rcfg.replace(compute_dtype="amp"))
    for k in ("color_map", "radiance_map", "depth_map"):
        assert out[k].dtype == jnp.float32, k
