"""Sigma-gradient normal estimators (C9b) — analytic correctness and
full-renderer integration.

The reference *selects* these variants (ibl_nerf_renderer.py:349,352)
but their import is commented out (:15), so choosing them is a NameError
there; here they are working implementations, and
`normal_map_from_sigma_gradient_surface` doubles as the opt-in FAST
normal mode: one density gradient at B surface points instead of the 4
full ε-offset ray sweeps of the live estimator.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.render import RenderConfig, make_ray_batch, render_rays
from ibl_nerf_tpu.render.normals import (
    normal_from_sigma_gradient, normal_from_sigma_gradient_surface)


class TestAnalyticGradient:
    def test_surface_matches_analytic_plane_normal(self):
        """σ(p) = k·(p·a): -∇σ ∝ -a everywhere, so the estimator must
        return -a/|a| at every surface point."""
        a = np.array([1.0, -2.0, 0.5], np.float32)

        def query(p):  # (..., S, 3) -> (..., S, 1)
            return (p @ jnp.asarray(a))[..., None]

        x = jnp.asarray(np.random.default_rng(0).standard_normal((7, 3)),
                        jnp.float32)
        n = np.asarray(normal_from_sigma_gradient_surface(query, x))
        expect = -a / np.linalg.norm(a)
        np.testing.assert_allclose(n, np.broadcast_to(expect, (7, 3)),
                                   rtol=1e-5)

    def test_sphere_normals_point_outward(self):
        """σ(p) = R² - |p|² (denser inside): -∇σ = 2p, the outward
        radial — both composited and surface variants must agree."""
        def query(p):
            return (4.0 - jnp.sum(p * p, -1))[..., None]

        rng = np.random.default_rng(3)
        x = rng.standard_normal((5, 3)).astype(np.float32)
        x = 2.0 * x / np.linalg.norm(x, axis=-1, keepdims=True)
        n_surf = np.asarray(normal_from_sigma_gradient_surface(
            query, jnp.asarray(x)))
        expect = x / np.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(n_surf, expect, atol=1e-5)

        # composited variant: all samples on the same radial line
        pts = jnp.asarray(x)[:, None, :] * jnp.linspace(
            0.9, 1.1, 4)[None, :, None]
        w = jnp.full((5, 4), 0.25)
        n_comp = np.asarray(normal_from_sigma_gradient(query, pts, w))
        np.testing.assert_allclose(n_comp, expect, atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    fcfg = FieldConfig(depth=2, width=32, coarse_radiance_number=2)
    variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                 "fine": init_field_params(jax.random.key(2), fcfg)}
    for v in variables.values():
        v["sigma"]["b"] = v["sigma"]["b"] + 0.5
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    rng = np.random.default_rng(1)
    rays_o = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    rays_d = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)
    return fcfg, variables, consts, batch


@pytest.mark.parametrize("nt", ["normal_map_from_sigma_gradient",
                                "normal_map_from_sigma_gradient_surface"])
class TestRendererIntegration:
    def _rcfg(self, fcfg, nt):
        return RenderConfig(
            field=fcfg, n_samples=8, n_importance=8, perturb=False,
            approximate_radiance=True, normal_type=nt)

    def test_render_finite_and_unit_normals(self, setup, nt):
        fcfg, variables, consts, batch = setup
        out = render_rays(jax.random.key(0), variables, consts, batch,
                          self._rcfg(fcfg, nt))
        for k in ("color_map", "radiance_map", "specular_map",
                  "diffuse_map", "target_normal_map"):
            assert np.isfinite(np.asarray(out[k])).all(), k
        norms = np.linalg.norm(np.asarray(out["target_normal_map"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_grads_flow_and_are_finite(self, setup, nt):
        """The estimator output is detached (reference detaches every
        live variant), but the shaded loss must still backprop through
        albedo/roughness/irradiance and radiance heads."""
        fcfg, variables, consts, batch = setup
        rcfg = self._rcfg(fcfg, nt)

        def loss(variables):
            o = render_rays(jax.random.key(0), variables, consts, batch,
                            rcfg)
            return (jnp.mean(o["color_map"] ** 2)
                    + jnp.mean(o["radiance_map"] ** 2))

        grads = jax.grad(loss)(variables)
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        g = grads["fine"]["albedo"]["w"]
        assert float(jnp.abs(g).max()) > 0.0
