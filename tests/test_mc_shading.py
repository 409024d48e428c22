"""Monte-Carlo GGX shading branch (shading_mode="monte_carlo").

The reference ships the estimator's parts (Microfacet, hemisphere
samplers) but never wires them into raw2outputs; this branch is our
live integration, so the tests are semantic (energy / Lambert limits,
gradient flow) rather than reference-parity.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.render import RenderConfig, make_ray_batch, render_rays
from ibl_nerf_tpu.render.renderer import _monte_carlo_shading
from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut


def _logit(p):
    return float(np.log(p / (1.0 - p)))


class TestMonteCarloShading:
    def test_lambert_limit(self):
        """Constant incident radiance + roughness 1 (metallic 0): the MC
        diffuse estimate approaches (1-F)·albedo·L (∫ albedo/π L cosθ dω
        = albedo·L over the hemisphere)."""
        b, s = 4, 8
        incident = 0.7  # composited incident radiance per channel
        albedo = np.array([0.8, 0.5, 0.2], np.float32)
        rcfg = RenderConfig(field=FieldConfig(coarse_radiance_number=0),
                            mc_samples_axis=16)

        def query_full_ng(pts, dirs):
            n = pts.shape[0]
            raw = jnp.zeros((n, s, 9))
            raw = raw.at[..., 0].set(1e4)          # opaque at first sample
            raw = raw.at[..., 6:9].set(_logit(incident))
            return raw

        rng = np.random.default_rng(0)
        rays_d = jnp.asarray(
            rng.standard_normal((b, 3)).astype(np.float32))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        normal = -rays_d  # facing the camera
        x_surface = jnp.zeros((b, 3))
        z_vals = jnp.broadcast_to(jnp.linspace(0.1, 2.0, s), (b, s))
        albedo_map = jnp.broadcast_to(jnp.asarray(albedo), (b, 3))
        roughness_map = jnp.ones((b,))

        diffuse, specular = _monte_carlo_shading(
            query_full_ng, rays_d, x_surface, z_vals, normal, albedo_map,
            roughness_map, rcfg)
        diffuse = np.asarray(diffuse)
        # F ≈ f0 + small grazing tail; bound the Lambert limit loosely
        expect = albedo * incident * (1.0 - 0.04)
        np.testing.assert_allclose(diffuse, np.broadcast_to(expect, (b, 3)),
                                   rtol=0.12)
        assert np.isfinite(np.asarray(specular)).all()
        assert (np.asarray(specular) >= 0).all()

    def test_energy_scales_with_incident(self):
        """Doubling incident radiance doubles the shading (linearity)."""
        b, s = 3, 4
        rcfg = RenderConfig(field=FieldConfig(coarse_radiance_number=0),
                            mc_samples_axis=4)

        def make_query(level):
            def q(pts, dirs):
                n = pts.shape[0]
                raw = jnp.zeros((n, s, 9))
                raw = raw.at[..., 0].set(1e4)
                raw = raw.at[..., 6:9].set(_logit(level))
                return raw
            return q

        rays_d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (b, 1)), jnp.float32)
        normal = -rays_d
        x_surface = jnp.zeros((b, 3))
        z_vals = jnp.broadcast_to(jnp.linspace(0.1, 2.0, s), (b, s))
        albedo_map = jnp.full((b, 3), 0.5)
        roughness_map = jnp.full((b,), 0.4)

        d1, s1 = _monte_carlo_shading(make_query(0.2), rays_d, x_surface,
                                      z_vals, normal, albedo_map,
                                      roughness_map, rcfg)
        d2, s2 = _monte_carlo_shading(make_query(0.4), rays_d, x_surface,
                                      z_vals, normal, albedo_map,
                                      roughness_map, rcfg)
        np.testing.assert_allclose(np.asarray(d2), 2 * np.asarray(d1),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s2), 2 * np.asarray(s1),
                                   rtol=1e-4)

    def test_end_to_end_render_and_grads(self):
        fcfg = FieldConfig(depth=2, width=32, coarse_radiance_number=2)
        rcfg = RenderConfig(
            field=fcfg, n_samples=8, n_importance=8, perturb=False,
            approximate_radiance=True, shading_mode="monte_carlo",
            mc_samples_axis=2,
            normal_type="normal_map_from_depth_gradient_epsilon")
        variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                     "fine": init_field_params(jax.random.key(2), fcfg)}
        for v in variables.values():
            v["sigma"]["b"] = v["sigma"]["b"] + 0.5
        consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
        rng = np.random.default_rng(1)
        rays_o = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
        rays_d = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
        batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)

        out = render_rays(jax.random.key(0), variables, consts, batch, rcfg)
        assert "color_map" in out and "specular_map" in out
        # MC mode has no single reflected ray / prefiltered mip stack
        assert "reflected_radiance_map" not in out
        assert "prefiltered_reflected_map" not in out
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), k

        def loss(variables):
            o = render_rays(jax.random.key(0), variables, consts, batch,
                            rcfg)
            return jnp.mean(o["color_map"] ** 2)

        grads = jax.grad(loss)(variables)
        for head in ("albedo", "roughness", "trunk"):
            g = grads["fine"][head]
            leaf = g[0]["w"] if isinstance(g, list) else g["w"]
            assert np.isfinite(np.asarray(leaf)).all()
            assert float(jnp.abs(leaf).max()) > 0.0, head

    def test_jit_compiles(self):
        fcfg = FieldConfig(depth=2, width=16, coarse_radiance_number=0)
        rcfg = RenderConfig(
            field=fcfg, n_samples=4, n_importance=0, perturb=False,
            approximate_radiance=True, shading_mode="monte_carlo",
            mc_samples_axis=2,
            normal_type="normal_map_from_depth_gradient_epsilon")
        variables = {"coarse": init_field_params(jax.random.key(0), fcfg)}
        consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (4, 1)), jnp.float32)
        batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)
        f = jax.jit(lambda key, b: render_rays(key, variables, consts, b,
                                               rcfg))
        out = f(jax.random.key(0), batch)
        assert np.isfinite(np.asarray(out["color_map"])).all()
