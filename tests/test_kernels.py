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


class TestFusedFieldTrain:
    """Custom-vjp fused fwd+bwd kernel (kernels/fused_field_train.py)."""

    @pytest.fixture(scope="class")
    def tsetup(self):
        import jax.flatten_util
        from ibl_nerf_tpu.kernels.fused_field_train import (
            fused_field_apply_train)

        params = init_field_params(jax.random.key(0), CFG)
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.uniform(-1, 1, (8, 16, 3)).astype(np.float32))
        dirs = rng.standard_normal((8, 3)).astype(np.float32)
        dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1,
                                                 keepdims=True))
        tgt = jnp.asarray(rng.standard_normal((8, 16, 18)).astype(np.float32))

        def kern_loss(p):
            packed32 = pack_field_weights(p, CFG, dtype=jnp.float32)
            raw = fused_field_apply_train(packed32, pts, dirs, CFG,
                                          interpret=True)
            return jnp.mean((raw - tgt) ** 2)

        def xla_loss(p, dt):
            pe = positional_encoding(pts, CFG.multires).astype(dt)
            de = positional_encoding(dirs, CFG.multires_views).astype(dt)
            de = jnp.broadcast_to(de[:, None, :],
                                  (*pts.shape[:-1], de.shape[-1]))
            pc = jax.tree.map(lambda x: x.astype(dt), p)
            raw = apply_field(pc, pe, de, CFG).astype(jnp.float32)
            return jnp.mean((raw - tgt) ** 2)

        return params, kern_loss, xla_loss

    def test_forward_parity_bf16(self, tsetup):
        from ibl_nerf_tpu.kernels.fused_field_train import (
            fused_field_apply_train)

        params, _, _ = tsetup
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-1, 1, (4, 16, 3)).astype(np.float32))
        dirs = rng.standard_normal((4, 3)).astype(np.float32)
        dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1,
                                                 keepdims=True))
        packed32 = pack_field_weights(params, CFG, dtype=jnp.float32)
        out = fused_field_apply_train(packed32, pts, dirs, CFG,
                                      interpret=True)
        pe = positional_encoding(pts, CFG.multires).astype(jnp.bfloat16)
        de = positional_encoding(dirs, CFG.multires_views).astype(jnp.bfloat16)
        de = jnp.broadcast_to(de[:, None, :], (*pts.shape[:-1], de.shape[-1]))
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        ref = apply_field(p16, pe, de, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref,
                                                               np.float32),
                                   atol=2e-3)

    def test_grads_at_least_as_accurate_as_xla_bf16(self, tsetup):
        """Kernel dW (f32-accumulated in VMEM) must be no farther from
        the f32 ground truth than XLA's bf16 backward is (x1.3 slack)."""
        import jax.flatten_util

        params, kern_loss, xla_loss = tsetup
        gk = jax.grad(kern_loss)(params)
        gx = jax.grad(lambda p: xla_loss(p, jnp.bfloat16))(params)
        g32 = jax.grad(lambda p: xla_loss(p, jnp.float32))(params)
        fk = np.asarray(jax.flatten_util.ravel_pytree(gk)[0], np.float32)
        fx = np.asarray(jax.flatten_util.ravel_pytree(gx)[0], np.float32)
        f32 = np.asarray(jax.flatten_util.ravel_pytree(g32)[0], np.float32)
        n32 = np.linalg.norm(f32)
        err_k = np.linalg.norm(fk - f32) / n32
        err_x = np.linalg.norm(fx - f32) / n32
        assert np.isfinite(fk).all()
        assert err_k < 0.1, err_k
        assert err_k <= err_x * 1.3, (err_k, err_x)

    def test_renderer_integration_grads(self, tsetup):
        """render_rays with use_pallas_train: param grads finite and
        close to the plain bf16_grad path's."""
        import jax.flatten_util
        from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
        from ibl_nerf_tpu.render import (RenderConfig, make_ray_batch,
                                         render_rays)

        fcfg = CFG
        rcfg = RenderConfig(
            field=fcfg, n_samples=6, n_importance=6, perturb=False,
            approximate_radiance=True, compute_dtype="bf16_grad",
            normal_type="normal_map_from_depth_gradient_epsilon")
        variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                     "fine": init_field_params(jax.random.key(2), fcfg)}
        for v in variables.values():
            v["sigma"]["b"] = v["sigma"]["b"] + 0.5
        consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
        rng = np.random.default_rng(1)
        rays_o = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
        rays_d = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
        batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)

        def loss(variables, use_kernel):
            o = render_rays(jax.random.key(0), variables, consts, batch,
                            rcfg.replace(use_pallas_train=use_kernel))
            return (jnp.mean(o["color_map"] ** 2)
                    + jnp.mean(o["radiance_map"] ** 2))

        gk = jax.grad(lambda v: loss(v, True))(variables)
        gx = jax.grad(lambda v: loss(v, False))(variables)
        fk = np.asarray(jax.flatten_util.ravel_pytree(gk)[0], np.float32)
        fx = np.asarray(jax.flatten_util.ravel_pytree(gx)[0], np.float32)
        assert np.isfinite(fk).all()
        assert np.abs(fk).max() > 0
        rel = np.linalg.norm(fk - fx) / (np.linalg.norm(fx) + 1e-30)
        assert rel < 0.15, rel
