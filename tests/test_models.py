"""Model parity tests: our field vs the actual PyTorch reference model,
weights ported bit-for-bit."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

sys.path.insert(0, "/root/reference/src")

from ibl_nerf_tpu.models import (
    FieldConfig,
    init_field_params,
    apply_field,
    apply_field_density,
    apply_position_mlp,
    apply_position_direction_mlp,
    init_position_mlp,
    init_position_direction_mlp,
)
from ibl_nerf_tpu.ops import positional_encoding
from ibl_nerf_tpu.utils.port import (
    field_params_from_torch_state,
    position_mlp_params_from_torch_state,
    position_direction_mlp_params_from_torch_state,
)


def np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def torch_field():
    from nerf_models.ibl_nerf import IBLNeRF

    torch.manual_seed(0)
    return IBLNeRF(
        D=8, W=256, input_ch=63, input_ch_views=27, skips=[4],
        coarse_radiance_number=3, is_color_independent_to_direction=False,
    )


CFG = FieldConfig(coarse_radiance_number=3)


class TestFieldParity:
    def test_forward_parity(self, torch_field, rng):
        params = field_params_from_torch_state(np_sd(torch_field), 3)
        n = 40
        pts = rng.standard_normal((n, 3)).astype(np.float32)
        dirs = rng.standard_normal((n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        pts_emb = positional_encoding(jnp.asarray(pts), 10)
        dirs_emb = positional_encoding(jnp.asarray(dirs), 4)
        out = apply_field(params, pts_emb, dirs_emb, CFG)
        assert out.shape == (n, 18)

        with torch.no_grad():
            x = torch.cat(
                [torch.tensor(np.asarray(pts_emb)), torch.tensor(np.asarray(dirs_emb))],
                dim=-1)
            ref = torch_field.forward_not_freezed(x)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)

    def test_density_only_parity(self, torch_field, rng):
        params = field_params_from_torch_state(np_sd(torch_field), 3)
        pts = rng.standard_normal((25, 3)).astype(np.float32)
        pts_emb = positional_encoding(jnp.asarray(pts), 10)
        out = apply_field_density(params, pts_emb, CFG)
        with torch.no_grad():
            ref = torch_field.forward_not_freezed(torch.tensor(np.asarray(pts_emb)))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)

    def test_freeze_semantics(self, rng):
        """freeze_radiance: grads flow only to albedo/irradiance head params
        (+roughness unless freeze_roughness); trunk/sigma/radiance frozen."""
        key = jax.random.key(0)
        params = init_field_params(key, CFG)
        pts_emb = positional_encoding(
            jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32)), 10)
        dirs_emb = positional_encoding(
            jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32)), 4)

        def loss(p, fr, fo):
            out = apply_field(p, pts_emb, dirs_emb, CFG,
                              freeze_radiance=fr, freeze_roughness=fo)
            return jnp.sum(out**2)

        g = jax.grad(loss)(params, True, True)

        def norm(x):
            return float(sum(jnp.sum(jnp.abs(v)) for leaf in jax.tree.leaves(x)
                             for v in [leaf]))

        assert norm(g["trunk"]) == 0.0
        assert norm(g["sigma"]) == 0.0
        assert norm(g["radiance"]) == 0.0
        assert norm(g["coarse"]) == 0.0
        assert norm(g["feature"]) == 0.0
        assert norm(g["roughness"]) == 0.0  # freeze_roughness
        assert norm(g["albedo"]) > 0.0
        assert norm(g["albedo_feat"]) > 0.0
        assert norm(g["irradiance"]) > 0.0

        g2 = jax.grad(loss)(params, True, False)
        assert norm(g2["roughness"]) > 0.0

        g3 = jax.grad(loss)(params, False, False)
        assert norm(g3["trunk"]) > 0.0 and norm(g3["radiance"]) > 0.0

    def test_freezed_forward_value_parity(self, torch_field, rng):
        """Values (not grads) identical between frozen and unfrozen paths."""
        params = field_params_from_torch_state(np_sd(torch_field), 3)
        pts_emb = positional_encoding(
            jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32)), 10)
        dirs_emb = positional_encoding(
            jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32)), 4)
        a = apply_field(params, pts_emb, dirs_emb, CFG)
        b = apply_field(params, pts_emb, dirs_emb, CFG,
                        freeze_radiance=True, freeze_roughness=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestAuxMLPParity:
    def test_position_mlp(self, rng):
        from networks.MLP import PositionMLP

        torch.manual_seed(1)
        ref = PositionMLP(D=8, W=256, input_ch=63, out_ch=3, skips=[4])
        params = position_mlp_params_from_torch_state(np_sd(ref))
        x = rng.standard_normal((10, 63)).astype(np.float32)
        out = apply_position_mlp(params, jnp.asarray(x))
        with torch.no_grad():
            expect = ref(torch.tensor(x))
        np.testing.assert_allclose(np.asarray(out), expect.numpy(), atol=2e-5)

    def test_position_direction_mlp(self, rng):
        from networks.MLP import PositionDirectionMLP

        torch.manual_seed(2)
        ref = PositionDirectionMLP(D=8, W=256, input_ch=63, input_ch_views=27,
                                   out_ch=1, skips=[4])
        params = position_direction_mlp_params_from_torch_state(np_sd(ref))
        x = rng.standard_normal((10, 63)).astype(np.float32)
        d = rng.standard_normal((10, 27)).astype(np.float32)
        out = apply_position_direction_mlp(params, jnp.asarray(x), jnp.asarray(d))
        with torch.no_grad():
            expect = ref(torch.cat([torch.tensor(x), torch.tensor(d)], -1))
        np.testing.assert_allclose(np.asarray(out), expect.numpy(), atol=2e-5)

    def test_init_shapes(self):
        p = init_position_mlp(jax.random.key(0))
        assert p["trunk"][0]["w"].shape == (63, 256)
        assert p["trunk"][5]["w"].shape == (256 + 63, 256)
        p2 = init_position_direction_mlp(jax.random.key(1))
        assert p2["views"][0]["w"].shape == (27 + 256, 128)
        assert len(p2["views"]) == 4


class TestDistinctFineArchitecture:
    """--use_fine_arch_flags: a genuinely distinct fine network (the
    reference parses netdepth_fine/netwidth_fine but never reads them)."""

    def test_render_and_grads(self):
        from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
        from ibl_nerf_tpu.models.field import init_field_params
        from ibl_nerf_tpu.render import (
            RenderConfig, make_ray_batch, render_rays)
        import dataclasses

        fcfg = FieldConfig(depth=2, width=32, coarse_radiance_number=2)
        fcfg_fine = dataclasses.replace(fcfg, depth=3, width=48)
        rcfg = RenderConfig(
            field=fcfg, field_fine=fcfg_fine, n_samples=8, n_importance=8,
            perturb=False, approximate_radiance=True,
            normal_type="normal_map_from_depth_gradient_epsilon")

        variables = {
            "coarse": init_field_params(jax.random.key(0), fcfg),
            "fine": init_field_params(jax.random.key(1), fcfg_fine),
        }
        # random init can leave raw sigma <= 0 everywhere (dead density
        # -> zero weights -> zero grads); bias it live for the grad check
        for v in variables.values():
            v["sigma"]["b"] = v["sigma"]["b"] + 0.5
        assert variables["fine"]["trunk"][0]["w"].shape[1] == 48
        assert len(variables["fine"]["trunk"]) == 3

        consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
        rng = np.random.default_rng(3)
        rays_o = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
        rays_d = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
        batch = make_ray_batch(rays_o, rays_d, 2.0, 6.0)

        def loss(variables):
            out = render_rays(jax.random.key(0), variables, consts, batch,
                              rcfg)
            return jnp.mean(out["color_map"] ** 2) + jnp.mean(
                out["radiance_map0"] ** 2)

        val, grads = jax.value_and_grad(loss)(variables)
        assert np.isfinite(float(val))
        for name in ("coarse", "fine"):
            g = grads[name]["trunk"][0]["w"]
            assert g.shape == variables[name]["trunk"][0]["w"].shape
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0.0
