"""Gradient parity vs the PyTorch reference: backward through the FULL
renderer (radiance losses, and the shaded color loss with its surgical
detach placement) must produce the same parameter gradients.

This is the BASELINE.md 'grad allclose pass rate' gate: it validates
every stop_gradient site (detached intrinsic compositing weights,
detached surface points, no-grad reflected march, no-grad ε-normals)
against torch autograd ground truth.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tv.transforms

sys.path.insert(0, "/root/reference/src")

from ibl_nerf_tpu.models.field import FieldConfig
from ibl_nerf_tpu.render import RenderConfig, render_rays, make_ray_batch
from ibl_nerf_tpu.utils.port import field_params_from_torch_state

# KC must be 3: the reference's raw2outputs_simple hardcodes its default
# coarse_radiance_number=3 on the reflected march (ibl_nerf_renderer.py:38,
# 446) regardless of the model's K — live configs always use 3.
D, W, KC = 8, 32, 3
B, NS, NI = 6, 16, 8


def np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def setup():
    from nerf_models.ibl_nerf import IBLNeRF, run_network
    from nerf_models.positional_embedder import get_embedder

    torch.manual_seed(11)
    coarse = IBLNeRF(D=D, W=W, input_ch=63, input_ch_views=27, skips=[4],
                     coarse_radiance_number=KC,
                     is_color_independent_to_direction=False)
    fine = IBLNeRF(D=D, W=W, input_ch=63, input_ch_views=27, skips=[4],
                   coarse_radiance_number=KC,
                   is_color_independent_to_direction=False)

    embed_fn, _ = get_embedder(10, 0)
    embeddirs_fn, _ = get_embedder(4, 0)

    def query(inputs, viewdirs, network_fn):
        return run_network(inputs, viewdirs, network_fn, embed_fn=embed_fn,
                           embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    rng = np.random.default_rng(13)
    rays_o = rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    rays_d = rng.standard_normal((B, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(0, 1, (B, 3)).astype(np.float32)
    lut = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    return dict(coarse=coarse, fine=fine, query=query, rays_o=rays_o,
                rays_d=rays_d, target=target, lut=lut, near=2.0, far=6.0)


def torch_grads(s, approximate_radiance):
    from nerf_models.ibl_nerf_renderer import render_rays as ref_render_rays

    s["coarse"].zero_grad(set_to_none=True)
    s["fine"].zero_grad(set_to_none=True)

    ray_batch = np.concatenate(
        [s["rays_o"], s["rays_d"], np.full((B, 1), s["near"], np.float32),
         np.full((B, 1), s["far"], np.float32), s["rays_d"]], -1)
    lut_t = torch.tensor(s["lut"]).permute(2, 0, 1)

    out = ref_render_rays(
        torch.tensor(ray_batch), network_fn=s["coarse"],
        network_query_fn=s["query"], N_samples=NS, N_importance=NI,
        network_fine=s["fine"], perturb=0.0, raw_noise_std=0.0,
        approximate_radiance=approximate_radiance, brdf_lut=lut_t,
        coarse_radiance_number=KC,
        target_normal_map_for_radiance_calculation=(
            "normal_map_from_depth_gradient_epsilon"),
        epsilon=0.02, lut_coefficient="F", use_radiance_linear=False,
        gamma_correct=False)

    tgt = torch.tensor(s["target"])
    loss = (torch.mean((out["radiance_map"] - tgt) ** 2)
            + torch.mean((out["radiance_map0"] - tgt) ** 2))
    if approximate_radiance:
        loss = loss + (torch.mean((out["color_map"] - tgt) ** 2)
                       + torch.mean((out["color_map0"] - tgt) ** 2))
    loss.backward()

    def grad_sd(model):
        return {k: (p.grad if p.grad is not None
                    else torch.zeros_like(p)).numpy()
                for k, p in model.named_parameters()}

    return (field_params_from_torch_state(grad_sd(s["coarse"]), KC, D),
            field_params_from_torch_state(grad_sd(s["fine"]), KC, D),
            float(loss))


def ours_grads(s, approximate_radiance):
    fcfg = FieldConfig(depth=D, width=W, coarse_radiance_number=KC)
    rcfg = RenderConfig(field=fcfg, n_samples=NS, n_importance=NI,
                        perturb=False,
                        approximate_radiance=approximate_radiance,
                        normal_type="normal_map_from_depth_gradient_epsilon",
                        epsilon=0.02)
    variables = {
        "coarse": field_params_from_torch_state(np_sd(s["coarse"]), KC, D),
        "fine": field_params_from_torch_state(np_sd(s["fine"]), KC, D),
    }
    consts = {"brdf_lut": jnp.asarray(s["lut"])}
    batch = make_ray_batch(jnp.asarray(s["rays_o"]), jnp.asarray(s["rays_d"]),
                           s["near"], s["far"])
    tgt = jnp.asarray(s["target"])

    def loss_fn(v):
        out = render_rays(jax.random.key(0), v, consts, batch, rcfg)
        loss = (jnp.mean((out["radiance_map"] - tgt) ** 2)
                + jnp.mean((out["radiance_map0"] - tgt) ** 2))
        if approximate_radiance:
            loss = loss + (jnp.mean((out["color_map"] - tgt) ** 2)
                           + jnp.mean((out["color_map0"] - tgt) ** 2))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    return grads["coarse"], grads["fine"], float(loss)


def _compare_trees(ours, ref, atol, rtol, prefix=""):
    flat_o, _ = jax.tree_util.tree_flatten_with_path(ours)
    flat_r = jax.tree.leaves(ref)
    assert len(flat_o) == len(flat_r)
    for (path, o), r in zip(flat_o, flat_r):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=atol, rtol=rtol,
            err_msg=f"{prefix}{jax.tree_util.keystr(path)}")


class TestGradParity:
    def test_radiance_loss_grads(self, setup):
        gc_ref, gf_ref, loss_ref = torch_grads(setup, False)
        gc, gf, loss = ours_grads(setup, False)
        assert abs(loss - loss_ref) < 1e-4
        _compare_trees(gc, gc_ref, atol=2e-5, rtol=5e-3, prefix="coarse")
        _compare_trees(gf, gf_ref, atol=2e-5, rtol=5e-3, prefix="fine")

    def test_shaded_color_loss_grads(self, setup):
        """Exercises detached-weight intrinsics, no-grad ε-normals,
        no-grad reflected march, LUT + fresnel + mip backward."""
        gc_ref, gf_ref, loss_ref = torch_grads(setup, True)
        gc, gf, loss = ours_grads(setup, True)
        assert abs(loss - loss_ref) < 1e-4
        _compare_trees(gc, gc_ref, atol=5e-5, rtol=1e-2, prefix="coarse")
        _compare_trees(gf, gf_ref, atol=5e-5, rtol=1e-2, prefix="fine")
