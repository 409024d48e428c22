"""Material-editing / object-insertion parity vs the PyTorch reference:
mask-decoded intrinsic overrides re-shaded by the split-sum pipeline
(BASELINE config #4 capability)."""

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
from ibl_nerf_tpu.render import RenderConfig, EditConfig, render_rays, make_ray_batch
from ibl_nerf_tpu.utils.port import field_params_from_torch_state

D, W, KC = 8, 32, 3
B, NS, NI = 10, 16, 8


def np_sd(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def setup():
    from nerf_models.ibl_nerf import IBLNeRF, run_network
    from nerf_models.positional_embedder import get_embedder

    torch.manual_seed(23)
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

    rng = np.random.default_rng(31)
    rays_o = rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    rays_d = rng.standard_normal((B, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    lut = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)

    # object-1 mask on rays 2..5 (gray 10/255), object-2 on 6..7 (20/255)
    mask = np.zeros((B, 3), np.float32)
    mask[2:6] = 10.0 / 255.0
    mask[6:8] = 20.0 / 255.0
    gt = {
        "edit_intrinsic_mask": mask,
        "object_insert_mask": mask,
        "edit_normal": rng.uniform(0, 1, (B, 3)).astype(np.float32),
        "edit_albedo": rng.uniform(0, 1, (B, 3)).astype(np.float32),
        "edit_roughness": rng.uniform(0, 1, (B, 1)).astype(np.float32),
        "edit_depth": rng.uniform(2.5, 5.0, (B, 1)).astype(np.float32),
        "object_insert_normal": rng.uniform(0, 1, (B, 3)).astype(np.float32),
        "object_insert_depth": rng.uniform(2.5, 5.0, (B, 1)).astype(np.float32),
    }
    return dict(coarse=coarse, fine=fine, query=query, rays_o=rays_o,
                rays_d=rays_d, lut=lut, near=2.0, far=6.0, gt=gt)


def run_reference(s, **kw):
    from nerf_models.ibl_nerf_renderer import render_rays as ref_render_rays

    ray_batch = np.concatenate(
        [s["rays_o"], s["rays_d"], np.full((B, 1), s["near"], np.float32),
         np.full((B, 1), s["far"], np.float32), s["rays_d"]], -1)
    with torch.no_grad():
        out = ref_render_rays(
            torch.tensor(ray_batch), network_fn=s["coarse"],
            network_query_fn=s["query"], N_samples=NS, N_importance=NI,
            network_fine=s["fine"], perturb=0.0, raw_noise_std=0.0,
            approximate_radiance=True,
            brdf_lut=torch.tensor(s["lut"]).permute(2, 0, 1),
            coarse_radiance_number=KC,
            target_normal_map_for_radiance_calculation=(
                "normal_map_from_depth_gradient_epsilon"),
            epsilon=0.02, lut_coefficient="F", use_radiance_linear=False,
            gamma_correct=False,
            gt_values={k: torch.tensor(v) for k, v in s["gt"].items()},
            **kw)
    return {k: v.numpy() for k, v in out.items()
            if isinstance(v, torch.Tensor)}


def run_ours(s, edit: EditConfig):
    fcfg = FieldConfig(depth=D, width=W, coarse_radiance_number=KC)
    rcfg = RenderConfig(
        field=fcfg, n_samples=NS, n_importance=NI, perturb=False,
        approximate_radiance=True,
        normal_type="normal_map_from_depth_gradient_epsilon",
        epsilon=0.02, edit=edit)
    variables = {
        "coarse": field_params_from_torch_state(np_sd(s["coarse"]), KC, D),
        "fine": field_params_from_torch_state(np_sd(s["fine"]), KC, D),
    }
    consts = {"brdf_lut": jnp.asarray(s["lut"])}
    batch = make_ray_batch(jnp.asarray(s["rays_o"]), jnp.asarray(s["rays_d"]),
                           s["near"], s["far"])
    gt = {k: jnp.asarray(v) for k, v in s["gt"].items()}
    out = render_rays(jax.random.key(0), variables, consts, batch, rcfg,
                      gt_values=gt)
    return {k: np.asarray(v) for k, v in out.items()}


KEYS = ["color_map", "roughness_map", "albedo_map", "target_normal_map",
        "target_depth_map", "specular_map", "diffuse_map"]


def _cmp(ours, ref, label):
    for k in KEYS:
        r, o = ref[k], ours[k]
        if r.shape != o.shape:
            r = r.reshape(o.shape)
        np.testing.assert_allclose(o, r, atol=3e-3, rtol=1e-2,
                                   err_msg=f"{label}:{k}")


class TestEditParity:
    def test_edit_constants(self, setup):
        """Constant per-object roughness + albedo overrides (the shipped
        edit_intrinsic.txt pattern) + normal/depth override by image."""
        ref = run_reference(
            setup, edit_intrinsic=True, num_edit_objects=2,
            edit_roughness=True, editing_target_roughness_list=[0.9, 0.1],
            edit_albedo=True,
            editing_target_albedo_list=[1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
            edit_normal=True, edit_depth=True)
        ours = run_ours(setup, EditConfig(
            mode="edit", num_objects=2,
            edit_roughness=True, target_roughness=(0.9, 0.1),
            edit_albedo=True,
            target_albedo=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0),
            edit_normal=True, edit_depth=True))
        _cmp(ours, ref, "edit-const")
        # overrides actually land on masked rays
        np.testing.assert_allclose(ours["roughness_map"][2:6], 0.9, atol=1e-6)
        np.testing.assert_allclose(ours["roughness_map"][6:8], 0.1, atol=1e-6)

    def test_edit_by_image(self, setup):
        # the reference asserts non-empty target lists even in by-img
        # mode (ibl_nerf_renderer.py:384,392) — unused dummies
        ref = run_reference(
            setup, edit_intrinsic=True, num_edit_objects=1,
            edit_albedo=True, edit_albedo_by_img=True,
            editing_target_albedo_list=[0.0, 0.0, 0.0],
            edit_roughness=True, edit_roughness_by_img=True,
            editing_target_roughness_list=[0.0])
        ours = run_ours(setup, EditConfig(
            mode="edit", num_objects=1,
            edit_albedo=True, edit_albedo_by_img=True,
            edit_roughness=True, edit_roughness_by_img=True))
        # roughness_map excluded: the reference broadcasts the FIRST
        # masked pixel's roughness to every masked pixel
        # (`gt[mask_all][0]`, ibl_nerf_renderer.py:395) — we apply the
        # per-pixel image (documented deviation, PARITY.md)
        for k in [x for x in KEYS if x not in
                  ("roughness_map", "color_map", "specular_map")]:
            r, o = ref[k], ours[k]
            if r.shape != o.shape:
                r = r.reshape(o.shape)
            np.testing.assert_allclose(o, r, atol=3e-3, rtol=1e-2,
                                       err_msg=f"edit-img:{k}")
        # ours: masked rays take the per-pixel edit_roughness image
        mask = setup["gt"]["edit_intrinsic_mask"][:, 0] > 0
        np.testing.assert_allclose(
            ours["roughness_map"][mask],
            setup["gt"]["edit_roughness"][mask, 0], atol=1e-6)

    def test_object_insert(self, setup):
        ref = run_reference(
            setup, insert_object=True, num_insert_objects=2,
            inserting_target_roughness_list=[0.2, 0.8],
            inserting_target_albedo_list=[0.7, 0.1, 0.1, 0.1, 0.1, 0.7],
            inserting_target_irradiance_list=[0.5, -1.0])
        ours = run_ours(setup, EditConfig(
            mode="insert", num_objects=2,
            target_roughness=(0.2, 0.8),
            target_albedo=(0.7, 0.1, 0.1, 0.1, 0.1, 0.7),
            target_irradiance=(0.5, -1.0)))
        _cmp(ours, ref, "insert")
