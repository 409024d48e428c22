"""Full test-path rendering with per-buffer PNG export.

Parity: render_decomp_path (/root/reference/src/nerf_models/
ibl_nerf_renderer.py:819-910): renders every test pose, exports ~25
output buffers with the reference's exact file naming
(`{name}_{idx:03d}.png`), the same display transforms (normals ->
(n+1)/2, depth -> disparity via far*0.1), and the derived screen-space
normal-from-depth buffer — so the reference's downstream comparison
tooling applies unchanged.
"""

from __future__ import annotations

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.ops.color import to8b
from ibl_nerf_tpu.ops.geometry import depth_to_normal_image_space
from ibl_nerf_tpu.render.renderer import render_image

# result key -> export name (order matches reference append_result calls)
_EXPORTS = [
    ("color_map", "rgb"),
    ("radiance_map", "radiance"),
    ("irradiance_map", "irradiance"),
    ("albedo_map", "albedo"),
    ("reflected_radiance_map", "reflected_radiance"),
    ("prefiltered_reflected_map", "prefiltered_reflected"),
    ("roughness_map", "roughness"),
    ("specular_map", "specular"),
    ("diffuse_map", "diffuse"),
    ("n_dot_v_map", "n_dot_v"),
    ("inferred_normal_map", "inferred_normal_map"),
    ("target_normal_map", "target_normal_map"),
    ("inferred_depth_map", "inferred_disp"),
    ("disp_map", "disp"),
    ("depth_map", "depth"),
    ("target_depth_map", "target_depth"),
]


def _resize_gt(buffers: dict[str, np.ndarray], i: int, factor: int):
    """Per-pose gt buffers resized by 1/factor, flattened (H*W, C).

    Parity: NerfDataset.get_resized_normal_albedo (dataset_interface.py:98-160).
    """
    out = {}
    for k, stack in buffers.items():
        img = stack[i]
        if factor != 1:
            h, w = img.shape[:2]
            img = cv2.resize(img, (w // factor, h // factor),
                             interpolation=cv2.INTER_AREA)
            if img.ndim == 2:
                img = img[..., None]
        out[k] = jnp.asarray(img.reshape(-1, img.shape[-1]))
    return out


def render_path(
    variables,
    consts,
    scene,
    rcfg,
    savedir: str | None = None,
    render_factor: int = 1,
    chunk: int = 2048,
    poses=None,
    fast: bool = True,
):
    """Render all poses of `scene`; returns {name: (N, H, W, C?) stack}.

    render_factor > 1 renders downsampled for speed (focal rescaled,
    parity render_decomp_path:826-836).

    fast=True (default) renders each frame as ONE scanned XLA dispatch
    (render.make_frame_render_fn) with the coarse pass weights-only
    (RenderConfig.coarse_shading=False) and only the exported buffers
    computed — every exported (fine) buffer is identical to the slow
    path; only the never-exported coarse '0' maps are skipped.
    """
    H, W, focal = scene.height, scene.width, scene.focal
    if render_factor not in (0, 1):
        H = H // render_factor
        W = W // render_factor
        focal = focal / render_factor
    factor = render_factor if render_factor not in (0, 1) else 1

    K = jnp.asarray(np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32))

    if savedir is not None:
        os.makedirs(savedir, exist_ok=True)

    gt_buffers = scene.gt_buffers()
    render_poses = poses if poses is not None else scene.poses

    # One jitted renderer shared across all poses/chunks.
    from ibl_nerf_tpu.render.renderer import (
        render_rays, make_frame_render_fn, render_frame)
    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    rcfg_test = rcfg.replace(perturb=False, raw_noise_std=0.0)

    frame_fn = None
    if fast:
        kk_ = rcfg.field.coarse_radiance_number
        export_keys = tuple(k for k, _ in _EXPORTS) + ("acc_map",) + tuple(
            f"radiance_map_{k + 1}" for k in range(kk_)) + tuple(
            f"reflected_coarse_radiance_map_{k + 1}" for k in range(kk_))
        frame_fn = make_frame_render_fn(
            variables, consts, rcfg_test.replace(coarse_shading=False),
            output_keys=export_keys)
    else:
        @jax.jit
        def render_fn(key, batch, gt):
            return render_rays(key, variables, consts, batch, rcfg_test,
                               gt_values=gt)

    results: dict[str, list] = {}

    def append(res, key_name, idx, out_name):
        if key_name not in res:
            return
        img = np.asarray(res[key_name])
        if "normal" in out_name or "tangent" in out_name:
            img = (img + 1.0) * 0.5
        elif "depth" in key_name:
            img = img / (scene.far * 0.1)
            img = 1.0 / np.maximum(1e-10, img)
        results.setdefault(out_name, []).append(img)
        if savedir is not None:
            out8 = to8b(img)
            if out8.ndim == 3 and out8.shape[-1] == 3:
                cv2.imwrite(os.path.join(savedir, f"{out_name}_{idx:03d}.png"),
                            cv2.cvtColor(out8, cv2.COLOR_RGB2BGR))
            else:
                cv2.imwrite(os.path.join(savedir, f"{out_name}_{idx:03d}.png"),
                            out8.squeeze())

    kk = rcfg.field.coarse_radiance_number
    for i, c2w in enumerate(render_poses):
        gt_i = _resize_gt(gt_buffers, i, factor) if gt_buffers else None
        if fast:
            ro, rd = get_rays_full_image(
                H, W, K, jnp.asarray(np.asarray(c2w)[:3, :4]))
            res = render_frame(
                frame_fn, jax.random.key(i), ro.reshape(-1, 3),
                rd.reshape(-1, 3), scene.near, scene.far, chunk,
                gt_values=gt_i)
            res = {k: v.reshape(H, W, *v.shape[1:]) for k, v in res.items()}
        else:
            res = render_image(
                jax.random.key(i), variables, consts, H, W, K,
                jnp.asarray(np.asarray(c2w)[:3, :4]), scene.near, scene.far,
                rcfg_test, gt_values=gt_i, chunk=chunk, render_fn=render_fn)

        for key_name, out_name in _EXPORTS:
            append(res, key_name, i, out_name)
        # acc coverage for the collapse detector (train/health.py) —
        # returned, never saved (keeps the exported file set identical
        # to the reference's render_decomp_path).
        if "acc_map" in res:
            results.setdefault("acc", []).append(np.asarray(res["acc_map"]))
        for k in range(kk):
            append(res, f"radiance_map_{k + 1}", i, f"radiance_{k + 1}")
            append(res, f"reflected_coarse_radiance_map_{k + 1}", i,
                   f"reflected_coarse_radiance_{k + 1}")

        if "depth_map" in res:
            nfd = depth_to_normal_image_space(
                res["depth_map"], jnp.asarray(np.asarray(c2w)[:3, :4]), K)
            append({"normal_map_from_depth_map": nfd},
                   "normal_map_from_depth_map", i, "normal_from_depth")

    return {k: np.stack(v, 0) for k, v in results.items()}
