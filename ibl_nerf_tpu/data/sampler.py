"""On-device jittable pixel-batch sampling.

The reference draws pixel batches on host with numpy RNG + fancy
indexing and ships them to the GPU every iteration
(/root/reference/src/utils/generator_utils.py:56-159). TPU-first
replacement: the whole dataset lives on device once; each train step
derives (image index, u, v) from the step's PRNGKey and gathers pixels
*inside the jitted step* — zero host->device traffic per iteration and
bitwise-deterministic across restarts/hosts.

Supports the live `no_batching` pixel mode and the `patch` mode
(8-neighbor rays), plus precrop warm-up.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.ops.rays import get_rays_for_pixels, neighbor_coords


def _collect_scene_arrays(scene, include, convert):
    arrays: dict[str, Any] = {
        "images": convert(scene.images),
        "poses": convert(scene.poses),
        "K": convert(scene.focal_matrix()),
    }
    if scene.prefiltered_images is not None:
        arrays["prefiltered_images"] = convert(scene.prefiltered_images)
    buffers = scene.gt_buffers()
    for k in include:
        if k in buffers:
            arrays[k] = convert(buffers[k])
    return arrays


def device_arrays_from_scene(scene, include: tuple[str, ...] = ()) -> dict[str, Any]:
    """Pack the SceneData buffers we sample from into a device dict.

    include: extra gt buffer names to ship (from scene.gt_buffers()).
    """
    return _collect_scene_arrays(scene, include, jnp.asarray)


def host_arrays_from_scene(scene, include: tuple[str, ...] = ()) -> dict[str, Any]:
    """Numpy variant: the multi-host data path keeps the full dataset
    host-side and ships only each host's image shard
    (parallel/distributed.HostShardedSampler)."""
    return _collect_scene_arrays(scene, include, np.asarray)


def sample_pixel_batch(
    key: jax.Array,
    arrays: dict[str, Any],
    batch_size: int,
    H: int,
    W: int,
    precrop: bool = False,
    precrop_frac: float = 0.5,
    patch: bool = False,
    merged: bool = False,
):
    """Draw one training batch: a random image, `batch_size` random
    pixels (optionally center-cropped), their rays + per-pixel gt dict.

    merged=True samples the image index *per ray* — the working
    TPU-native version of the reference's dead `use_batching` path
    (all-image merged sampling, generator_utils.py:23-38).

    Returns (pixel_info, rays_o, rays_d, neigh_info, rays_o_n, rays_d_n)
    mirroring sample_generator_single_image's contract.
    """
    k_img, k_u, k_v = jax.random.split(key, 3)
    n_images = arrays["images"].shape[0]
    if merged:
        img_idx = jax.random.randint(k_img, (batch_size,), 0, n_images)
    else:
        img_idx = jax.random.randint(k_img, (), 0, n_images)

    if precrop:
        dH = int(H // 2 * precrop_frac)
        sH, eH = max(H // 2 - dH, 0), min(H // 2 + dH, H)
        dW = int(W // 2 * precrop_frac)
        sW, eW = max(W // 2 - dW, 0), min(W // 2 + dW, W)
    elif patch:
        sH, eH, sW, eW = 1, H - 1, 1, W - 1
    else:
        sH, eH, sW, eW = 0, H, 0, W

    u = jax.random.randint(k_u, (batch_size,), sW, eW)
    v = jax.random.randint(k_v, (batch_size,), sH, eH)

    def gather(buf):
        # buf (N, H, W, C) -> (B, C)
        return buf[img_idx, v, u]

    pixel_info = {"rgb": gather(arrays["images"])}
    if "prefiltered_images" in arrays:
        pref = arrays["prefiltered_images"]  # (K, N, H, W, 3)
        for k in range(pref.shape[0]):
            pixel_info[f"rgb_{k + 1}"] = pref[k][img_idx, v, u]
    for name in ("normal", "albedo", "roughness", "depth", "irradiance",
                 "prior_albedo"):
        if name in arrays:
            pixel_info[name] = gather(arrays[name])
    if "prior_irradiance" in arrays:
        # reference takes channel 0 only (dataset_interface.py:196)
        pixel_info["prior_irradiance"] = gather(arrays["prior_irradiance"])[..., 0]

    pose = arrays["poses"][img_idx]
    uv = jnp.stack([u, v], axis=1).astype(jnp.float32)
    # merged: pose is (B, 4, 4) and get_rays_for_pixels broadcasts the
    # per-ray rotation; single-image: one shared (3, 4) pose.
    c2w = pose[..., :3, :4]
    rays_o, rays_d = get_rays_for_pixels(uv, arrays["K"], c2w)

    neigh_info = {}
    rays_o_n = rays_d_n = None
    if patch:
        uv_n = neighbor_coords(jnp.stack([u, v], axis=1))  # (B, 8, 2) int
        un, vn = uv_n[..., 0], uv_n[..., 1]
        neigh_info["rgb"] = arrays["images"][img_idx, vn, un]
        if "normal" in arrays:
            neigh_info["normal"] = arrays["normal"][img_idx, vn, un]
        rays_o_n, rays_d_n = get_rays_for_pixels(
            uv_n.astype(jnp.float32), arrays["K"], pose[:3, :4])

    return pixel_info, rays_o, rays_d, neigh_info, rays_o_n, rays_d_n
