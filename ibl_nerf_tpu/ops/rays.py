"""Pinhole-camera ray generation.

Capability parity with the reference ray helpers
(/root/reference/src/nerf_models/nerf_renderer_helper.py:14-87):
camera looks down -z, +x right, -y down in pixel space; rays are rotated
into world space by the camera-to-world rotation.

All functions are pure jnp and shape-polymorphic over the leading batch
dims, so they jit cleanly and can run on device inside the train step
(the reference generates rays on host per iteration).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _dirs_from_pixels(i: jnp.ndarray, j: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-space directions for pixel coords (i=u=col, j=v=row)."""
    return jnp.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)],
        axis=-1,
    )


def _rotate_to_world(dirs: jnp.ndarray, c2w: jnp.ndarray):
    # Row-vector contraction, identical to the reference's
    # sum(dirs[..., None, :] * c2w[:3, :3], -1). c2w may carry leading
    # batch dims (per-ray poses for merged sampling).
    rays_d = jnp.sum(dirs[..., None, :] * c2w[..., :3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[..., :3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_full_image(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Rays for every pixel of an HxW image. Returns (rays_o, rays_d), each (H, W, 3)."""
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = _dirs_from_pixels(i, j, K)
    return _rotate_to_world(dirs, c2w)


def get_rays_for_pixels(uv: jnp.ndarray, K: jnp.ndarray, c2w: jnp.ndarray):
    """Rays for a flat list of pixel coords ``uv[..., 2]`` (u=col, v=row)."""
    dirs = _dirs_from_pixels(uv[..., 0], uv[..., 1], K)
    return _rotate_to_world(dirs, c2w)


# Patch sampling uses the same math over an extra neighbor axis.
get_rays_for_patches = get_rays_for_pixels


_NEIGHBOR_OFFSETS = np.array(
    [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 1], [1, -1], [1, 0], [1, 1]],
    dtype=np.int32,
)


def neighbor_coords(uv: jnp.ndarray) -> jnp.ndarray:
    """8-neighborhood of integer pixel coords: (N, 2) -> (N, 8, 2).

    Parity: /root/reference/src/utils/generator_utils.py:162-176.
    """
    return uv[:, None, :] + jnp.asarray(_NEIGHBOR_OFFSETS, dtype=uv.dtype)


def ndc_rays(H: int, W: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Normalized-device-coordinate reparameterization (unused in live
    configs; parity with nerf_renderer_helper.py:70-87)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
