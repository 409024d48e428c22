"""Geometric helpers: tangent frames, hemisphere sampling, depth->normal.

Parity targets:
 - get_TBN / hemisphere samplers: /root/reference/src/utils/math_utils.py:150-199.
 - depth_to_position / depth_to_normal_image_space:
   /root/reference/src/utils/depth_to_normal_utils.py:9-46.
 - pose_spherical: math_utils.py:6-30.

The low-discrepancy hemisphere sampler (area-preserving square->hemisphere
map) is vectorized over the whole grid instead of the reference's
per-sample python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def get_tbn(normal: jnp.ndarray):
    """Build a (binormal, tangent) frame from normals (..., 3)."""
    cond = normal[..., 0] > normal[..., 2]
    zeros = jnp.zeros_like(normal[..., 0])
    b0 = jnp.where(cond, -normal[..., 1], zeros)
    b1 = jnp.where(cond, normal[..., 0], -normal[..., 2])
    b2 = jnp.where(cond, zeros, normal[..., 1])
    binormal = _normalize(jnp.stack([b0, b1, b2], axis=-1))
    tangent = jnp.cross(binormal, normal)
    return binormal, tangent


def _map_uv_to_direction(u: np.ndarray, v: np.ndarray):
    """Vectorized area-preserving square->hemisphere map (math_utils.py:33-80)."""
    x = 2 * u - 1
    y = 2 * v - 1

    # Octant decision tree, vectorized.
    c1 = y > -x
    c2 = y < x
    c3 = y > 0
    c4 = x > 0
    c5 = y > x

    xx = np.where(
        c1,
        np.where(c2, x, y),
        np.where(c5, -x, -y),
    )
    offset = np.where(
        c1,
        np.where(c2, np.where(c3, 0, 7), np.where(c4, 1, 2)),
        np.where(c5, np.where(c3, 3, 4), np.where(c4, 6, 5)),
    ).astype(np.float64)
    yy = np.where(
        c1,
        np.where(c2, np.where(c3, y, x + y), np.where(c4, y - x, -x)),
        np.where(c5, np.where(c3, -x - y, -y), np.where(c4, x, x - y)),
    )

    degenerate = (~c1) & (~c5) & (~c4) & (y == 0)
    xx_safe = np.where(xx == 0, 1.0, xx)

    theta = np.arccos(np.clip(1 - xx * xx, -1.0, 1.0))
    phi = (np.pi / 4) * (offset + yy / xx_safe)
    d = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
        axis=-1,
    )
    d = np.where(degenerate[..., None], np.array([0.0, 1.0, 0.0]), d)
    return d


def hemisphere_samples(n: int, offset=(0.5, 0.5)) -> np.ndarray:
    """n*n low-discrepancy hemisphere directions (math_utils.py:150-158)."""
    idx = np.arange(n * n)
    u_index = idx // n
    v_index = idx % n
    u = (u_index.astype(np.float64) + offset[0]) / n
    v = (v_index.astype(np.float64) + offset[1]) / n
    return _map_uv_to_direction(u, v).astype(np.float32)


def uniform_hemisphere_samples(key: jax.Array, n: int) -> jnp.ndarray:
    """n uniform hemisphere directions about +z (math_utils.py:173-182)."""
    us = jax.random.uniform(key, (n, 2))
    z = us[..., 0]
    r = jnp.sqrt(jnp.clip(1 - z * z, 0.0, 1.0))
    phi = 2 * np.pi * us[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1)


def depth_to_position(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray,
                      depth: jnp.ndarray) -> jnp.ndarray:
    """World positions from a depth map along *normalized* pixel rays
    (depth_to_normal_utils.py:9-19)."""
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = jnp.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)], -1
    )
    dirs = _normalize(dirs)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    return c2w[:3, -1] + rays_d * depth[..., None]


def depth_to_normal_image_space(depth: jnp.ndarray, c2w: jnp.ndarray,
                                K: jnp.ndarray) -> jnp.ndarray:
    """Screen-space normals from a depth image via padded central
    differences + cross product (depth_to_normal_utils.py:26-46)."""
    H, W = depth.shape
    pos = depth_to_position(H, W, K, c2w, depth)
    padded = jnp.pad(pos, ((1, 1), (1, 1), (0, 0)), mode="edge")
    left = padded[1:-1, :-2, :]
    right = padded[1:-1, 2:, :]
    up = padded[:-2, 1:-1, :]
    bottom = padded[2:, 1:-1, :]
    va = _normalize(right - left)
    vb = _normalize(bottom - up)
    return _normalize(jnp.cross(vb, va))


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Spherical camera pose helper (math_utils.py:6-30)."""
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius

    p = phi / 180.0 * np.pi
    rot_p = np.array(
        [[1, 0, 0, 0],
         [0, np.cos(p), -np.sin(p), 0],
         [0, np.sin(p), np.cos(p), 0],
         [0, 0, 0, 1]], dtype=np.float32)

    t = theta / 180.0 * np.pi
    rot_t = np.array(
        [[np.cos(t), 0, -np.sin(t), 0],
         [0, 1, 0, 0],
         [np.sin(t), 0, np.cos(t), 0],
         [0, 0, 0, 1]], dtype=np.float32)

    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32)
    return flip @ rot_t @ rot_p @ trans
