"""Learnable environment map.

Parity: /root/reference/src/nerf_models/envmap.py:6-27 — a (3, 2n, n)
emission texture with a direction->canonical-UV mapping and bilinear
lookup. The reference plumbs this into the optimizer when
`use_environment_map` but never consumes it in the live renderer
(SURVEY.md C21); we keep the same capability surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ibl_nerf_tpu.ops.texture import grid_sample_2d


def init_envmap(key: jax.Array, n: int = 16):
    """Emission texture params: {'emission': (2n, n, 3)} (HWC layout)."""
    return {"emission": jax.random.uniform(key, (2 * n, n, 3)) * 0.1}


def direction_to_canonical(dirs: jnp.ndarray) -> jnp.ndarray:
    """Map unit directions to [-1,1]^2 UV: u = atan2(y,x)/pi,
    v = 2*acos(z)/pi - 1 (equirect-style; parity envmap.py:14-20)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    u = jnp.arctan2(y, x) / jnp.pi
    v = 2.0 * jnp.arccos(jnp.clip(z, -1.0, 1.0)) / jnp.pi - 1.0
    return jnp.stack([u, v], axis=-1)


def sample_envmap(params, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear emission lookup along directions (..., 3) -> (..., 3)."""
    uv = direction_to_canonical(
        dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-12))
    return grid_sample_2d(params["emission"], uv)
