"""Texture / LUT sampling (our `grid_sample` equivalent) and mip interpolation.

Parity targets:
 - BRDF LUT fetch: torch F.grid_sample(align_corners=True, bilinear) at
   /root/reference/src/nerf_models/ibl_nerf_renderer.py:418-421.
 - Continuous mip selection over the prefiltered radiance stack:
   ibl_nerf_renderer.py:464-470.

TPU notes: gathers over the flattened texture are plain XLA gathers (the
LUT is 512x512 and lives in HBM once); the 4-level mip lerp is expressed
as a one-hot einsum so it compiles to two tiny matmuls instead of a
dynamic gather along the level axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture sampling with align_corners=True semantics.

    tex: (H, W, C) texture.
    uv:  (..., 2) coords in [-1, 1]; uv[..., 0] indexes width (x),
         uv[..., 1] indexes height (y) — torch grid_sample convention.
    Returns (..., C). Out-of-range coords are clamped to the border.
    """
    H, W, C = tex.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x, 0, W - 1) - x0
    wy = jnp.clip(y, 0, H - 1) - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    flat = tex.reshape(H * W, C)

    def fetch(yi, xi):
        return flat[(yi * W + xi).reshape(-1)].reshape(*yi.shape, C)

    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x1i)
    v10 = fetch(y1i, x0i)
    v11 = fetch(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def mip_interp(levels: jnp.ndarray, level_value: jnp.ndarray) -> jnp.ndarray:
    """Continuous lookup along a stacked mip axis.

    levels: (B, L, C) per-ray stack [finest..coarsest].
    level_value: (B,) continuous in [0, 1]; scaled to [0, L-1], floor and
    floor+1 levels lerped (indices clamped) — parity with
    ibl_nerf_renderer.py:464-470 including its int() truncation.
    Returns (B, C).
    """
    L = levels.shape[-2]
    lv = level_value * (L - 1)
    i1 = jnp.clip(lv.astype(jnp.int32), 0, L - 1)
    i2 = jnp.clip(i1 + 1, 0, L - 1)
    rem = (lv - i1.astype(lv.dtype))[..., None]

    ar = jnp.arange(L)
    oh1 = (i1[..., None] == ar).astype(levels.dtype)  # (B, L)
    oh2 = (i2[..., None] == ar).astype(levels.dtype)
    v1 = jnp.einsum("...l,...lc->...c", oh1, levels)
    v2 = jnp.einsum("...l,...lc->...c", oh2, levels)
    return (1.0 - rem) * v1 + rem * v2
