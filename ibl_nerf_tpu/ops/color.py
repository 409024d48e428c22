"""Color-space transforms and image metrics helpers.

Parity: gamma / tonemap at /root/reference/src/nerf_models/
ibl_nerf_renderer.py:22-35 and numpy sRGB helpers at
/root/reference/src/utils/image_utils.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GAMMA = 2.2
EPSILON_SRGB = 1e-12


def rgb_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    """Simple power-law gamma encode: (x + eps)^(1/2.2)."""
    return jnp.power(x + EPSILON_SRGB, 1.0 / GAMMA)


def tonemap_reinhard(x: jnp.ndarray) -> jnp.ndarray:
    return x / (x + 1.0)


def hdr_radiance_activation(x: jnp.ndarray) -> jnp.ndarray:
    """relu radiance activation used when `use_radiance_linear` is on."""
    return jnp.maximum(x, 0.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


# Piecewise (IEC 61966-2-1) sRGB transforms, numpy variants for data I/O.
def linear_to_srgb_np(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * np.power(x, 1 / 2.4) - 0.055)


def srgb_to_linear_np(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92, np.power((x + 0.055) / 1.055, 2.4))
