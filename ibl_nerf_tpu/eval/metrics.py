"""Image quality metrics: MSE / PSNR / SSIM.

Protocol parity with the reference evaluation
(/root/reference/src/evaluation/calculate_metrics.py:10-33): per-image
SSIM + PSNR + MSE averaged over a test split. The reference uses `piq`
(not available here); SSIM below follows the standard Wang et al. 2004
formulation with an 11x11 gaussian window (sigma 1.5), data_range=1 —
piq's defaults — implemented in jnp so it jits onto TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    m = mse(a, b)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """SSIM over (H, W, C) images (mean over channels and positions).

    Valid-window convolution ('valid' padding), per piq/skimage default.
    """
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    k = k[None, None]  # (1, 1, kh, kw) OIHW

    def filt(x):
        # (H, W, C) -> (C, 1, H, W) so each channel convolves separately.
        # HIGHEST precision: on TPU the default rounds conv operands to
        # bf16, and the E[x^2]-E[x]^2 variance terms then cancel
        # catastrophically on low-variance patches — measured SSIM 0.41
        # (even negative) on buffers whose true SSIM is 0.88.
        x = jnp.transpose(x, (2, 0, 1))[:, None]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST)
        return y[:, 0]  # (C, H', W')

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b

    # clamp variances: E[x^2]-E[x]^2 cancels catastrophically on flat
    # patches in f32 and can push per-pixel SSIM above 1
    sigma_aa = jnp.maximum(filt(a * a) - mu_aa, 0.0)
    sigma_bb = jnp.maximum(filt(b * b) - mu_bb, 0.0)
    sigma_ab = filt(a * b) - mu_ab

    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    return jnp.mean(jnp.clip(num / den, -1.0, 1.0))


def batch_metrics(preds: np.ndarray, gts: np.ndarray) -> dict:
    """Mean SSIM/PSNR/MSE over a stack of images (N, H, W, C).

    Inputs are clipped to [0, 1] — the reference protocol compares
    exported 8-bit PNGs (already clipped); unclipped HDR values break
    the SSIM variance estimates (values > 1)."""
    ssim_j = jax.jit(ssim)
    psnr_j = jax.jit(psnr)
    mse_j = jax.jit(mse)
    s, p, m = [], [], []
    for i in range(preds.shape[0]):
        a = jnp.clip(jnp.asarray(preds[i]), 0.0, 1.0)
        b = jnp.clip(jnp.asarray(gts[i]), 0.0, 1.0)
        s.append(float(ssim_j(a, b)))
        p.append(float(psnr_j(a, b)))
        m.append(float(mse_j(a, b)))
    return {"ssim": float(np.mean(s)), "psnr": float(np.mean(p)),
            "mse": float(np.mean(m)),
            "per_image": {"ssim": s, "psnr": p, "mse": m}}
