"""Volumetric alpha-compositing primitives.

Numerical parity with the reference compositor
(/root/reference/src/nerf_models/ibl_nerf_renderer.py:241-259):
alpha = 1 - exp(-relu(sigma_raw) * dist), transmittance = exclusive
cumprod of (1 - alpha + 1e-10), weights = alpha * T.

TPU notes: the weighted reductions over the sample axis are expressed as
einsums so XLA maps them onto the MXU/VPU; the exclusive cumprod is a
single `jnp.cumprod` (associative scan) over the short (<=192) sample
axis. All shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF_DIST = 1e10
TRANSMITTANCE_EPS = 1e-10


def dists_from_z_vals(z_vals: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample distances, last one infinite, scaled by |rays_d|.

    z_vals: (..., S); rays_d: (..., 3) -> (..., S)
    """
    d = z_vals[..., 1:] - z_vals[..., :-1]
    d = jnp.concatenate(
        [d, jnp.full_like(d[..., :1], INF_DIST)], axis=-1
    )
    return d * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def alpha_from_sigma(sigma_raw: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """alpha = 1 - exp(-relu(sigma_raw) * dist)."""
    return 1.0 - jnp.exp(-jax.nn.relu(sigma_raw) * dists)


def weights_from_alpha(alpha: jnp.ndarray) -> jnp.ndarray:
    """weights_i = alpha_i * prod_{j<i}(1 - alpha_j + eps)."""
    t = jnp.cumprod(1.0 - alpha + TRANSMITTANCE_EPS, axis=-1)
    # exclusive shift: T_0 = 1
    t = jnp.concatenate([jnp.ones_like(t[..., :1]), t[..., :-1]], axis=-1)
    return alpha * t


def transmittance_and_weights(alpha: jnp.ndarray):
    """Returns (weights, final_visibility) where final_visibility is the
    transmittance past the last sample (parity with raw2outputs_depth,
    ibl_nerf_renderer.py:140-142)."""
    t_full = jnp.cumprod(1.0 - alpha + TRANSMITTANCE_EPS, axis=-1)
    t_excl = jnp.concatenate([jnp.ones_like(t_full[..., :1]), t_full[..., :-1]], -1)
    return alpha * t_excl, t_full[..., -1]


def accumulate(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum over the sample axis.

    weights: (..., S); values: (..., S) or (..., S, C).
    """
    if values.ndim == weights.ndim:
        return jnp.sum(weights * values, axis=-1)
    return jnp.einsum("...s,...sc->...c", weights, values)


def composite_depth_disp_acc(weights: jnp.ndarray, z_vals: jnp.ndarray):
    """depth / disparity / accumulated-opacity maps.

    Parity: ibl_nerf_renderer.py:249-259.
    """
    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    return depth, disp, acc
