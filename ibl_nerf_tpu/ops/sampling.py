"""Stratified + hierarchical (inverse-CDF) ray sampling.

Numerical parity with the reference sampler
(/root/reference/src/nerf_models/nerf_renderer_helper.py:91-134) and the
stratified perturbation (ibl_nerf_renderer.py:670-692), with JAX PRNG
keys replacing torch global RNG.

TPU notes: `searchsorted` is replaced by a broadcasted comparison count
(u >= cdf summed over bins) — a tiny dense VPU op with fully static
shapes, faster than a lowered binary search at these sizes (<=65 bins x
128 samples); gathers use take_along_axis on the short bin axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: jax.Array | None,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    lindisp: bool = False,
    perturb: bool = True,
) -> jnp.ndarray:
    """Coarse z samples: linspace in depth (or disparity), optionally
    jittered uniformly within each stratum.

    near/far: (..., 1) -> z_vals (..., n_samples).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.asarray(near).dtype)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    if perturb:
        assert key is not None
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * t_rand
    return z


def sample_pdf(
    key: jax.Array | None,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling of ``n_samples`` new z values.

    bins: (B, M) bin centers; weights: (B, M-1). Returns (B, n_samples).
    Matches torch semantics: searchsorted(cdf, u, right=True) with
    below/above clamping and degenerate-interval guard (denom < 1e-5).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        assert key is not None
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    # searchsorted right=True == number of cdf entries <= u.
    inds = jnp.sum(
        (u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
