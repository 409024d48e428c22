"""NeRF sinusoidal positional encoding.

Capability parity with the reference embedder
(/root/reference/src/nerf_models/positional_embedder.py:4-52): channel
order is [input, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] with
log-sampled frequency bands 2**linspace(0, multires-1, multires).

TPU notes: the encoding is computed as one broadcasted outer product
(..., F, 2, d) and a single reshape — no python-level per-frequency
loop, so XLA fuses the whole thing into the consumer matmul's prologue.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def embedding_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    """Output channel count of :func:`positional_encoding`."""
    out = 2 * num_freqs * input_dim
    if include_input:
        out += input_dim
    return out


def frequency_bands(num_freqs: int, log_sampling: bool = True) -> np.ndarray:
    max_freq = num_freqs - 1
    if log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq, num_freqs)
    return np.linspace(2.0**0.0, 2.0**max_freq, num_freqs)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., d]`` into ``[..., embedding_dim(d, num_freqs)]``.

    Matches the reference channel ordering exactly: per frequency band,
    sin of all d channels then cos of all d channels.
    """
    if num_freqs == 0:
        return x
    freqs = jnp.asarray(frequency_bands(num_freqs, log_sampling), dtype=x.dtype)
    # (..., F, d)
    xf = x[..., None, :] * freqs[:, None]
    # (..., F, 2, d) with sin first, cos second per band.
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
