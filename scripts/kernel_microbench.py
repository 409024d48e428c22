"""Standalone fused-field kernel vs XLA: density sweep + full head.

Shapes mirror the live ε-normal sweep (512 rays x 192 samples x 4
offsets) and the reflected march (512 x 64).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_microbench.py [f32|bf16]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.models.field import (
    FieldConfig, init_field_params, apply_field, apply_field_density)
from ibl_nerf_tpu.ops.embedding import positional_encoding
from ibl_nerf_tpu.kernels.fused_field import (
    fused_field_apply, fused_field_density, pack_field_weights)


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") \
        else jnp.float32
    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    params = init_field_params(jax.random.key(0), fcfg)
    packed = pack_field_weights(params, fcfg, dtype=dt)
    params_c = jax.tree.map(lambda x: x.astype(dt), params)

    rng = np.random.default_rng(0)
    # density sweep shape: (512*4, 192, 3)
    pts_d = jnp.asarray(rng.uniform(-2, 2, (2048, 192, 3)).astype(np.float32))
    # full-head (reflected march): (512, 64, 3) + dirs (512, 3)
    pts_f = jnp.asarray(rng.uniform(-2, 2, (512, 64, 3)).astype(np.float32))
    dirs_f = jnp.asarray(rng.standard_normal((512, 3)).astype(np.float32))
    dirs_f = dirs_f / jnp.linalg.norm(dirs_f, axis=-1, keepdims=True)

    @jax.jit
    def xla_density(pts):
        pe = positional_encoding(pts, fcfg.multires).astype(dt)
        return apply_field_density(params_c, pe, fcfg).astype(jnp.float32)

    @jax.jit
    def xla_full(pts, dirs):
        pe = positional_encoding(pts, fcfg.multires).astype(dt)
        de = positional_encoding(dirs, fcfg.multires_views).astype(dt)
        de = jnp.broadcast_to(de[..., None, :], (*pts.shape[:-1], de.shape[-1]))
        return apply_field(params_c, pe, de, fcfg).astype(jnp.float32)

    pal_density = jax.jit(lambda p: fused_field_density(packed, p, fcfg))
    pal_full = jax.jit(lambda p, d: fused_field_apply(packed, p, d, fcfg))

    # parity check
    a = np.asarray(xla_density(pts_d[:4]))
    b = np.asarray(pal_density(pts_d[:4]))
    tol = 2e-2 if dt == jnp.bfloat16 else 2e-4
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1)
    assert err < tol, f"density parity {err}"

    res = {
        "dtype": str(dt.__name__),
        "density_xla_ms": round(timeit(xla_density, pts_d), 3),
        "density_pallas_ms": round(timeit(pal_density, pts_d), 3),
        "full_xla_ms": round(timeit(xla_full, pts_f, dirs_f), 3),
        "full_pallas_ms": round(timeit(pal_full, pts_f, dirs_f), 3),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
