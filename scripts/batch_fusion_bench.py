"""Measure the attainable win from batching the no-grad sweeps across
the coarse and fine passes (VERDICT r2 item 4) BEFORE committing to the
renderer restructure.

Phases today (render/renderer.py): per pass, the 4x ε-normal density
sweep and the reflected march run as separate dependent MLP chains —
6 no-grad chain launches per step. Candidate: batch coarse+fine sweeps
into one chain and both reflected marches into one. Because the two
passes query DIFFERENT networks (coarse vs fine params), the true
merged form is a 2-model vmap (batched matmuls); this script measures:

  A. sweeps separate   : chain(4Bx192 fine-params) + chain(4Bx64 coarse)
  B. sweeps merged-1net: one chain (B, 4*(192+64), 3) same params
                         (upper bound: what merging could buy if both
                         passes shared one network)
  C. sweeps merged-2net: vmap over stacked [coarse, fine] params —
                         the form the real renderer would need
  D. reflected separate: 2 chains of (B, 64, 3) full query, 2 nets
  E. reflected merged  : same-params (2B, 64, 3) upper bound
  F. reflected vmapped : 2-net vmap form

All chained with drifting carries (axon dedup-proof, see
phase_bench.py). Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_fusion_bench.py [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import os

N_RAND = int(os.environ.get("BF_N_RAND", 512))
ITERS = int(os.environ.get("BF_ITERS", 20))


def timed(fn, carry, iters=ITERS):
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def drift(x, signal):
    return x + 1e-5 * jnp.tanh(signal)


def main(compute_dtype="bf16_grad"):
    from ibl_nerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import RenderConfig
    from ibl_nerf_tpu.render.renderer import _make_queries

    print(f"devices: {jax.devices()}  dtype={compute_dtype}", flush=True)
    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    rcfg = RenderConfig(field=fcfg, n_samples=64, n_importance=128,
                        compute_dtype=compute_dtype)
    p_coarse = init_field_params(jax.random.key(0), fcfg)
    p_fine = init_field_params(jax.random.key(1), fcfg)

    s_f = rcfg.n_samples + rcfg.n_importance   # 192
    s_c = rcfg.n_samples                       # 64

    key = jax.random.key(3)
    pts = jax.random.uniform(key, (N_RAND, 4 * (s_f + s_c), 3),
                             jnp.float32, -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(2), (N_RAND, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    _, _, _, qs_c = _make_queries(p_coarse, rcfg)
    _, _, qf_f_ng, qs_f = _make_queries(p_fine, rcfg)
    _, _, qf_c_ng, _ = _make_queries(p_coarse, rcfg)

    # ---- A: sweeps separate (today's layout) --------------------------
    @jax.jit
    def sweeps_sep(pts):
        fine_pts = pts[:, :4 * s_f].reshape(4 * N_RAND, s_f, 3)
        coarse_pts = pts[:, 4 * s_f:].reshape(4 * N_RAND, s_c, 3)
        out = jnp.mean(qs_f(fine_pts)) + jnp.mean(qs_c(coarse_pts))
        return drift(pts, out)

    t_a = timed(sweeps_sep, pts)
    print(f"A sweeps separate (2 chains, 2 nets): {t_a:7.2f} ms", flush=True)

    # ---- B: merged, single net (upper bound) --------------------------
    @jax.jit
    def sweeps_merged1(pts):
        return drift(pts, jnp.mean(qs_f(pts)))

    t_b = timed(sweeps_merged1, pts)
    print(f"B sweeps merged 1-net (upper bound) : {t_b:7.2f} ms", flush=True)

    # ---- C: merged, 2-net vmap form ------------------------------------
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p_coarse, p_fine)

    def q_sigma_of(params):
        _, q, _, _ = _make_queries(params, rcfg)
        # per-net row budget: half the total points each
        return q

    @jax.jit
    def sweeps_vmapped(pts):
        half = pts.reshape(2, N_RAND, 2 * (s_f + s_c), 3)
        out = jax.vmap(lambda p, x: _make_queries(p, rcfg)[1](x))(
            stacked, half)
        return drift(pts, jnp.mean(out))

    t_c = timed(sweeps_vmapped, pts)
    print(f"C sweeps merged 2-net vmap          : {t_c:7.2f} ms", flush=True)

    # ---- reflected marches --------------------------------------------
    refl = pts[:, :s_c]

    @jax.jit
    def refl_sep(pts):
        r = pts[:, :s_c]
        out = (jnp.mean(qf_c_ng(r, dirs)[..., :9])
               + jnp.mean(qf_f_ng(r + 0.01, dirs)[..., :9]))
        return drift(pts, out)

    t_d = timed(refl_sep, pts)
    print(f"D reflected separate (2 chains)     : {t_d:7.2f} ms", flush=True)

    @jax.jit
    def refl_merged1(pts):
        r = jnp.concatenate([pts[:, :s_c], pts[:, s_c:2 * s_c]], axis=0)
        d2 = jnp.concatenate([dirs, dirs], axis=0)
        return drift(pts, jnp.mean(qf_f_ng(r, d2)[..., :9]))

    t_e = timed(refl_merged1, pts)
    print(f"E reflected merged 1-net (bound)    : {t_e:7.2f} ms", flush=True)

    @jax.jit
    def refl_vmapped(pts):
        r = jnp.stack([pts[:, :s_c], pts[:, s_c:2 * s_c]])  # (2, B, s_c, 3)
        d2 = jnp.stack([dirs, dirs])
        out = jax.vmap(lambda p, x, dd: _make_queries(p, rcfg)[2](x, dd))(
            stacked, r, d2)
        return drift(pts, jnp.mean(out[..., :9]))

    t_f = timed(refl_vmapped, pts)
    print(f"F reflected merged 2-net vmap       : {t_f:7.2f} ms", flush=True)

    print(f"\nsweep win  : separate {t_a:.2f} -> merged2net {t_c:.2f} "
          f"({t_a - t_c:+.2f} ms; 1-net bound {t_b:.2f})")
    print(f"refl win   : separate {t_d:.2f} -> merged2net {t_f:.2f} "
          f"({t_d - t_f:+.2f} ms; 1-net bound {t_e:.2f})")
    print(f"total attainable: {t_a + t_d - t_c - t_f:+.2f} ms of the "
          f"18.5 ms step")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16_grad")
