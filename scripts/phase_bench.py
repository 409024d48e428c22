"""Per-phase step-time attribution with dedup-proof chaining.

Every measured function is iterated with a data dependency threaded
from one call into the next AND the carry perturbation is kept above
f32 epsilon, so consecutive calls never see bitwise-identical inputs —
the axon remote backend returns cached results for identical
(executable, args) pairs and undermeasures otherwise (observed: a
"4800 TF/s" matmul chain). Phases measured in isolation at the live
Kitchen workload shapes:

  - fine full-query fwd+bwd   (512x192 pts, grad wrt params)
  - coarse full-query fwd+bwd (512x64 pts)
  - fine full-query fwd only  (for the bwd share)
  - 4x eps-normal density sweeps (4x512x192 + 4x512x64, no grad)
  - reflected marches         (2x 512x64 full query, no grad)

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase_bench.py [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

N_RAND = 512
ITERS = 20


def timed(fn, carry, iters=ITERS):
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


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
    params = init_field_params(jax.random.key(0), fcfg)

    s_fine = rcfg.n_samples + rcfg.n_importance
    s_coarse = rcfg.n_samples

    def pts_of(s, key=1):
        return jax.random.uniform(jax.random.key(key), (N_RAND, s, 3),
                                  jnp.float32, -1.0, 1.0)
    dirs = jax.random.normal(jax.random.key(2), (N_RAND, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    fine_pts, coarse_pts = pts_of(s_fine), pts_of(s_coarse)

    # carry perturbations: bounded ~1e-5 (well above f32 eps relative
    # to O(0.1..1) values) so args always differ bitwise call-to-call.
    def drift(x, signal):
        return x + 1e-5 * jnp.tanh(signal)

    # ---- grad-path fwd+bwd: grad of a scalar of the full query wrt
    # params; the params themselves are the chained carry.
    def fwdbwd(pts):
        def f(p):
            def loss(p):
                q_full, _, _, _ = _make_queries(p, rcfg)
                return jnp.mean(q_full(pts, dirs) ** 2)
            g = jax.grad(loss)(p)
            return jax.tree.map(drift, p, g)
        return jax.jit(f)

    t_fine = timed(fwdbwd(fine_pts), params)
    print(f"fine   fwd+bwd (512x192): {t_fine:7.2f} ms", flush=True)
    t_coarse = timed(fwdbwd(coarse_pts), params)
    print(f"coarse fwd+bwd (512x64) : {t_coarse:7.2f} ms", flush=True)

    # ---- fwd only (positions are the carry)
    q_full, _, q_full_ng, q_sigma_ng = _make_queries(params, rcfg)

    @jax.jit
    def fwd_only(pts):
        raw = q_full(pts, dirs)
        return drift(pts, jnp.mean(raw))

    t_fwd = timed(fwd_only, fine_pts)
    print(f"fine   fwd only         : {t_fwd:7.2f} ms", flush=True)

    # ---- eps-normal sweeps: 4-offset density queries, both passes
    @jax.jit
    def sweeps(pts):
        pts_c = pts[:, :s_coarse]
        out = 0.0
        for p in (pts, pts_c):
            batched = jnp.concatenate(
                [p + 0.01 * k for k in range(4)], axis=0)
            out = out + jnp.mean(q_sigma_ng(batched))
        return drift(pts, out)

    t_sweeps = timed(sweeps, fine_pts)
    print(f"4x sweeps (both passes) : {t_sweeps:7.2f} ms", flush=True)

    # ---- reflected marches: 2x full query over 64 samples, no grad
    @jax.jit
    def reflected(pts):
        raw = q_full_ng(pts, dirs)
        raw2 = q_full_ng(pts + 0.01, dirs)
        return drift(pts, jnp.mean(raw) + jnp.mean(raw2))

    t_refl = timed(reflected, coarse_pts)
    print(f"reflected marches (2x64): {t_refl:7.2f} ms", flush=True)

    mlp_total = t_fine + t_coarse + t_sweeps + t_refl
    print(f"\nsum of isolated MLP phases: {mlp_total:.2f} ms")
    print("(full step from bench.py minus this = elementwise "
          "compositing/shading + sample_pdf + Adam + scheduling)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16_grad")
