"""Inference throughput sweep: full shaded-frame rendering.

Times the jitted chunk renderer (the render_image work loop) on the
live flagship config across chunk sizes and compute dtypes.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/infer_bench.py \
        [chunk:dtype ...]        # default: 2048:f32 4096:f32 8192:f32 \
                                 #          2048:bf16 8192:bf16
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DTYPES = {"f32": "float32", "bf16": "bfloat16"}


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import RenderConfig, make_ray_batch, render_rays

    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    base = RenderConfig(
        field=fcfg, n_samples=64, n_importance=128, perturb=False,
        approximate_radiance=True,
        normal_type="normal_map_from_depth_gradient_epsilon",
        correct_depth_for_prefiltered_radiance_infer=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    variables = {"coarse": init_field_params(k1, fcfg),
                 "fine": init_field_params(k2, fcfg)}
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}

    variants = sys.argv[1:] or ["2048:f32", "4096:f32", "8192:f32",
                                "2048:bf16", "8192:bf16"]
    rng = np.random.default_rng(0)

    for v in variants:
        chunk_s, _, dt = v.partition(":")
        chunk = int(chunk_s)
        rcfg = base.replace(compute_dtype=DTYPES[dt])
        rays_o = jnp.asarray(rng.standard_normal((chunk, 3)), jnp.float32)
        rays_d = jnp.asarray(rng.standard_normal((chunk, 3)), jnp.float32)
        batch = make_ray_batch(rays_o, rays_d, 2.0, 8.0)

        f = jax.jit(lambda key, b: render_rays(key, variables, consts, b,
                                               rcfg))
        try:
            t_c0 = time.perf_counter()
            out = f(jax.random.key(0), batch)
            jax.block_until_ready(out["color_map"])
            compile_s = time.perf_counter() - t_c0
            iters = max(3, int(2e5 / chunk))
            t0 = time.perf_counter()
            for i in range(iters):
                out = f(jax.random.key(i), batch)
            jax.block_until_ready(out["color_map"])
            dt_s = time.perf_counter() - t0
            print(json.dumps({
                "variant": v,
                "rays_per_sec": round(chunk * iters / dt_s, 1),
                "ms_per_chunk": round(1000 * dt_s / iters, 2),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:  # OOM etc. — report and continue
            print(json.dumps({"variant": v,
                              "error": type(e).__name__,
                              "msg": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
