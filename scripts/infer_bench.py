"""Inference throughput sweep: full shaded-frame rendering.

Two modes per variant spec:
  <chunk>:<dtype>            — legacy per-chunk dispatch of render_rays
                               (the render_image work loop);
  frame:<chunk>:<dtype>[:scan|:coarse]
                             — the fast path: ONE scanned XLA dispatch
                               for a full 640x480 frame with the coarse
                               pass weights-only and only the exported
                               buffers computed. ':scan' additionally
                               runs the 4 ε-offset sweeps sequentially
                               (sweep_scan, 4x lower peak memory);
                               ':coarse' keeps full coarse shading (for
                               attribution).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/infer_bench.py \
        [spec ...]   # default: a fast-path sweep + one legacy baseline
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DTYPES = {"f32": "float32", "bf16": "bfloat16"}
H, W = 480, 640  # benchmark frame


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import (
        RenderConfig, make_ray_batch, render_rays, make_frame_render_fn,
        render_frame)

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

    # The buffers render_path exports (the fast path computes only these).
    export_keys = ("color_map", "radiance_map", "irradiance_map",
                   "albedo_map", "reflected_radiance_map",
                   "prefiltered_reflected_map", "roughness_map",
                   "specular_map", "diffuse_map", "n_dot_v_map",
                   "target_normal_map", "disp_map", "depth_map",
                   "target_depth_map")

    variants = sys.argv[1:] or [
        "2048:f32",
        "frame:2048:f32", "frame:4096:f32",
        "frame:2048:bf16", "frame:4096:bf16", "frame:8192:bf16",
        "frame:16384:bf16:scan",
        "frame:4096:bf16:coarse",
    ]
    rng = np.random.default_rng(0)

    for v in variants:
        parts = v.split(":")
        try:
            if parts[0] == "frame":
                chunk, dt = int(parts[1]), DTYPES[parts[2]]
                opts = set(parts[3:])
                rcfg = base.replace(
                    compute_dtype=dt,
                    coarse_shading="coarse" in opts,
                    sweep_scan="scan" in opts)
                if "sgs" in opts:   # sigma-gradient-surface fast normals
                    rcfg = rcfg.replace(
                        normal_type="normal_map_from_sigma_gradient_surface")
                keys = (("color_map",) if "minimal" in opts
                        else export_keys)
                unroll = next((int(o[1:]) for o in opts
                               if o.startswith("u")), 1)
                rays_o = jnp.asarray(
                    rng.standard_normal((H * W, 3)), jnp.float32) * 0.1
                rays_d = jnp.asarray(
                    rng.standard_normal((H * W, 3)), jnp.float32)
                fn = make_frame_render_fn(variables, consts, rcfg,
                                          output_keys=keys, unroll=unroll)
                t_c0 = time.perf_counter()
                out = render_frame(fn, jax.random.key(0), rays_o, rays_d,
                                   2.0, 8.0, chunk)
                jax.block_until_ready(out["color_map"])
                compile_s = time.perf_counter() - t_c0
                iters = 3
                t0 = time.perf_counter()
                for i in range(iters):
                    out = render_frame(fn, jax.random.key(i), rays_o,
                                       rays_d, 2.0, 8.0, chunk)
                jax.block_until_ready(out["color_map"])
                dt_s = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "variant": v,
                    "frame": f"{W}x{H}",
                    "frame_s": round(dt_s, 3),
                    "rays_per_sec": round(H * W / dt_s, 1),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            else:
                chunk, dt = int(parts[0]), DTYPES[parts[1]]
                rcfg = base.replace(compute_dtype=dt)
                rays_o = jnp.asarray(
                    rng.standard_normal((chunk, 3)), jnp.float32)
                rays_d = jnp.asarray(
                    rng.standard_normal((chunk, 3)), jnp.float32)
                batch = make_ray_batch(rays_o, rays_d, 2.0, 8.0)
                f = jax.jit(lambda key, b: render_rays(
                    key, variables, consts, b, rcfg))
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
