"""Whole-step roofline for the training step (VERDICT round-1 item 3).

Answers, with numbers from the compiled program itself, whether XLA is
leaving step-level headroom that a hand-fused (Pallas custom-vjp)
backward could reclaim — or whether the step already sits at the
hardware ceiling for this workload shape.

Method:
  1. FLOPs and HBM bytes of the COMPILED train step from XLA's own
     cost model (`compiled.cost_analysis()`), not hand counting.
  2. Analytic per-phase FLOP attribution from the workload shapes
     (coarse march / fine march fwd+bwd / 4x eps-normal density sweeps
     / reflected march) so the XLA total can be sanity-checked and the
     phase mix is explicit.
  3. A dependent-chain MXU plateau measurement: the field is a chain of
     (N,256)x(256,256) matmuls where layer i+1 needs layer i, executed
     back-to-back. The achievable ceiling for this step is NOT the
     datasheet MXU peak (which assumes large independent matmuls) but
     the measured rate of exactly this chain. Iterations are chained
     through a data dependency so the remote (axon) backend cannot
     overlap or dedup them.
  4. Roofline: achievable ms = max(flops / chain_plateau,
     hbm_bytes / BW).  Attained ms = measured step. The verdict is the
     attained/achievable ratio.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/step_roofline.py [dtype]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e datasheet: 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_BF16 = 197e12
HBM_BW = 819e9

N_RAND = 512
ITERS = 20


def measure_chain_plateau(width=256, n_layers=8, n_pts=393216,
                          dtype=jnp.bfloat16):
    """Measured TF/s of the dependent (N,W)x(W,W) relu-matmul chain.

    This is the structure of every field query in the step; its rate is
    the honest MXU ceiling for this workload (dependent 256-wide layers
    pipeline far below datasheet peak). Chained across timing
    iterations via a data dependency (out feeds in), so the remote
    backend executes them strictly sequentially.
    """
    w = jax.random.normal(jax.random.key(0), (width, width), jnp.float32)
    w = (w * 0.05).astype(dtype)
    x0 = jax.random.normal(jax.random.key(1), (n_pts, width), dtype)

    @jax.jit
    def chain(x):
        for _ in range(n_layers):
            x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=jnp.float32)
                            ).astype(dtype)
        # keep activations bounded so the chain can be self-fed
        return x / (1.0 + jnp.max(jnp.abs(x)))

    x = chain(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = chain(x)          # data-dependent: cannot overlap/dedup
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * n_pts * width * width * n_layers
    return flops / dt, dt


def analytic_phase_flops(n_rand=N_RAND, n_samples=64, n_importance=128,
                         width=256, depth=8, k_coarse=3,
                         normal_type="eps"):
    """Hand-counted MLP FLOPs per step phase (matmuls only)."""
    in_ch, in_ch_views = 63, 27
    half = width // 2

    def full_query(n_pts):
        trunk = 2 * n_pts * (in_ch * width                      # layer 0
                             + (depth - 2) * width * width      # 1..6
                             + (width + in_ch) * width)         # post-skip
        heads = 2 * n_pts * (width * 2 * half                   # pos feats
                             + width * width                    # feature
                             + (width + in_ch_views) * width    # view layer
                             + width * k_coarse * half          # coarse feats
                             + width * (9 + 3 * k_coarse) * 2   # A, C packs
                             + 2 * half * (9 + 3 * k_coarse)    # B pack
                             + k_coarse * half * (9 + 3 * k_coarse))  # D
        return trunk + heads

    def density_query(n_pts):
        return 2 * n_pts * (in_ch * width + (depth - 2) * width * width
                            + (width + in_ch) * width + width * 1)

    n_coarse = n_rand * n_samples
    n_fine = n_rand * (n_samples + n_importance)
    phases = {
        # grad path: fwd + bwd = 3x fwd matmul FLOPs
        "coarse fwd+bwd": 3 * full_query(n_coarse),
        "fine fwd+bwd": 3 * full_query(n_fine),
        # reflected-ray second march: both passes, along constant
        # coarse z (n_samples samples), full query, no grad
        "reflected march (2x)": 2 * full_query(n_coarse),
    }
    if normal_type == "sgs":
        # sigma-gradient-surface: one density JVP (fwd + tangent = 2x
        # density FLOPs) at the B surface points, per pass — replaces
        # the 4x full-ray sweeps entirely.
        phases["sgs density JVP (2x)"] = 2 * 2 * density_query(n_rand)
    else:
        # 4 eps offsets, density-only, no grad; BOTH passes shade, so
        # both estimate normals (coarse marches 64, fine 192 samples)
        phases["eps-normal sweeps (4x)"] = 4 * (density_query(n_coarse)
                                                + density_query(n_fine))
    return phases


def measure_step(compute_dtype, normal_type="eps"):
    import bench

    # reuse bench's exact builder by calling its main with instrumentation:
    # simpler: rebuild here with the same config.
    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import (
        build_optimizer, init_train_state, make_train_step)

    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    rcfg = RenderConfig(
        field=fcfg, n_samples=64, n_importance=128, perturb=True,
        normal_type=("normal_map_from_sigma_gradient_surface"
                     if normal_type == "sgs"
                     else "normal_map_from_depth_gradient_epsilon"),
        correct_depth_for_prefiltered_radiance_infer=True,
        compute_dtype=compute_dtype)
    lcfg = LossConfig(
        load_priors=True, freeze_roughness=True,
        n_iter_ignore_approximated_radiance=10000,
        n_iter_ignore_prior=100000,
        beta_prior_albedo=1.0, beta_irradiance_reg=0.1,
        coarse_radiance_number=3)
    phase = resolve_phase(50000, lcfg)

    k1, k2 = jax.random.split(jax.random.key(0))
    variables = {"coarse": init_field_params(k1, fcfg),
                 "fine": init_field_params(k2, fcfg)}
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    h, w, n_img = 480, 640, 8
    rng = np.random.default_rng(0)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n_img)
    poses[:, 2, 3] = np.linspace(0, 1, n_img)
    arrays = {
        "images": jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)),
        "prefiltered_images": jnp.asarray(
            rng.uniform(0, 1, (3, n_img, h, w, 3)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "K": jnp.asarray(np.array(
            [[555.0, 0, w / 2], [0, 555.0, h / 2], [0, 0, 1]], np.float32)),
    }
    optimizer = build_optimizer(variables, lrate=5e-4, lrate_decay=500,
                                lcfg=lcfg)
    state = init_train_state(variables, optimizer)
    step_fn = make_train_step(rcfg, lcfg, phase, optimizer, consts, h, w,
                              N_RAND, prior_irradiance_mean=0.7,
                              near=2.0, far=8.0)

    keys = jax.random.split(jax.random.key(7), 3 + ITERS)
    for i in range(3):
        state, scalars = step_fn(state, keys[i], arrays)
    jax.block_until_ready(scalars["loss_total"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, scalars = step_fn(state, keys[3 + i], arrays)
    jax.block_until_ready(scalars["loss_total"])
    step_ms = (time.perf_counter() - t0) / ITERS * 1e3

    # XLA's own cost model for the whole compiled step
    cost = {}
    try:
        lowered = jax.jit(step_fn).lower(state, keys[0], arrays)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        cost = {"flops": float(ca.get("flops", float("nan"))),
                "bytes": float(ca.get("bytes accessed", float("nan")))}
    except Exception as e:  # cost model may be unavailable on a backend
        cost = {"error": repr(e)}
    return step_ms, cost


def main(compute_dtype="bf16_grad", normal_type="eps"):
    from ibl_nerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"devices: {jax.devices()}", flush=True)

    plateau, chain_ms = measure_chain_plateau()
    print(f"dependent-chain MXU plateau: {plateau/1e12:.1f} TF/s "
          f"({chain_ms*1e3:.2f} ms for 8x(393216,256)x(256,256)) "
          f"= {plateau/PEAK_BF16*100:.0f}% of datasheet peak", flush=True)

    phases = analytic_phase_flops(normal_type=normal_type)
    total_mlp = sum(phases.values())
    print("\nanalytic per-phase MLP FLOPs:")
    for name, f in phases.items():
        ach = f / plateau * 1e3
        print(f"  {name:26s} {f/1e9:8.1f} GF   achievable "
              f"{ach:5.2f} ms @ chain plateau")
    print(f"  {'TOTAL MLP':26s} {total_mlp/1e9:8.1f} GF   achievable "
          f"{total_mlp/plateau*1e3:5.2f} ms")

    step_ms, cost = measure_step(compute_dtype, normal_type)
    print(f"\nmeasured full step ({compute_dtype}, {normal_type}): "
          f"{step_ms:.2f} ms "
          f"({N_RAND/step_ms*1e3:,.0f} rays/s)")
    if "flops" in cost:
        xla_flops = cost["flops"]
        xla_bytes = cost["bytes"]
        t_mxu = total_mlp / plateau * 1e3
        t_hbm = xla_bytes / HBM_BW * 1e3
        print(f"XLA cost model: {xla_flops/1e9:.1f} GF, "
              f"{xla_bytes/1e6:.1f} MB operand bytes")
        # NOTE: XLA's 'bytes accessed' counts every op's operand bytes,
        # NOT deduplicated HBM traffic — fused/VMEM-resident reuse makes
        # the true HBM term far smaller (measured step < the 'HBM bound'
        # proves it), so the binding ceiling is the MXU chain term.
        print(f"op-bytes bound (upper bound, not HBM): {t_hbm:.2f} ms; "
              f"MXU chain bound: {t_mxu:.2f} ms")
        attained_tfs = total_mlp / (step_ms / 1e3) / 1e12
        print(f"attained {attained_tfs:.1f} TF/s of MLP work = "
              f"{step_ms and total_mlp/(step_ms/1e3)/plateau*100:.0f}% "
              f"of the dependent-chain ceiling "
              f"(achievable {t_mxu:.2f} ms vs attained {step_ms:.2f} ms)")
    else:
        print(f"XLA cost model unavailable: {cost.get('error')}")
        t_mxu = total_mlp / plateau * 1e3
        print(f"roofline (MXU only): achievable {t_mxu:.2f} ms; "
              f"attained/achievable = {step_ms/t_mxu*100:.0f}%")

    print(json.dumps({"step_ms": round(step_ms, 2),
                      "chain_plateau_tfs": round(plateau / 1e12, 1),
                      "total_mlp_gf": round(total_mlp / 1e9, 1),
                      **({k: round(v, 1) for k, v in cost.items()}
                         if "flops" in cost else {})}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16_grad",
         sys.argv[2] if len(sys.argv) > 2 else "eps")
