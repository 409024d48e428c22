"""Train-step perf sweep over compute_dtype x use_pallas variants.

One TPU process, sequential compiles. Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sweep.py \
        [variant ...]
where each variant is "<dtype>[:pallas]", e.g. f32 bf16 bf16:pallas.
Default sweep: f32 f32:pallas bf16 bf16:pallas mixed mixed:pallas.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# PS_N_RAND: batch-size override for throughput-scaling sweeps (the
# default 512 is the reference-workload-parity shape BASELINE.md pins).
N_RAND = int(os.environ.get("PS_N_RAND", 512))
WARMUP = 3
ITERS = 20

DTYPES = {"f32": "float32", "bf16": "bfloat16", "mixed": "mixed",
          "bf16_grad": "bf16_grad"}


def build(compute_dtype: str, use_pallas: bool, phase_iter: int = 50000,
          use_pallas_train: bool = False,
          normal_type: str = "normal_map_from_depth_gradient_epsilon"):
    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import (
        build_optimizer, init_train_state, make_train_step)

    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    rcfg = RenderConfig(
        field=fcfg, n_samples=64, n_importance=128, perturb=True,
        normal_type=normal_type,
        correct_depth_for_prefiltered_radiance_infer=True,
        compute_dtype=compute_dtype, use_pallas=use_pallas,
        use_pallas_train=use_pallas_train)
    lcfg = LossConfig(
        load_priors=True, freeze_roughness=True,
        n_iter_ignore_approximated_radiance=10000,
        n_iter_ignore_prior=100000,
        beta_prior_albedo=1.0, beta_irradiance_reg=0.1,
        coarse_radiance_number=3)
    phase = resolve_phase(phase_iter, lcfg)

    k1, k2 = jax.random.split(jax.random.key(0))
    variables = {"coarse": init_field_params(k1, fcfg),
                 "fine": init_field_params(k2, fcfg)}
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}

    h, w, n_img = 480, 640, 8
    rng = np.random.default_rng(0)
    poses = np.stack([np.eye(4, dtype=np.float32)] * n_img)
    poses[:, 2, 3] = np.linspace(0, 1, n_img)
    arrays = {
        "images": jnp.asarray(
            rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)),
        "prefiltered_images": jnp.asarray(
            rng.uniform(0, 1, (3, n_img, h, w, 3)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "K": jnp.asarray(np.array(
            [[555.0, 0, w / 2], [0, 555.0, h / 2], [0, 0, 1]], np.float32)),
    }

    optimizer = build_optimizer(variables, lrate=5e-4, lrate_decay=500,
                                lcfg=lcfg)
    state = init_train_state(variables, optimizer)
    step_fn = make_train_step(
        rcfg, lcfg, phase, optimizer, consts, h, w, N_RAND,
        prior_irradiance_mean=0.7, near=2.0, far=8.0)
    return step_fn, state, arrays


def time_variant(name: str):
    # variant syntax: <dtype>[:pallas|:ptrain][:sgs][@phase_iter],
    # e.g. f32@5000 (phase A: no approximate_radiance -> no
    # ε-sweeps/reflected march); :ptrain = fused fwd+bwd custom-vjp
    # kernel on the gradient path; :sgs = sigma-gradient-surface normal
    # estimator (one density JVP at B surface points instead of the 4
    # full ε-offset ray sweeps — the opt-in fast normal mode)
    name2, _, phase_s = name.partition("@")
    phase_iter = int(phase_s) if phase_s else 50000
    parts = name2.split(":")
    dt_key, flags = parts[0], set(parts[1:])
    normal_type = ("normal_map_from_sigma_gradient_surface"
                   if "sgs" in flags
                   else "normal_map_from_depth_gradient_epsilon")
    step_fn, state, arrays = build(DTYPES[dt_key], "pallas" in flags,
                                   phase_iter,
                                   use_pallas_train="ptrain" in flags,
                                   normal_type=normal_type)
    keys = jax.random.split(jax.random.key(7), WARMUP + ITERS)
    t_c0 = time.perf_counter()
    for i in range(WARMUP):
        state, scalars = step_fn(state, keys[i], arrays)
    jax.block_until_ready(scalars["loss_total"])
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, scalars = step_fn(state, keys[WARMUP + i], arrays)
    jax.block_until_ready(scalars["loss_total"])
    dt = time.perf_counter() - t0
    return {
        "variant": name,
        "ms_per_step": round(1000 * dt / ITERS, 2),
        "rays_per_sec": round(N_RAND * ITERS / dt, 1),
        "loss": round(float(scalars["loss_total"]), 4),
        "compile_s": round(compile_s, 1),
    }


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    variants = sys.argv[1:] or ["f32", "f32:pallas", "bf16", "bf16:pallas",
                                "mixed", "mixed:pallas"]
    for v in variants:
        print(json.dumps(time_variant(v)), flush=True)


if __name__ == "__main__":
    main()
