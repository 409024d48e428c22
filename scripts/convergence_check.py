"""Convergence smoke on real hardware: train the full pipeline on the
analytic multi-view scene and report held-out PSNR.

Runs the actual training driver (phases, priors, freezing) and then
renders the test split, comparing to analytic ground truth — the
learning-dynamics analogue of the reference's in-training
run_test_dataset regression signal (train.py:193-215).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/convergence_check.py [n_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(n_iters=3000, scene_dir="/tmp/analytic_scene",
         logdir="/tmp/convergence_logs", compute_dtype="bf16_grad",
         no_batching=True, seed=0,
         normal_type="normal_map_from_depth_gradient_epsilon"):
    # no_batching=True is the canonical protocol (the live reference
    # configs train single-image batches); merged sampling converges
    # differently at short horizons (27.2 vs 30.6 radiance PSNR @3k).
    from analytic_scene import make_analytic_scene
    from ibl_nerf_tpu.cli.config import parse_with_includes
    from ibl_nerf_tpu.train.loop import train
    from ibl_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        make_analytic_scene(scene_dir)

    args = parse_with_includes([
        "--datadir", scene_dir,
        "--basedir", logdir,
        "--expname", "conv",
        "--dataset_type", "mitsuba",
        "--N_rand", "512", "--N_samples", "32", "--N_importance", "32",
        "--N_iter", str(n_iters),
        "--coarse_radiance_number", "3",
        "--load_priors", "--prior_type", "bell",
        "--load_depth_range_from_file",
        "--freeze_roughness",
        "--N_iter_ignore_approximated_radiance", str(n_iters // 3),
        "--N_iter_ignore_prior", str(int(n_iters * 0.8)),
        "--calculating_normal_type", normal_type,
        "--correct_depth_for_prefiltered_radiance_infer",
        "--i_weights", "1000000", "--i_testset", "1000000",
        "--summary_step", "200",
        "--lrate", "5e-4", "--lrate_decay", "50",
        "--use_viewdirs",
        "--testskip", "1",
        "--compute_dtype", compute_dtype,
        "--seed", str(seed),
    ] + (["--no_batching"] if no_batching else []))

    t0 = time.time()
    state = train(args)
    print(f"trained {n_iters} iters in {time.time() - t0:.0f}s")

    # Evaluate: render the test split and compute PSNR vs analytic gt.
    import jax.numpy as jnp

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.data.dataset import load_mitsuba
    from ibl_nerf_tpu.eval.metrics import batch_metrics
    from ibl_nerf_tpu.eval.render_path import render_path
    from ibl_nerf_tpu.train.loop import (
        field_config_from_args, render_config_from_args)

    scene_val = load_mitsuba(scene_dir, split="test", coarse_radiance_number=3,
                             load_depth_range_from_file=True, load_normal=True,
                             load_albedo=True, load_irradiance=True, skip=1)
    fcfg = field_config_from_args(args)
    rcfg = render_config_from_args(args, fcfg).replace(
        approximate_radiance=True)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    results = render_path(state.variables, consts, scene_val, rcfg,
                          savedir=os.path.join(logdir, "conv", "final"),
                          render_factor=1)

    m_rgb = batch_metrics(results["radiance"], scene_val.images)
    print(f"radiance  PSNR {m_rgb['psnr']:.2f}  SSIM {m_rgb['ssim']:.3f}")
    m_shaded = batch_metrics(results["rgb"], scene_val.images)
    print(f"shaded    PSNR {m_shaded['psnr']:.2f}  SSIM {m_shaded['ssim']:.3f}")
    m_alb = batch_metrics(results["albedo"], scene_val.albedos)
    print(f"albedo    PSNR {m_alb['psnr']:.2f}")
    return m_rgb["psnr"]


if __name__ == "__main__":
    # argv: [n_iters] [compute_dtype] [normal_type-or-shorthand] [seed]
    # shorthands: eps -> depth_gradient_epsilon (live default),
    #             sgs -> sigma_gradient_surface (fast mode: one density
    #             JVP at B surface points instead of 4 full ray sweeps)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bf16_grad"
    nt = sys.argv[3] if len(sys.argv) > 3 else "eps"
    nt = {"eps": "normal_map_from_depth_gradient_epsilon",
          "sgs": "normal_map_from_sigma_gradient_surface"}.get(nt, nt)
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    tag = f"{dtype}_{'sgs' if 'sigma' in nt else 'eps'}_s{seed}"
    main(n, logdir=f"/tmp/convergence_logs_{tag}", compute_dtype=dtype,
         normal_type=nt, seed=seed)
