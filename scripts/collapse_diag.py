"""Replay the reference_anchor `ours` trajectory with health probes.

Diagnoses the seed-0 anchor collapse (VERDICT r3 weak #1): held-out
renders were exactly empty (acc=0 on every test ray) while the training
loss stayed in a plausible 0.05-0.2 band. This script re-runs the exact
same deterministic trajectory (same scene, argv, init key, per-step
fold_in keys as train/loop.py) and, every --probe_every steps, records:

  - acc (sum of compositing weights) on a fixed ray grid from train
    view 0 and test view 0 (coarse depth-only pass, perturb off),
  - raw-sigma statistics on points sampled along those same rays
    (fraction positive = fraction of space that is not dead under
    ReLU), for both coarse and fine fields,
  - loss scalars from the live train step.

Output: JSONL at --out (one probe row per line) — enough to localize
WHEN density dies and whether it is a dead-ReLU basin (raw sigma < 0
everywhere => zero gradient through density forever).

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tests \
        JAX_PLATFORMS=cpu python scripts/collapse_diag.py --seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from reference_anchor import (  # noqa: E402  (shared protocol constants)
    build_scene, load_scenes, phase_bounds, decay_steps,
    D, W_NET, K, NS, NI, N_RAND, EPS, BETA_PRIOR_ALBEDO, BETA_IRR_REG,
)


def build_args(root, iters, seed, basedir):
    from ibl_nerf_tpu.cli.config import parse_with_includes

    ign_approx, ign_prior = phase_bounds(iters)
    argv = [
        "--datadir", root, "--basedir", basedir, "--expname", "diag",
        "--dataset_type", "mitsuba", "--no_batching",
        "--load_priors", "--prior_type", "bell", "--freeze_roughness",
        "--load_depth_range_from_file",
        "--beta_prior_albedo", str(BETA_PRIOR_ALBEDO),
        "--beta_irradiance_reg", str(BETA_IRR_REG),
        "--use_viewdirs",
        "--lrate_decay", str(decay_steps(iters) // 1000),
        "--netdepth", str(D), "--netwidth", str(W_NET),
        "--N_samples", str(NS), "--N_importance", str(NI),
        "--N_rand", str(N_RAND), "--precrop_iters", "0",
        "--beta_render", "1", "--beta_radiance_render", "1",
        "--coarse_radiance_number", str(K),
        "--calculating_normal_type",
        "normal_map_from_depth_gradient_epsilon",
        "--epsilon_for_numerical_normal", str(EPS),
        "--N_iter", str(iters),
        "--N_iter_ignore_prior", str(ign_prior),
        "--N_iter_ignore_approximated_radiance", str(ign_approx),
        "--testskip", "1", "--i_testset", "1000000",
        "--i_weights", "1000000", "--compute_dtype", "float32",
        "--seed", str(seed),
    ]
    return parse_with_includes(argv)


def main():
    ap = argparse.ArgumentParser("collapse_diag")
    ap.add_argument("--scene", default="/tmp/anchor_scene_64")
    ap.add_argument("--out", default="/tmp/collapse_diag.jsonl")
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--probe_every", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.data.sampler import device_arrays_from_scene
    from ibl_nerf_tpu.models.field import apply_field_density
    from ibl_nerf_tpu.ops.embedding import positional_encoding
    from ibl_nerf_tpu.ops.rays import get_rays_full_image
    from ibl_nerf_tpu.render.renderer import make_ray_batch, render_rays
    from ibl_nerf_tpu.train.loop import (
        field_config_from_args, init_variables, loss_config_from_args,
        render_config_from_args)
    from ibl_nerf_tpu.train.losses import resolve_phase
    from ibl_nerf_tpu.train.step import (
        build_optimizer, init_train_state, make_train_step)

    root = build_scene(args.scene)
    train_scene, test_scene = load_scenes(root)
    targs = build_args(root, args.iters, args.seed, "/tmp/diag_base")

    fcfg = field_config_from_args(targs)
    rcfg = render_config_from_args(targs, fcfg)
    lcfg = loss_config_from_args(targs)
    seed = args.seed
    variables = init_variables(jax.random.key(seed), targs, fcfg)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    optimizer = build_optimizer(
        variables, lrate=targs.lrate, lrate_decay=targs.lrate_decay,
        lcfg=lcfg, group_lr_overrides={"env_map": targs.lrate_env_map},
        normal_feeds_shading=False)
    state = init_train_state(variables, optimizer)
    arrays = device_arrays_from_scene(
        train_scene, include=("normal", "albedo", "roughness", "depth",
                              "prior_albedo", "prior_irradiance"))

    H, W = train_scene.height, train_scene.width
    Kmat = jnp.asarray(train_scene.focal_matrix())
    near, far = float(train_scene.near), float(train_scene.far)

    # fixed probe rays: every 4th pixel of train view 0 / test view 0
    def probe_rays(scene):
        o, d = get_rays_full_image(scene.height, scene.width, Kmat,
                                   jnp.asarray(scene.poses[0][:3, :4]))
        return o[::4, ::4].reshape(-1, 3), d[::4, ::4].reshape(-1, 3)

    tr_o, tr_d = probe_rays(train_scene)
    te_o, te_d = probe_rays(test_scene)
    rcfg_probe = rcfg.replace(perturb=False, raw_noise_std=0.0)

    @jax.jit
    def probe(variables):
        out = {}
        for tag, (ro, rd) in (("train", (tr_o, tr_d)),
                              ("test", (te_o, te_d))):
            batch = make_ray_batch(ro, rd, near, far)
            res = render_rays(jax.random.key(0), variables, consts, batch,
                              rcfg_probe, is_depth_only=True)
            acc = jnp.sum(res["weights"], -1)
            out[f"acc_{tag}_mean"] = jnp.mean(acc)
            out[f"acc_{tag}_max"] = jnp.max(acc)
            # raw sigma along these rays (coarse linspace, both fields)
            t = jnp.linspace(near, far, NS)
            pts = ro[:, None, :] + rd[:, None, :] * t[None, :, None]
            pe = positional_encoding(pts, fcfg.multires)
            for net in ("coarse", "fine"):
                raw = apply_field_density(variables[net], pe, fcfg)[..., 0]
                out[f"sigma_{tag}_{net}_fracpos"] = jnp.mean(raw > 0.0)
                out[f"sigma_{tag}_{net}_max"] = jnp.max(raw)
                out[f"sigma_{tag}_{net}_mean"] = jnp.mean(raw)
        return out

    rows = []
    f = open(args.out, "w")

    def record(i, scalars):
        row = {"step": i}
        row.update({k: round(float(v), 5) for k, v in probe(
            state.variables).items()})
        if scalars is not None:
            row.update({k: round(float(v), 5) for k, v in scalars.items()})
        rows.append(row)
        f.write(json.dumps(row) + "\n")
        f.flush()
        print(f"[{i}] acc_test={row['acc_test_mean']:.4f} "
              f"acc_train={row['acc_train_mean']:.4f} "
              f"fine_fracpos={row['sigma_test_fine_fracpos']:.4f} "
              f"fine_max={row['sigma_test_fine_max']:.3f}", flush=True)

    record(-1, None)

    n_iters = args.iters + 1
    ign_approx, ign_prior = phase_bounds(args.iters)
    boundaries = sorted({0, ign_approx, ign_prior, n_iters})
    t0 = time.time()
    for seg_start, seg_end in zip(boundaries[:-1], boundaries[1:]):
        phase = resolve_phase(seg_start, lcfg)
        step_fn = make_train_step(
            rcfg, lcfg, phase, optimizer, consts, H, W, targs.N_rand,
            prior_irradiance_mean=train_scene.prior_irradiance_mean,
            near=near, far=far, merged_sampling=False, donate=False)
        print(f"segment [{seg_start},{seg_end}) {phase}", flush=True)
        for i in range(seg_start, seg_end):
            key = jax.random.fold_in(jax.random.key(42 + seed), i)
            state, scalars = step_fn(state, key, arrays)
            if i % args.probe_every == 0:
                record(i, jax.device_get(scalars))
    print(f"done in {time.time() - t0:.0f}s -> {args.out}")
    f.close()


if __name__ == "__main__":
    main()
