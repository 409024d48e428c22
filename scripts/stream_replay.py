"""Train OUR pipeline on the torch reference's EXACT batch stream.

The last confound in the same-init anchor study: with identical init,
identical rays, parity-tested per-step loss/optimizer semantics, the
only remaining difference between the two frameworks is the RNG
realization (pixel draws, z-jitter, PDF draws). This script removes
the pixel-draw channel entirely: it replays the reference training
loop's exact (img, u, v) sequence (np.default_rng, drawn in
run_reference's order: img, then u, then v — reference_anchor.py)
through our loss_from_batch + optimizer step, from the ported torch
init, then scores held-out buffers with the anchor's metric code.

Interpretation:
  result ≈ the torch reference's score  -> the anchor gap was the
      pixel stream realization (luck);
  result ≈ the ours-sameinit band       -> pixel draws don't matter
      (as distribution theory says) and any remaining gap lives in
      z-jitter/PDF realizations or a perturbed-path semantic.

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tests \
        JAX_PLATFORMS=cpu python scripts/stream_replay.py \
        --init /tmp/ref_init_s0.tar --stream_seed 0
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

from reference_anchor import (  # noqa: E402
    build_scene, load_scenes, phase_bounds, decay_steps, score,
    D, W_NET, K, NS, NI, N_RAND, EPS, BETA_PRIOR_ALBEDO, BETA_IRR_REG,
    LRATE,
)


def main():
    ap = argparse.ArgumentParser("stream_replay")
    ap.add_argument("--scene", default="/tmp/anchor_scene_64")
    ap.add_argument("--out", default="/tmp/stream_replay")
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--init", default="/tmp/ref_init_s0.tar")
    ap.add_argument("--stream_seed", type=int, default=0)
    ap.add_argument("--jitter_seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig
    from ibl_nerf_tpu.render.config import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import (
        build_optimizer, init_train_state, loss_from_batch,
        make_optimizer_step, phase_render_config)
    from ibl_nerf_tpu.utils.port import load_reference_checkpoint

    root = build_scene(args.scene)
    train_scene, test_scene = load_scenes(root)
    H, W = train_scene.height, train_scene.width
    near, far = float(train_scene.near), float(train_scene.far)

    fcfg = FieldConfig(depth=D, width=W_NET, coarse_radiance_number=K)
    rcfg = RenderConfig(
        field=fcfg, n_samples=NS, n_importance=NI, perturb=True,
        normal_type="normal_map_from_depth_gradient_epsilon", epsilon=EPS,
        compute_dtype="float32")
    lcfg = LossConfig(
        beta_render=1.0, beta_radiance_render=1.0,
        beta_prior_albedo=BETA_PRIOR_ALBEDO,
        beta_irradiance_reg=BETA_IRR_REG,
        n_iter_ignore_approximated_radiance=phase_bounds(args.iters)[0],
        n_iter_ignore_prior=phase_bounds(args.iters)[1],
        coarse_radiance_number=K, load_priors=True,
        freeze_roughness=True)

    coarse, fine, _, _ = load_reference_checkpoint(args.init, K, D)
    if fine is None:
        # dump_ref_init always writes both state dicts; silently
        # substituting coarse would replay from a wrong fine init with
        # no trace in the report (ADVICE r4).
        raise SystemExit(f"{args.init} has no fine state dict — a "
                         "same-init replay needs the exact fine init")
    variables = {"coarse": coarse, "fine": fine}
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    optimizer = build_optimizer(
        variables, lrate=LRATE,
        lrate_decay=decay_steps(args.iters) // 1000, lcfg=lcfg)
    state = init_train_state(variables, optimizer)

    # gt arrays (host)
    images = np.asarray(train_scene.images, np.float32)
    pyramid = np.asarray(train_scene.prefiltered_images, np.float32)
    prior_albedo = np.asarray(train_scene.prior_albedos, np.float32)
    prior_irr = np.asarray(train_scene.prior_irradiances, np.float32)
    prior_mean = float(train_scene.prior_irradiance_mean)

    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    Kmat = jnp.asarray(train_scene.focal_matrix())
    ro_all, rd_all = [], []
    for pose in np.asarray(train_scene.poses):
        o, d = get_rays_full_image(H, W, Kmat, jnp.asarray(pose[:3, :4]))
        ro_all.append(np.asarray(o))
        rd_all.append(np.asarray(d))
    ro_all, rd_all = np.stack(ro_all), np.stack(rd_all)

    rng = np.random.default_rng(args.stream_seed)
    ign_approx, ign_prior = phase_bounds(args.iters)
    n_iters = args.iters + 1

    def make_step(phase):
        rcfg_phase = phase_render_config(rcfg, phase)

        def loss_fn(variables, key, pixel_info, rays_o, rays_d):
            keys = jax.random.split(key, 5)
            return loss_from_batch(
                variables, (keys[1], keys[2], keys[3]), consts, pixel_info,
                rays_o, rays_d, rcfg_phase, lcfg, phase, prior_mean,
                near, far, min(256, N_RAND))

        return make_optimizer_step(optimizer, donate=False)(loss_fn)

    t0 = time.time()
    boundaries = sorted({0, ign_approx, ign_prior, n_iters})
    for seg_start, seg_end in zip(boundaries[:-1], boundaries[1:]):
        phase = resolve_phase(seg_start, lcfg)
        step = make_step(phase)
        print(f"segment [{seg_start},{seg_end}) {phase}", flush=True)
        for i in range(seg_start, seg_end):
            # torch stream order: img, u, v (reference_anchor run_reference)
            img = int(rng.integers(0, images.shape[0]))
            u = rng.integers(0, W, N_RAND)
            v = rng.integers(0, H, N_RAND)
            pixel_info = {
                "rgb": jnp.asarray(images[img, v, u]),
                "prior_albedo": jnp.asarray(prior_albedo[img, v, u]),
                "prior_irradiance": jnp.asarray(prior_irr[img, v, u][..., 0]),
            }
            for k in range(K):
                pixel_info[f"rgb_{k + 1}"] = jnp.asarray(
                    pyramid[k, img, v, u])
            key = jax.random.fold_in(
                jax.random.key(42 + args.jitter_seed), i)
            state, scalars = step(state, key,
                                  pixel_info,
                                  jnp.asarray(ro_all[img, v, u]),
                                  jnp.asarray(rd_all[img, v, u]))
            if i % 400 == 0:
                print(f"  iter {i} loss "
                      f"{float(scalars['loss_total']):.5f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    # eval exactly like the anchor's ours side
    from ibl_nerf_tpu.eval.render_path import render_path

    rcfg_eval = rcfg.replace(approximate_radiance=True)
    results = render_path(state.variables, consts, test_scene, rcfg_eval,
                          render_factor=1)
    os.makedirs(args.out, exist_ok=True)
    report = {
        "iters": args.iters, "stream_seed": args.stream_seed,
        "init": args.init, "train_s": round(train_s, 1),
        "metrics": score(results, test_scene,
                         {"image": "rgb", "radiance": "radiance",
                          "albedo": "albedo", "irradiance": "irradiance"})}
    out = os.path.join(args.out, "stream_replay.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["metrics"], indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
