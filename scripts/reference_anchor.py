"""Decomposition-health anchor: train the ACTUAL torch reference and our
framework on the SAME scene with the SAME scaled-down live protocol, and
compare held-out decomposition-buffer quality (VERDICT r2 weak #8).

The paper's tables (arXiv:2210.08202) are unreachable in this
zero-egress environment, so the anchor is the verdict's other accepted
form: a reference-trained small-scale comparison. Both sides train on
the analytic Mitsuba-format scene at an identical config — same network
size, sample counts, batch size, LR schedule, loss set (the live
defaults: radiance + K coarse-radiance, approximated-radiance color
from phase B, rgb albedo prior + irradiance regularizer with
freeze_roughness from phase C — train.py:326-441 with config_parser.py
defaults albedo_prior_type=rgb, beta_prior_irradiance=0) — then render
the same test views and score PSNR/SSIM on shaded image, radiance,
albedo and irradiance with the same metric code.

Torch side drives the reference's own renderer/loss/optimizer/set_lr
exactly as src/train.py:223-521 does (the loop body is the verified
driver of tests/test_trajectory_parity.py, re-used here with real-scene
batches); our side runs the production CLI train driver. CPU-only: run
with JAX_PLATFORMS=cpu so the TPU stays free.

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tests \
        JAX_PLATFORMS=cpu python scripts/reference_anchor.py \
        [--iters 4000] [--out /tmp/ref_anchor]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

# shared scaled-down live protocol ------------------------------------------
D, W_NET, K = 4, 64, 3
NS, NI = 32, 32
N_RAND = 128
LRATE = 5e-4
EPS = 0.01                      # epsilon_for_numerical_normal default
BETA_PRIOR_ALBEDO, BETA_IRR_REG = 1.0, 0.1


def phase_bounds(iters):
    # live: approx from 10k/120k, priors+freeze from 100k/120k
    return iters // 12, iters * 5 // 6


def decay_steps(iters):
    # live: decay_steps=500k over 120k iters => lr falls to 0.1^0.24;
    # same relative decay here.  Returned in units of steps.
    return max(1, round(iters * 500_000 / 120_000 / 1000)) * 1000


def build_scene(root):
    if not os.path.exists(os.path.join(root, "transforms_train.json")):
        from analytic_scene import make_analytic_scene

        make_analytic_scene(root, h=64, w=64, n_train=10, n_test=3)
    return root


def load_scenes(root):
    from ibl_nerf_tpu.data.dataset import load_scene

    train = load_scene("mitsuba", root, split="train",
                       coarse_radiance_number=K,
                       load_depth_range_from_file=True, load_priors=True,
                       prior_type="bell")
    test = load_scene("mitsuba", root, split="test",
                      coarse_radiance_number=K,
                      load_depth_range_from_file=True, load_albedo=True,
                      load_irradiance=True)
    return train, test


def precompute_rays(scene):
    """Full-image rays per train pose via our parity-tested ray gen."""
    import jax.numpy as jnp

    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    H, W = scene.height, scene.width
    Kmat = jnp.asarray(scene.focal_matrix())
    ro, rd = [], []
    for pose in np.asarray(scene.poses):
        o, d = get_rays_full_image(H, W, Kmat, jnp.asarray(pose[:3, :4]))
        ro.append(np.asarray(o))
        rd.append(np.asarray(d))
    return np.stack(ro), np.stack(rd)     # (N, H, W, 3) each


# --------------------------------------------------------------------------
# torch reference side
# --------------------------------------------------------------------------

def make_ref_models(seed):
    """The torch reference's model factory at the anchor config —
    exactly the draws run_reference trains from."""
    import torch

    if "torchvision" not in sys.modules:
        _tv = types.ModuleType("torchvision")
        _tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tv.transforms
    sys.path.insert(0, "/root/reference/src")

    from nerf_models.ibl_nerf import IBLNeRF

    torch.manual_seed(seed)
    mk = lambda: IBLNeRF(D=D, W=W_NET, input_ch=63, input_ch_views=27,
                         skips=[4], coarse_radiance_number=K,
                         is_color_independent_to_direction=False)
    return mk(), mk()


def dump_ref_init(seed, path):
    """Save the reference's INITIAL weights (same draws run_reference
    uses) as a .tar portable via utils/port.py — the same-init pair."""
    import torch

    coarse, fine = make_ref_models(seed)
    torch.save({"network_fn_state_dict": coarse.state_dict(),
                "network_fine_state_dict": fine.state_dict(),
                "global_step": 0}, path)
    print(f"wrote reference seed-{seed} init to {path}")


def run_reference(scene, iters, seed, log_every=200, stream_seed=None):
    """stream_seed decouples the batch/pixel stream from the init draw
    (seed) — same-init stream-variation studies. Default: seed (the
    original coupled behavior)."""
    import torch

    coarse, fine = make_ref_models(seed)  # also sets up /root/reference/src

    from nerf_models.ibl_nerf import run_network
    from nerf_models.ibl_nerf_renderer import render_rays as ref_render_rays
    from nerf_models.positional_embedder import get_embedder

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut

    embed_fn, _ = get_embedder(10, 0)
    embeddirs_fn, _ = get_embedder(4, 0)

    def query(inputs, viewdirs, network_fn):
        return run_network(inputs, viewdirs, network_fn, embed_fn=embed_fn,
                           embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    lut = np.asarray(load_brdf_lut()).astype(np.float32)
    lut_t = torch.tensor(lut).permute(2, 0, 1)

    groups = [{"params": list(coarse.parameters()), "name": "coarse",
               "lr": LRATE},
              {"params": list(fine.parameters()), "name": "fine",
               "lr": LRATE}]
    opt = torch.optim.Adam(groups, lr=LRATE, betas=(0.9, 0.999))
    dsteps = decay_steps(iters)
    mse = torch.nn.MSELoss()
    ign_approx, ign_prior = phase_bounds(iters)

    images = np.asarray(scene.images, np.float32)
    pyramid = np.asarray(scene.prefiltered_images, np.float32)
    prior_albedo = np.asarray(scene.prior_albedos, np.float32)
    ro_all, rd_all = precompute_rays(scene)
    H, W = scene.height, scene.width
    near, far = float(scene.near), float(scene.far)
    prior_mean = float(scene.prior_irradiance_mean)

    def render(rays_o, rays_d, approx, perturb=1.0):
        # train renders use stratified z-jitter like the live protocol
        # (configs perturb=1); eval renders pass perturb=0.
        b = rays_o.shape[0]
        viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        ray_batch = torch.tensor(np.concatenate(
            [rays_o, rays_d, np.full((b, 1), near, np.float32),
             np.full((b, 1), far, np.float32), viewdirs], -1))
        return ref_render_rays(
            ray_batch, network_fn=coarse, network_query_fn=query,
            N_samples=NS, N_importance=NI, network_fine=fine,
            perturb=perturb, raw_noise_std=0.0, approximate_radiance=approx,
            brdf_lut=lut_t, coarse_radiance_number=K,
            target_normal_map_for_radiance_calculation=(
                "normal_map_from_depth_gradient_epsilon"),
            epsilon=EPS, lut_coefficient="F", use_radiance_linear=False,
            gamma_correct=False, lindisp=False)

    def calc(result, key, target):
        loss = mse(result[key], target)
        if key + "0" in result:
            loss = loss + mse(result[key + "0"], target)
        return loss

    rng = np.random.default_rng(seed if stream_seed is None else stream_seed)
    t0 = time.time()
    for i in range(iters):
        img = int(rng.integers(0, images.shape[0]))
        u = rng.integers(0, W, N_RAND)
        v = rng.integers(0, H, N_RAND)
        approx = i >= ign_approx
        freeze = i >= ign_prior
        for net in (coarse, fine):
            net.freeze_roughness = freeze
            net.freeze_radiance = freeze

        result = render(ro_all[img, v, u], rd_all[img, v, u], approx)
        rgb_t = torch.tensor(images[img, v, u])
        total = calc(result, "radiance_map", rgb_t)
        for k in range(K):
            total = total + calc(result, f"radiance_map_{k + 1}",
                                 torch.tensor(pyramid[k, img, v, u]))
        if approx:
            total = total + calc(result, "color_map", rgb_t)
        if freeze:
            total = total + BETA_PRIOR_ALBEDO * calc(
                result, "albedo_map", torch.tensor(prior_albedo[img, v, u]))
            total = total + BETA_IRR_REG * mse(
                result["irradiance_map"],
                torch.full_like(result["irradiance_map"], prior_mean))

        opt.zero_grad(set_to_none=False)    # pinned torch-1.11 semantics
        total.backward()
        opt.step()
        for pg in opt.param_groups:          # set_lr AFTER step
            pg["lr"] = LRATE * (0.1 ** ((i + 1) / dsteps))
        if i % log_every == 0:
            print(f"  [ref] iter {i} loss {float(total):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    @torch.no_grad()
    def render_pose(pose_idx, test_scene, ro, rd):
        flat_o = ro.reshape(-1, 3)
        flat_d = rd.reshape(-1, 3)
        maps = {}
        for s in range(0, flat_o.shape[0], 1024):
            out = render(flat_o[s:s + 1024], flat_d[s:s + 1024], True,
                         perturb=0.0)
            for name in ("color_map", "radiance_map", "albedo_map",
                         "irradiance_map"):
                maps.setdefault(name, []).append(out[name].numpy())
        return {k: np.concatenate(v, 0).reshape(
            (test_scene.height, test_scene.width, -1))
            for k, v in maps.items()}

    return train_s, render_pose


def eval_reference(test_scene, render_pose):
    ro_all, rd_all = precompute_rays(test_scene)
    stacks = {}
    for p in range(test_scene.n_images):
        print(f"  [ref] rendering test view {p}", flush=True)
        maps = render_pose(p, test_scene, ro_all[p], rd_all[p])
        for k, v in maps.items():
            stacks.setdefault(k, []).append(v)
    return {k: np.stack(v) for k, v in stacks.items()}


# --------------------------------------------------------------------------
# our side (production CLI driver, same protocol)
# --------------------------------------------------------------------------

def run_ours(root, iters, seed, basedir, init_port=None):
    from ibl_nerf_tpu.cli.config import parse_with_includes
    from ibl_nerf_tpu.train.loop import train

    ign_approx, ign_prior = phase_bounds(iters)
    argv = [
        "--datadir", root, "--basedir", basedir, "--expname", "ours",
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
    if init_port:
        argv += ["--init_port_path", init_port]
    targs = parse_with_includes(argv)
    t0 = time.time()
    state = train(targs)
    return time.time() - t0, state, targs


def eval_ours(state, targs, test_scene):
    import jax.numpy as jnp

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.eval.render_path import render_path
    from ibl_nerf_tpu.train.loop import (
        field_config_from_args, render_config_from_args)

    fcfg = field_config_from_args(targs)
    rcfg = render_config_from_args(targs, fcfg).replace(
        approximate_radiance=True)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    return render_path(state.variables, consts, test_scene, rcfg,
                       render_factor=1)


# --------------------------------------------------------------------------

def score(results, test_scene, keymap):
    from ibl_nerf_tpu.eval.metrics import batch_metrics

    gt = {
        "image": np.asarray(test_scene.images),
        "radiance": np.asarray(test_scene.images),
        "albedo": np.asarray(test_scene.albedos),
        "irradiance": np.asarray(test_scene.irradiances),
    }
    table = {}
    for target, g in gt.items():
        key = keymap[target]
        if key not in results:
            continue
        p = np.asarray(results[key])
        if p.shape[-1] == 1 and g.ndim == 3:
            g = g[..., None]
        if p.shape[-1] != g.shape[-1]:
            g = np.broadcast_to(g[..., :1], p.shape)
        # PNG-protocol quantization (see kitchen_gate stage C): score on
        # the uint8 grid exactly as the reference's calculate_metrics
        # does on saved files.
        p = np.round(np.clip(p, 0.0, 1.0) * 255.0) / 255.0
        g = np.round(np.clip(np.asarray(g, np.float64), 0.0, 1.0)
                     * 255.0) / 255.0
        m = batch_metrics(p, np.asarray(g))
        table[target] = {k: round(float(m[k]), 4)
                         for k in ("psnr", "ssim", "mse")}
    return table


def main():
    ap = argparse.ArgumentParser("reference_anchor")
    ap.add_argument("--scene", default="/tmp/anchor_scene_64")
    ap.add_argument("--out", default="/tmp/ref_anchor")
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_ref", action="store_true")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--ours_init_port", default=None, metavar="TAR",
                    help="train ours from this torch init .tar "
                         "(same-init pair; see --dump_ref_init)")
    ap.add_argument("--dump_ref_init", default=None, metavar="TAR",
                    help="only save the torch reference's seed init "
                         "as a portable .tar, then exit")
    ap.add_argument("--ref_stream_seed", type=int, default=None,
                    help="torch side: batch-stream seed decoupled from "
                         "the init seed (same-init stream variation)")
    args = ap.parse_args()

    if args.dump_ref_init:
        dump_ref_init(args.seed, args.dump_ref_init)
        return

    root = build_scene(args.scene)
    train_scene, test_scene = load_scenes(root)
    os.makedirs(args.out, exist_ok=True)
    report = {"iters": args.iters, "seed": args.seed}
    if args.ours_init_port:
        report["ours_init_port"] = args.ours_init_port

    if not args.skip_ours:
        print(f"== ours: {args.iters} iters (production CLI driver) ==")
        ours_s, state, targs = run_ours(root, args.iters, args.seed,
                                        args.out,
                                        init_port=args.ours_init_port)
        results = eval_ours(state, targs, test_scene)
        np.savez(os.path.join(args.out, "ours_buffers.npz"),
                 **{k: np.asarray(v) for k, v in results.items()})
        report["ours"] = {
            "train_s": round(ours_s, 1),
            "metrics": score(results, test_scene,
                             {"image": "rgb", "radiance": "radiance",
                              "albedo": "albedo",
                              "irradiance": "irradiance"})}
        print(json.dumps(report["ours"], indent=1))

    if not args.skip_ref:
        print(f"== torch reference: {args.iters} iters ==")
        if args.ref_stream_seed is not None:
            report["ref_stream_seed"] = args.ref_stream_seed
        ref_s, render_pose = run_reference(train_scene, args.iters,
                                           args.seed,
                                           stream_seed=args.ref_stream_seed)
        results = eval_reference(test_scene, render_pose)
        np.savez(os.path.join(args.out, "reference_buffers.npz"),
                 **{k: np.asarray(v) for k, v in results.items()})
        report["reference"] = {
            "train_s": round(ref_s, 1),
            "metrics": score(results, test_scene,
                             {"image": "color_map",
                              "radiance": "radiance_map",
                              "albedo": "albedo_map",
                              "irradiance": "irradiance_map"})}
        print(json.dumps(report["reference"], indent=1))

    out = os.path.join(args.out, "reference_anchor.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")

    if "ours" in report and "reference" in report:
        print("| target | ref PSNR | ours PSNR | ref SSIM | ours SSIM |")
        print("|---|---|---|---|---|")
        for t in ("image", "radiance", "albedo", "irradiance"):
            r = report["reference"]["metrics"].get(t)
            o = report["ours"]["metrics"].get(t)
            if r and o:
                print(f"| {t} | {r['psnr']:.2f} | {o['psnr']:.2f} | "
                      f"{r['ssim']:.4f} | {o['ssim']:.4f} |")


if __name__ == "__main__":
    main()
