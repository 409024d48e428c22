"""The one-command Kitchen benchmark gate.

Runs, in order, everything BASELINE.md's headline gate needs the day the
real Kitchen dataset (and optionally a trained reference checkpoint)
lands in this environment:

  A. (--ref_ckpt) weight-port the torch .tar and assert buffer + grad
     allclose of our renderer vs the imported PyTorch reference renderer
     on rays of the first test pose;
  B. the verbatim 120k-iteration live training protocol
     (configs/IBL-NeRF/kitchen + common.txt semantics: N_iter=120000,
     N_rand=512, 64+128 samples, K=3, priors until 100k,
     freeze_roughness, lrate_decay 500, approximated radiance from 10k);
  C. testset render + evaluation/calculate_metrics-protocol PSNR/SSIM/MSE
     over {image, albedo, roughness, irradiance} printed as a table.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/kitchen_gate.py \
        <datadir> [--ref_ckpt ckpt.tar] [--iters 120000] \
        [--basedir /tmp/kitchen_gate] [--compute_dtype float32] [--smoke]

--smoke: end-to-end rehearsal on the analytic synthetic stand-in scene
(created on the fly if <datadir> lacks transforms_train.json): tiny
network + 200 iters, same stages, minutes on CPU. This is how the gate
stays verified while the real data is unavailable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# stage A compares against the f32 torch reference — highest matmul
# precision keeps the ε-normal/reflected chain from diverging in the
# low-precision default (same setting as tests/conftest.py).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np


def stage_a_parity(datadir: str, ref_ckpt: str, args_ns) -> bool:
    """Weight-port + buffer/grad allclose vs the torch reference.

    Compared in FLOAT64 on both sides: at the live PE frequencies (2^9 x
    scene coordinates), f32 rounding differences between two correct
    implementations are chaotically amplified through the ε-normal +
    reflected march (~1e-1 on a random field), which would force a
    tolerance loose enough to hide real bugs. At f64 the gate is tight:
    any disagreement is semantic.
    """
    import types

    import torch

    if "torchvision" not in sys.modules:
        _tv = types.ModuleType("torchvision")
        _tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tv.transforms
    sys.path.insert(0, "/root/reference/src")

    import jax

    jax.config.update("jax_enable_x64", True)
    torch.set_default_dtype(torch.float64)
    import jax.numpy as jnp

    from nerf_models.ibl_nerf import IBLNeRF, run_network
    from nerf_models.ibl_nerf_renderer import render_rays as ref_render_rays
    from nerf_models.positional_embedder import get_embedder

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.models.field import FieldConfig
    from ibl_nerf_tpu.render import RenderConfig, make_ray_batch, render_rays
    from ibl_nerf_tpu.utils.port import (
        field_params_from_torch_state, load_reference_checkpoint)
    from ibl_nerf_tpu.data.dataset import load_scene
    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    kc, depth = args_ns.coarse_radiance_number, args_ns.netdepth
    ckpt = torch.load(ref_ckpt, map_location="cpu")

    # torch side (f64)
    width = ckpt["network_fn_state_dict"]["sigma_linear.weight"].shape[1]
    mk = lambda: IBLNeRF(D=depth, W=width, input_ch=63, input_ch_views=27,
                         skips=[4], coarse_radiance_number=kc,
                         is_color_independent_to_direction=False).double()
    t_coarse, t_fine = mk(), mk()
    t_coarse.load_state_dict(ckpt["network_fn_state_dict"])
    t_fine.load_state_dict(ckpt["network_fine_state_dict"])

    embed_fn, _ = get_embedder(10, 0)
    embeddirs_fn, _ = get_embedder(4, 0)

    def query(inputs, viewdirs, network_fn):
        return run_network(inputs, viewdirs, network_fn, embed_fn=embed_fn,
                           embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    # jax side (ported weights, widened to f64)
    coarse, fine, step, _ = load_reference_checkpoint(ref_ckpt, kc, depth)
    to64 = lambda t: jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), t)
    variables = {"coarse": to64(coarse), "fine": to64(fine or coarse)}
    lut = np.asarray(load_brdf_lut()).astype(np.float64)
    consts = {"brdf_lut": jnp.asarray(lut)}

    # rays: a 64-ray strip through the first test pose's center row
    scene = load_scene(args_ns.dataset_type, datadir,
                       coarse_radiance_number=kc, skip=max(
                           args_ns.testskip, 1), split="test")
    H, W, focal = scene.height, scene.width, scene.focal
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    ro, rd = get_rays_full_image(
        H, W, jnp.asarray(K, jnp.float64),
        jnp.asarray(np.asarray(scene.poses[0])[:3, :4], jnp.float64))
    sel = slice(H // 2 * W + W // 2 - 32, H // 2 * W + W // 2 + 32)
    rays_o = np.asarray(ro.reshape(-1, 3), np.float64)[sel]
    rays_d = np.asarray(rd.reshape(-1, 3), np.float64)[sel]
    near, far = float(scene.near), float(scene.far)

    # ours
    fcfg = FieldConfig(depth=depth, width=width, coarse_radiance_number=kc)
    rcfg = RenderConfig(
        field=fcfg, n_samples=16, n_importance=8, perturb=False,
        approximate_radiance=True,
        normal_type="normal_map_from_depth_gradient_epsilon",
        epsilon=0.02, compute_dtype="float64")
    batch = make_ray_batch(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           near, far)
    ours = jax.jit(lambda k, b: render_rays(k, variables, consts, b, rcfg)
                   )(jax.random.key(0), batch)

    # theirs
    b = rays_o.shape[0]
    ray_batch = np.concatenate(
        [rays_o, rays_d, np.full((b, 1), near, np.float64),
         np.full((b, 1), far, np.float64),
         rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)], -1)
    lut_t = torch.tensor(lut).permute(2, 0, 1)
    theirs = ref_render_rays(
        torch.tensor(ray_batch), network_fn=t_coarse, network_query_fn=query,
        N_samples=16, N_importance=8, network_fine=t_fine, perturb=0.0,
        raw_noise_std=0.0, approximate_radiance=True, brdf_lut=lut_t,
        coarse_radiance_number=kc,
        target_normal_map_for_radiance_calculation=(
            "normal_map_from_depth_gradient_epsilon"),
        epsilon=0.02, lut_coefficient="F", use_radiance_linear=False,
        gamma_correct=False)

    buffers = ("radiance_map", "color_map", "albedo_map", "roughness_map",
               "irradiance_map", "depth_map", "disp_map", "acc_map",
               "specular_map", "diffuse_map", "reflected_radiance_map",
               "prefiltered_reflected_map")
    tol = 1e-6  # f64 both sides: any bigger disagreement is semantic
    ok = True
    for name in buffers:
        if name not in theirs or name not in ours:
            continue
        ref_v = theirs[name].detach().numpy()
        got = np.asarray(ours[name]).reshape(ref_v.shape)
        diff = float(np.max(np.abs(got - ref_v)))
        status = "OK " if diff <= tol else "FAIL"
        ok &= diff <= tol
        print(f"  [A] {status} {name:32s} max|Δ| {diff:.2e}")

    # grad gate: d/dparams of mean(color_map + radiance_map) must match
    tgt = torch.zeros(b, 3)
    loss_t = (torch.mean((theirs["radiance_map"] - tgt) ** 2)
              + torch.mean((theirs["color_map"] - tgt) ** 2))
    loss_t.backward()
    g_sd = {k: (p.grad if p.grad is not None else torch.zeros_like(p)).numpy()
            for k, p in t_fine.named_parameters()}
    g_ref = field_params_from_torch_state(g_sd, kc, depth)

    def loss_j(vs):
        out = render_rays(jax.random.key(0), vs, consts, batch, rcfg)
        z = jnp.zeros((b, 3))
        return (jnp.mean((out["radiance_map"] - z) ** 2)
                + jnp.mean((out["color_map"] - z) ** 2))

    g_ours = jax.grad(loss_j)(variables)["fine"]
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten(g_ours)
    gmax = max(float(np.max(np.abs(np.asarray(a) - np.asarray(bb))))
               for a, bb in zip(flat_got, flat_ref))
    gscale = max(float(np.max(np.abs(np.asarray(a)))) for a in flat_ref)
    grad_ok = gmax <= max(1e-8 * gscale, 1e-10)
    ok &= grad_ok
    print(f"  [A] {'OK ' if grad_ok else 'FAIL'} fine-network grads        "
          f"max|Δ| {gmax:.2e} (scale {gscale:.2e})")
    print(f"  [A] ported reference step: {step}")
    # restore f32 defaults for the training stages
    jax.config.update("jax_enable_x64", False)
    torch.set_default_dtype(torch.float32)
    return ok


def main():
    ap = argparse.ArgumentParser("kitchen_gate")
    ap.add_argument("datadir")
    ap.add_argument("--ref_ckpt", default=None,
                    help="reference .tar for the weight-port allclose gate")
    ap.add_argument("--iters", type=int, default=120000)
    ap.add_argument("--basedir", default="/tmp/kitchen_gate")
    ap.add_argument("--expname", default="kitchen")
    ap.add_argument("--dataset_type", default="mitsuba")
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--coarse_radiance_number", type=int, default=3)
    ap.add_argument("--netdepth", type=int, default=8)
    ap.add_argument("--testskip", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0,
                    help="init + per-iter PRNG seed (multi-seed studies)")
    ap.add_argument("--normal_type",
                    default="normal_map_from_depth_gradient_epsilon",
                    help="calculating_normal_type for training AND the "
                         "stage-C eval render — eps (reference default) "
                         "or normal_map_from_sigma_gradient_surface "
                         "(the fast preset, configs/fast_sgs.txt)")
    ap.add_argument("--use_pallas_train", action="store_true",
                    help="train with the fused fwd+bwd Pallas kernel "
                         "(the round-5 bench default mode)")
    ap.add_argument("--smoke", action="store_true",
                    help="analytic stand-in scene, tiny net, 200 iters")
    args = ap.parse_args()

    datadir = args.datadir
    if args.smoke and not os.path.exists(
            os.path.join(datadir, "transforms_train.json")):
        from analytic_scene import make_analytic_scene

        make_analytic_scene(datadir)
        print(f"[smoke] analytic stand-in scene created at {datadir}")

    # ---- stage A: weight-port parity gate -------------------------------
    if args.ref_ckpt:
        print("== stage A: weight-port + allclose vs torch reference ==")
        if not stage_a_parity(datadir, args.ref_ckpt, args):
            print("stage A FAILED — aborting before training")
            sys.exit(1)
    else:
        print("== stage A skipped (no --ref_ckpt) ==")

    # ---- stage B: verbatim 120k live protocol ----------------------------
    from ibl_nerf_tpu.cli.config import parse_with_includes
    from ibl_nerf_tpu.train.loop import train

    iters = 200 if args.smoke else args.iters
    print(f"== stage B: live protocol training ({iters} iters) ==")
    # configs/IBL-NeRF/kitchen + common.txt, verbatim semantics
    train_argv = [
        "--datadir", datadir,
        "--basedir", args.basedir,
        "--expname", args.expname,
        "--dataset_type", args.dataset_type,
        "--no_batching",
        "--load_priors", "--prior_type", "bell",
        "--freeze_roughness",
        "--load_depth_range_from_file",
        "--beta_prior_albedo", "1",
        "--beta_irradiance_reg", "0.1",
        "--correct_depth_for_prefiltered_radiance_infer",
        "--use_viewdirs",
        "--lrate_decay", "500",
        "--N_samples", "64", "--N_importance", "128", "--N_rand", "512",
        "--precrop_iters", "0",
        "--beta_render", "1", "--beta_albedo_render", "0.5",
        "--beta_radiance_render", "1",
        "--beta_inferred_normal", "0.5", "--beta_inferred_depth", "20",
        "--N_iter_ignore_normal", "0",
        "--coarse_radiance_number", str(args.coarse_radiance_number),
        "--calculating_normal_type", args.normal_type,
        "--N_iter", str(iters),
        "--N_iter_ignore_prior", str(100000 if not args.smoke
                                     else int(iters * 0.8)),
        "--N_iter_ignore_approximated_radiance",
        str(10000 if not args.smoke else iters // 3),
        "--testskip", str(args.testskip if not args.smoke else 1),
        "--i_testset", str(5000 if not args.smoke else 1000000),
        "--i_weights", str(10000 if not args.smoke else 1000000),
        "--compute_dtype", args.compute_dtype,
        "--seed", str(args.seed),
    ]
    if args.use_pallas_train:
        train_argv += ["--use_pallas_train"]
    if args.smoke:
        train_argv += ["--netdepth", "2", "--netwidth", "32",
                       "--N_samples", "16", "--N_importance", "16",
                       "--N_rand", "128"]
    targs = parse_with_includes(train_argv)
    t0 = time.time()
    state = train(targs)
    train_s = time.time() - t0
    print(f"[B] trained {iters} iters in {train_s:.0f}s "
          f"({1000 * train_s / iters:.1f} ms/step)")

    # ---- stage C: testset render + calculate_metrics ---------------------
    print("== stage C: testset render + PSNR/SSIM/MSE table ==")
    import jax.numpy as jnp

    from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
    from ibl_nerf_tpu.data.dataset import load_scene
    from ibl_nerf_tpu.eval.metrics import batch_metrics
    from ibl_nerf_tpu.eval.render_path import render_path
    from ibl_nerf_tpu.train.loop import (
        field_config_from_args, render_config_from_args)

    scene_val = load_scene(
        args.dataset_type, datadir,
        coarse_radiance_number=args.coarse_radiance_number, split="test",
        skip=args.testskip if not args.smoke else 1,
        load_depth_range_from_file=True, load_normal=True, load_albedo=True,
        load_irradiance=True)
    fcfg = field_config_from_args(targs)
    rcfg = render_config_from_args(targs, fcfg).replace(
        approximate_radiance=True)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    savedir = os.path.join(args.basedir, args.expname, "gate_testset")
    results = render_path(state.variables, consts, scene_val, rcfg,
                          savedir=savedir, render_factor=1)

    gt = {
        "image": scene_val.images,
        "radiance": scene_val.images,
        "albedo": getattr(scene_val, "albedos", None),
        "irradiance": getattr(scene_val, "irradiances", None),
    }
    pred = {"image": "rgb", "radiance": "radiance", "albedo": "albedo",
            "irradiance": "irradiance"}
    table = {}
    for target, g in gt.items():
        key = pred[target]
        if g is None or key not in results:
            continue
        p = results[key]
        if p.ndim == 4 and g.ndim == 3:
            g = g[..., None]
        if p.shape[-1] != g.shape[-1]:
            g = np.broadcast_to(g[..., :1], p.shape)
        # reference protocol scores SAVED PNGs (calculate_metrics.py:
        # 10-33): quantize both sides to the uint8 grid. Raw unclipped
        # float tails (e.g. specular highlights >1) barely move PSNR
        # but destroy local-variance SSIM.
        p = np.round(np.clip(p, 0.0, 1.0) * 255.0) / 255.0
        g = np.round(np.clip(np.asarray(g, np.float64), 0.0, 1.0)
                     * 255.0) / 255.0
        m = batch_metrics(p, np.asarray(g))
        table[target] = {k: float(m[k]) for k in ("psnr", "ssim", "mse")}
        m = table[target]
        print(f"  [C] {target:12s} PSNR {m['psnr']:6.2f}  "
              f"SSIM {m['ssim']:.4f}  MSE {m['mse']:.5f}")

    out = {"iters": iters, "train_s": round(train_s, 1),
           "metrics": {k: {kk: round(vv, 4) for kk, vv in v.items()}
                       for k, v in table.items()}}
    out_path = os.path.join(args.basedir, args.expname, "kitchen_gate.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[C] wrote {out_path}")


if __name__ == "__main__":
    main()
