"""Run / aggregate the 120k-protocol dtype x seed study.

The verbatim reference training protocol (kitchen_gate.py stage B/C:
N_iter=120000, N_rand=512, 64+128 samples, K=3, priors from 100k with
freeze_roughness, lrate_decay 500) on the 128x128 analytic scene, per
compute dtype and seed. One TPU process at a time (see CLAUDE.md).

    # launch (sequential, hours):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/protocol_study.py \
        --run --dtypes bf16_grad float32 --seeds 0 1

    # aggregate what's finished into a markdown table:
    python scripts/protocol_study.py --basedir /tmp/p120k
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


NORMAL_TYPES = {
    "eps": "normal_map_from_depth_gradient_epsilon",
    "sgs": "normal_map_from_sigma_gradient_surface",
}


def run_one(scene, basedir, dtype, seed, iters, normals="eps",
            pallas_train=False):
    # eps keeps the round-3/4 expname so finished runs are reused
    tag = "" if normals == "eps" else f"_{normals}"
    if pallas_train:
        tag += "_ptrain"
    exp = f"p120k_{dtype}{tag}_s{seed}"
    out = os.path.join(basedir, exp, "kitchen_gate.json")
    if os.path.exists(out):
        print(f"[skip] {exp}: {out} exists")
        return
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                        "kitchen_gate.py"),
           scene, "--iters", str(iters), "--basedir", basedir,
           "--expname", exp, "--compute_dtype", dtype,
           "--normal_type", NORMAL_TYPES[normals],
           "--seed", str(seed), "--testskip", "1"]
    if pallas_train:
        cmd += ["--use_pallas_train"]
    print(f"[run] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True)


def png_metrics(run_dir, scene, iters=120000, n_images=3):
    """Score the SAVED testset PNGs against the scene gt — the actual
    reference protocol (evaluation/calculate_metrics.py:10-33 reads
    files, never raw buffers). Raw unclipped float tails barely move
    PSNR but destroy local-variance SSIM, so this is the number to
    publish."""
    import cv2
    import numpy as np

    from ibl_nerf_tpu.eval.metrics import batch_metrics

    d = os.path.join(run_dir, f"testset_{iters:06d}")
    if not os.path.isdir(d):
        d = os.path.join(run_dir, f"testset_{iters}")
    if not os.path.isdir(d):
        return None

    def load(p):
        a = cv2.imread(p)
        return cv2.cvtColor(a, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.

    pairs = {"image": ("rgb", "{i}.png"),
             "radiance": ("radiance", "{i}.png"),
             "albedo": ("albedo", "{i}_albedo.png"),
             "irradiance": ("irradiance", "{i}_irradiance.png")}
    out = {}
    for target, (pred_name, gt_fmt) in pairs.items():
        try:
            pred = np.stack([load(f"{d}/{pred_name}_{i:03d}.png")
                             for i in range(n_images)])
            gt = np.stack([load(os.path.join(scene, "test",
                                             gt_fmt.format(i=i + 1)))
                           for i in range(n_images)])
        except Exception:
            continue
        m = batch_metrics(pred, gt)
        out[target] = {k: round(float(m[k]), 4)
                       for k in ("psnr", "ssim", "mse")}
    return out


def aggregate(basedir, rescore=False, scene="/tmp/analytic_scene_128"):
    rows = []
    for path in sorted(glob.glob(os.path.join(basedir, "p120k_*",
                                              "kitchen_gate.json"))):
        exp = os.path.basename(os.path.dirname(path))
        body = exp[len("p120k_"):]     # "bf16_grad_s0", "bf16_grad_sgs_s0"
        dtype, seed = body.rsplit("_", 1)   # dtype is the full arm label
        with open(path) as f:
            d = json.load(f)
        m = png_metrics(os.path.dirname(path), scene, d["iters"])
        if m and rescore and m != d["metrics"]:
            # rewrite the artifact in place so no json carries pre-fix
            # raw-float scores (VERDICT r3 weak #3): the PNG-grid
            # protocol is the only valid scoring.
            d["metrics"] = m
            d["rescored_on_png_grid"] = True
            with open(path, "w") as f:
                json.dump(d, f, indent=1)
            print(f"[rescore] rewrote {path}")
        m = m or d["metrics"]
        rows.append({
            "dtype": dtype, "seed": seed.lstrip("s"),
            "train_min": d["train_s"] / 60.0,
            **{f"{t}_psnr": m[t]["psnr"] for t in m},
            **{f"{t}_ssim": m[t]["ssim"] for t in m},
        })
    if not rows:
        print("no kitchen_gate.json results found under", basedir)
        return rows
    cols = ["dtype", "seed", "train_min", "radiance_psnr", "image_psnr",
            "albedo_psnr", "irradiance_psnr", "image_ssim"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        vals = [f"{r.get(c, float('nan')):.2f}"
                if isinstance(r.get(c), float) else str(r.get(c, "-"))
                for c in cols]
        print("| " + " | ".join(vals) + " |")
    return rows


def main():
    ap = argparse.ArgumentParser("protocol_study")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--scene", default="/tmp/analytic_scene_128")
    ap.add_argument("--basedir", default="/tmp/p120k")
    ap.add_argument("--iters", type=int, default=120000)
    ap.add_argument("--dtypes", nargs="+", default=["bf16_grad", "float32"])
    ap.add_argument("--normals", nargs="+", default=["eps"],
                    choices=sorted(NORMAL_TYPES))
    ap.add_argument("--seeds", nargs="+", type=int, default=[0])
    ap.add_argument("--pallas_train", action="store_true",
                    help="train with the fused fwd+bwd Pallas kernel "
                         "(adds a _ptrain tag to the expname)")
    ap.add_argument("--rescore", action="store_true",
                    help="rewrite each kitchen_gate.json with PNG-grid "
                         "scores (purges pre-fix raw-float artifacts)")
    args = ap.parse_args()

    if args.run:
        if not os.path.exists(os.path.join(args.scene,
                                           "transforms_train.json")):
            from analytic_scene import make_analytic_scene

            make_analytic_scene(args.scene, h=128, w=128, n_train=16,
                                n_test=3)
        for seed in args.seeds:
            for dtype in args.dtypes:
                for normals in args.normals:
                    run_one(args.scene, args.basedir, dtype, seed,
                            args.iters, normals=normals,
                            pallas_train=args.pallas_train)
    aggregate(args.basedir, rescore=args.rescore, scene=args.scene)


if __name__ == "__main__":
    main()
