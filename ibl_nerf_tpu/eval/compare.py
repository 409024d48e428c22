"""Benchmark sweep tooling: metrics over scenes x experiments x targets.

Parity: /root/reference/src/evaluation/ —
 - calculate_metrics.py:10-81: per-image SSIM/PSNR/MSE of rendered
   outputs vs ground-truth test images;
 - error_calculator.py:12-139: whole-benchmark sweep over
   scenes x experiments x targets {image,diffuse,specular,albedo,
   roughness,irradiance} x {ssim,psnr,mse} -> pandas CSV;
 - time_calculator.py:9-52: time/step from train_info_step_time.json;
 - pprint_result.py:10-56: CSV -> LaTeX table rows.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np
import pandas as pd

from ibl_nerf_tpu.eval.metrics import batch_metrics

# render-output prefix per evaluation target (parity error_calculator)
TARGET_PREFIX = {
    "image": "rgb",
    "diffuse": "diffuse",
    "specular": "specular",
    "albedo": "albedo",
    "roughness": "roughness",
    "irradiance": "irradiance",
}
GT_SUFFIX = {
    "image": "",
    "diffuse": "_diffuse",
    "specular": "_specular",
    "albedo": "_albedo",
    "roughness": "_roughness",
    "irradiance": "_irradiance",
}


def _load_png01(path):
    img = cv2.imread(path)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def calculate_metrics(result_dir: str, gt_dir: str, n_images: int,
                      target: str = "image") -> dict:
    """Mean SSIM/PSNR/MSE of `{prefix}_{i:03d}.png` vs gt
    `test/{i+1}{suffix}.png` (parity calculate_metrics.py:10-33)."""
    preds, gts = [], []
    prefix = TARGET_PREFIX[target]
    suffix = GT_SUFFIX[target]
    for i in range(n_images):
        p = _load_png01(os.path.join(result_dir, f"{prefix}_{i:03d}.png"))
        g = _load_png01(os.path.join(gt_dir, f"{i + 1}{suffix}.png"))
        if p is None or g is None:
            continue
        if p.shape != g.shape:
            g = cv2.resize(g, (p.shape[1], p.shape[0]))
        preds.append(p)
        gts.append(g)
    if not preds:
        return {"ssim": float("nan"), "psnr": float("nan"),
                "mse": float("nan")}
    m = batch_metrics(np.stack(preds), np.stack(gts))
    return {k: m[k] for k in ("ssim", "psnr", "mse")}


def error_calculator(scenes: list[str], experiments: list[str],
                     results_root: str, data_root: str,
                     targets=("image", "albedo", "roughness", "irradiance"),
                     n_images: int = 100, out_csv: str | None = None):
    """Sweep scenes x experiments x targets into a tidy DataFrame."""
    rows = []
    for scene in scenes:
        for exp in experiments:
            rdir = os.path.join(results_root, scene, exp)
            gdir = os.path.join(data_root, scene, "test")
            for target in targets:
                m = calculate_metrics(rdir, gdir, n_images, target)
                rows.append({"scene": scene, "experiment": exp,
                             "target": target, **m})
    df = pd.DataFrame(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def time_calculator(logdirs: list[str], out_csv: str | None = None):
    """time/step table from each logdir's train_info_step_time.json
    (parity time_calculator.py:9-52)."""
    rows = []
    for d in logdirs:
        info_path = os.path.join(d, "train_info_step_time.json")
        if not os.path.exists(info_path):
            continue
        info = json.load(open(info_path))
        steps = max(info.get("global_step", 1), 1)
        rows.append({
            "logdir": d,
            "training_time": info.get("training_time", float("nan")),
            "global_step": steps,
            "time_per_step": info.get("training_time", float("nan")) / steps,
        })
    df = pd.DataFrame(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def pprint_latex(df: pd.DataFrame, metric: str = "psnr",
                 float_fmt: str = "%.3f") -> str:
    """Pivot (scene x experiment) for one metric into LaTeX table rows
    (parity pprint_result.py:10-56)."""
    pivot = df[df["target"] == "image"].pivot_table(
        index="experiment", columns="scene", values=metric)
    lines = []
    for exp, row in pivot.iterrows():
        cells = " & ".join(float_fmt % v for v in row.values)
        lines.append(f"{exp} & {cells} \\\\")
    return "\n".join(lines)
