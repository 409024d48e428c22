"""Result-comparison figure tooling.

Parity: /root/reference/src/evaluation/ visualizers —
result_comparison_visualizer.py (grids of buffers across experiments ->
PDF), image_cropper.py (zoom crops), prefiltered_visualizer.py
(side-by-side mip levels).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _imread01(path):
    img = cv2.imread(path)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def comparison_grid(result_dirs: dict[str, str], buffers: list[str],
                    image_idx: int, out_path: str, gt_dir: str | None = None):
    """Rows = experiments (+gt), cols = buffers, for one test image."""
    rows = list(result_dirs.items())
    n_r, n_c = len(rows) + (1 if gt_dir else 0), len(buffers)
    fig, axes = plt.subplots(n_r, n_c, figsize=(3 * n_c, 3 * n_r),
                             squeeze=False)
    for ci, buf in enumerate(buffers):
        if gt_dir:
            gt = _imread01(os.path.join(gt_dir, f"{image_idx + 1}.png"))
            ax = axes[0][ci]
            if buf == "rgb" and gt is not None:
                ax.imshow(gt)
            ax.set_axis_off()
            if ci == 0:
                ax.set_title("ground truth", loc="left")
        for ri, (name, d) in enumerate(rows):
            ax = axes[ri + (1 if gt_dir else 0)][ci]
            img = _imread01(os.path.join(d, f"{buf}_{image_idx:03d}.png"))
            if img is not None:
                ax.imshow(img)
            ax.set_axis_off()
            if ri == 0 and not gt_dir:
                ax.set_title(buf)
            if ci == 0:
                ax.text(-0.05, 0.5, name, transform=ax.transAxes,
                        rotation=90, va="center", ha="right")
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def crop_zoom(image_path: str, box: tuple[int, int, int, int],
              out_path: str, scale: int = 4):
    """Crop (x, y, w, h) and upscale for figure insets
    (parity image_cropper.py)."""
    img = cv2.imread(image_path)
    x, y, w, h = box
    crop = img[y:y + h, x:x + w]
    crop = cv2.resize(crop, (w * scale, h * scale),
                      interpolation=cv2.INTER_NEAREST)
    cv2.imwrite(out_path, crop)
    return out_path


def prefiltered_strip(result_dir: str, image_idx: int, levels: int,
                      out_path: str):
    """Side-by-side radiance mip levels (parity prefiltered_visualizer)."""
    imgs = []
    base = _imread01(os.path.join(result_dir, f"radiance_{image_idx:03d}.png"))
    if base is not None:
        imgs.append(("radiance", base))
    for k in range(1, levels + 1):
        img = _imread01(os.path.join(result_dir,
                                     f"radiance_{k}_{image_idx:03d}.png"))
        if img is not None:
            imgs.append((f"level {k}", img))
    fig, axes = plt.subplots(1, max(len(imgs), 1),
                             figsize=(3 * max(len(imgs), 1), 3),
                             squeeze=False)
    for ax, (name, img) in zip(axes[0], imgs):
        ax.imshow(img)
        ax.set_title(name)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path
