"""Result-comparison figure tooling.

Parity: /root/reference/src/evaluation/ visualizers —
result_comparison_visualizer.py (experiment x buffer grids -> per-scene
PDF + merged multi-scene PDF), image_cropper.py (zoom crops),
prefiltered_visualizer.py (side-by-side mip levels),
gaussian_ggx_compare.py (screen-space GGX filter-kernel figure).

The merged report uses matplotlib PdfPages (one page per scene) instead
of the reference's PyPDF2 file-level merge — same artifact, no extra
dependency.
"""

from __future__ import annotations

import os
import re

import cv2
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.backends.backend_pdf import PdfPages  # noqa: E402


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


DEFAULT_COMPARE_TARGETS = ("disp", "albedo", "irradiance", "roughness",
                           "diffuse", "specular", "rgb", "radiance")


def _natsorted(names):
    key = lambda s: [int(t) if t.isdigit() else t
                     for t in re.split(r"(\d+)", s)]
    return sorted(names, key=key)


def visualize_comparison(basedir: str, scene_name: str, index: int = 1,
                         exp_names: list[str] | None = None,
                         compare_targets=None, target_iter: int = -1,
                         gt_dir: str | None = None,
                         out_dir: str | None = None,
                         fig=None):
    """Experiment x buffer grid for one test image of one scene.

    Layout parity: result_comparison_visualizer.visualize_comparison
    (result_comparison_visualizer.py:72-142) — rows = experiments
    ('gt' row first when gt_dir given), cols = compare_targets, buffer
    names as top xlabels, experiment names as ylabels, suptitle
    "Scene: ..., Index: ...", missing images leave an empty cell.

    Images are read from
    `{basedir}/{scene}/{exp}/testset_{iter:06d}/{target}_{idx:03d}.png`
    (target_iter=-1 -> newest testset_* dir, vs the reference's
    hardcoded testset_099999). Returns the written PDF path (per-scene
    PDF in out_dir), or draws onto `fig` when given (used by
    comparison_report for the merged multi-page PDF).
    """
    if compare_targets is None:
        compare_targets = list(DEFAULT_COMPARE_TARGETS)
    scene_dir = os.path.join(basedir, scene_name)
    if exp_names is None:
        exp_names = _natsorted(
            [d for d in os.listdir(scene_dir)
             if os.path.isdir(os.path.join(scene_dir, d))])
    rows = (["gt"] if gt_dir else []) + list(exp_names)

    def testset_dir(exp):
        d = os.path.join(scene_dir, exp)
        if target_iter >= 0:
            return os.path.join(d, f"testset_{target_iter:06d}")
        cands = _natsorted([s for s in os.listdir(d)
                            if s.startswith("testset_")]) if os.path.isdir(d) else []
        return os.path.join(d, cands[-1]) if cands else d

    n_row, n_col = len(rows), len(compare_targets)
    own_fig = fig is None
    if own_fig:
        fig = plt.figure(figsize=(2 * n_col + 2, 2 * n_row))
    fig_index = 1
    for i_exp, exp in enumerate(rows):
        for i_target, target in enumerate(compare_targets):
            if exp == "gt":
                suffix = "" if target == "rgb" else f"_{target}"
                img = _imread01(os.path.join(
                    gt_dir, f"{index + 1}{suffix}.png"))
            else:
                img = _imread01(os.path.join(
                    testset_dir(exp), f"{target}_{index:03d}.png"))
            ax = fig.add_subplot(n_row, n_col, fig_index)
            ax.set_xticks([])
            ax.set_yticks([])
            if i_exp == 0:
                ax.set_xlabel(target)
                ax.xaxis.set_label_position("top")
            if i_target == 0:
                ax.set_ylabel(exp)
            if img is not None:
                ax.imshow(img)
            fig_index += 1
    fig.suptitle(f"Scene: {scene_name}, Index: {index}")
    fig.tight_layout()
    if not own_fig:
        return None
    out_dir = out_dir or basedir
    os.makedirs(out_dir, exist_ok=True)
    pdf_name = os.path.join(out_dir, f"{scene_name}.pdf")
    fig.savefig(pdf_name)
    plt.close(fig)
    return pdf_name


def comparison_report(basedir: str, scene_names: list[str], out_pdf: str,
                      index: int = 1, **kw):
    """Multi-scene merged comparison PDF: one visualize_comparison page
    per scene (parity: the PdfFileMerger loop,
    result_comparison_visualizer.py:182-193)."""
    os.makedirs(os.path.dirname(out_pdf) or ".", exist_ok=True)
    with PdfPages(out_pdf) as pdf:
        for scene in scene_names:
            fig = plt.figure(figsize=(18, 12))
            visualize_comparison(basedir, scene, index=index, fig=fig, **kw)
            pdf.savefig(fig)
            plt.close(fig)
    return out_pdf


def ggx_screen_kernel(n: int = 21, roughness: float = 0.2,
                      epsilon: float = 0.01, focal_length: float = 1.0):
    """Screen-space GGX filtering kernel cross-section.

    Parity: gaussian_ggx_compare.visualize_kernel
    (gaussian_ggx_compare.py:179-203): pixel offsets around a head-on
    surface point, half-vector GGX NDF D(h)·(h·n) converted to a
    solid-angle pdf /(4 h·i) then to a pixel-area pdf ·(i·n / d²),
    normalized. Returns (offsets (n,), kernel (n,)).
    """
    o = np.array([0.0, 0.0, 1.0])
    nrm = np.array([0.0, 0.0, 1.0])
    mid = n // 2
    nx = np.linspace(-1, 1, n) * epsilon * n
    xv, yv = np.meshgrid(nx, nx)
    i = np.stack([xv, yv, np.ones_like(xv) * focal_length], axis=-1)
    dist_sq = np.sum(i * i, axis=-1)
    i = i / np.linalg.norm(i, axis=-1, keepdims=True)
    h = i + o
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    h_dot_n = np.sum(h * nrm, axis=-1)
    h_dot_i = np.sum(h * i, axis=-1)
    i_dot_n = np.sum(i * nrm, axis=-1)
    alpha = roughness * roughness
    a2 = alpha * alpha
    t = 1.0 + (a2 - 1.0) * h_dot_n * h_dot_n
    d = a2 / (np.pi * t * t)
    pdf_area = d * h_dot_n / (4.0 * h_dot_i) * (i_dot_n / dist_sq)
    kernel = pdf_area / pdf_area.sum()
    return nx, kernel[mid]


def gaussian_kernel_1d(length: int = 101, size: float = 20.0,
                       sigma: float = 0.2):
    """Normalized 2-D gaussian kernel cross-section (parity:
    gaussian_ggx_compare.gkern, gaussian_ggx_compare.py:205-215)."""
    mid = length // 2
    ax = np.linspace(-(length - 1) / 2.0, (length - 1) / 2.0, length) / size
    g = np.exp(-0.5 * np.square(ax) / np.square(sigma))
    k = np.outer(g, g)
    k = k / k.sum()
    return ax, k[mid]


def ggx_gaussian_figure(out_path: str, n: int = 21,
                        roughnesses=tuple((i + 1) * 0.1 for i in range(10)),
                        with_gaussian: bool = True):
    """The GGX-vs-Gaussian screen-kernel comparison figure (parity:
    gaussian_ggx_compare.py's __main__ sweep): one GGX screen-kernel
    curve per roughness, optional matched gaussian overlays (dashed)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for r in roughnesses:
        nx, k = ggx_screen_kernel(n=n, roughness=r)
        ax.plot(nx, k, label=f"{r:.2f}")
        if with_gaussian:
            gx, gk = gaussian_kernel_1d(length=n, size=1.0 / (0.01 * n),
                                        sigma=r * r)
            ax.plot(gx, gk / gk.sum() * k.sum(), "--", alpha=0.4,
                    color=ax.lines[-1].get_color())
    ax.set_xlabel("pixel position")
    ax.set_yticks([])
    ax.legend(title="roughness", fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path)
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
