"""Figure tooling (C30): experiment x buffer comparison grids, merged
multi-scene PDF report, GGX-vs-Gaussian kernel figure."""

import os

import cv2
import numpy as np
import pytest

from ibl_nerf_tpu.eval.visualize import (
    comparison_grid,
    comparison_report,
    gaussian_kernel_1d,
    ggx_gaussian_figure,
    ggx_screen_kernel,
    visualize_comparison,
)

TARGETS = ("rgb", "albedo", "disp")


@pytest.fixture
def result_tree(tmp_path):
    """Fake logs layout: {base}/{scene}/{exp}/testset_{it}/{buf}_{i}.png
    plus a gt dir {gt}/{i+1}[_{target}].png."""
    rng = np.random.default_rng(0)
    base = tmp_path / "logs"
    gt = tmp_path / "gt"
    gt.mkdir()
    for scene in ("sceneA", "sceneB"):
        for exp, it in (("ours", 99999), ("ours_gt_normal", 120000)):
            d = base / scene / exp / f"testset_{it:06d}"
            d.mkdir(parents=True)
            for t in TARGETS:
                for i in range(3):
                    img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
                    cv2.imwrite(str(d / f"{t}_{i:03d}.png"), img)
    for i in range(4):
        for t in TARGETS:
            suffix = "" if t == "rgb" else f"_{t}"
            img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
            cv2.imwrite(str(gt / f"{i + 1}{suffix}.png"), img)
    return str(base), str(gt)


def test_visualize_comparison_pdf(result_tree, tmp_path):
    base, gt = result_tree
    pdf = visualize_comparison(base, "sceneA", index=1,
                               compare_targets=list(TARGETS),
                               gt_dir=gt, out_dir=str(tmp_path / "figs"))
    assert pdf.endswith("sceneA.pdf") and os.path.getsize(pdf) > 1000


def test_visualize_comparison_latest_testset_autodiscovery(result_tree,
                                                           tmp_path):
    base, _ = result_tree
    # target_iter=-1 must pick testset_120000 over testset_099999
    pdf = visualize_comparison(base, "sceneA", index=0,
                               exp_names=["ours_gt_normal"],
                               compare_targets=["rgb"],
                               out_dir=str(tmp_path / "figs"))
    assert os.path.getsize(pdf) > 1000


def test_comparison_report_multiscene(result_tree, tmp_path):
    base, gt = result_tree
    out = comparison_report(base, ["sceneA", "sceneB"],
                            str(tmp_path / "merged.pdf"), index=1,
                            compare_targets=list(TARGETS), gt_dir=gt)
    data = open(out, "rb").read()
    assert data[:5] == b"%PDF-"
    # one page per scene
    assert b"/Count 2" in data


def test_ggx_kernel_properties():
    nx, k = ggx_screen_kernel(n=21, roughness=0.3)
    assert k.shape == (21,)
    assert np.all(k >= 0)
    # symmetric and peaked at the center for a head-on view
    assert np.argmax(k) == 10
    np.testing.assert_allclose(k, k[::-1], rtol=1e-10)
    # rougher -> flatter kernel (smaller peak mass)
    _, k_smooth = ggx_screen_kernel(n=21, roughness=0.1)
    _, k_rough = ggx_screen_kernel(n=21, roughness=0.9)
    assert k_smooth.max() > k_rough.max()


def test_gaussian_kernel_normalized_slice():
    ax, k = gaussian_kernel_1d(length=51, sigma=0.3)
    assert k.shape == (51,) and np.argmax(k) == 25


def test_ggx_gaussian_figure(tmp_path):
    out = ggx_gaussian_figure(str(tmp_path / "ggx.pdf"))
    assert os.path.getsize(out) > 1000


def test_comparison_grid_still_works(result_tree, tmp_path):
    base, gt = result_tree
    d = os.path.join(base, "sceneA", "ours", "testset_099999")
    out = comparison_grid({"ours": d}, ["rgb", "albedo"], 1,
                          str(tmp_path / "grid.png"), gt_dir=gt)
    assert os.path.getsize(out) > 1000
