"""Material-editing / object-insertion demo figures (VERDICT r3 #8).

Drives the production `cli/test.py` driver — the application axis of the
paper (/root/reference/src/test.py:30-169) — against the 120k-trained
flagship checkpoint on the analytic scene, and emits committed figures:

  docs/figures/edit_intrinsic.png  — original vs albedo-recolor +
                                     roughness-edit of the foreground
                                     objects (mask gray-level protocol)
  docs/figures/object_insert.png   — original vs inserted floating disc
                                     (insert mask + depth/normal buffers,
                                     target material via CLI lists)

Edit buffers are generated from the scene's own gt depth (foreground =
objects in front of the backdrop) and written with the reference's file
naming (dataset.py:134-143), so the whole flow — loader, mask decode,
`EditConfig`, `_apply_edit_overrides`, export — is the production path.

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tests \
        JAX_PLATFORMS=cpu python scripts/edit_figure.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2
import numpy as np


def write_edit_buffers(scene_dir):
    """Foreground-object edit mask + floating-disc insert buffers for
    every test frame, in the reference's file naming."""
    d = os.path.join(scene_dir, "test")
    idx = 1
    while os.path.exists(os.path.join(d, f"{idx}.png")):
        depth = np.load(os.path.join(d, f"{idx}_depth.npy"))
        h, w = depth.shape
        # foreground = in front of the backdrop sphere (analytic scene:
        # backdrop dominates the far depths)
        fg = depth < 0.85 * depth.max()
        mask = np.zeros((h, w, 3), np.float32)
        mask[fg] = 10.0 / 255.0          # object 1 at gray level 10
        cv2.imwrite(os.path.join(d, f"{idx}_edit_intrinsic_mask.png"),
                    (mask * 255).astype(np.uint8))

        # insert: a floating disc in the upper-right sky
        yy, xx = np.mgrid[0:h, 0:w]
        disc = ((yy - 0.28 * h) ** 2 + (xx - 0.72 * w) ** 2
                ) < (0.12 * h) ** 2
        imask = np.zeros((h, w, 3), np.float32)
        imask[disc] = 10.0 / 255.0
        cv2.imwrite(os.path.join(d, f"{idx}_insert_mask.png"),
                    (imask * 255).astype(np.uint8))
        ins_depth = depth.copy()
        ins_depth[disc] = 0.6 * float(np.median(depth[~disc]))
        np.save(os.path.join(d, f"{idx}_insert_depth.npy"),
                ins_depth.astype(np.float32))
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = 1.0              # world +z facing
        cv2.imwrite(os.path.join(d, f"{idx}_insert_normal.png"),
                    ((normal + 1) * 0.5 * 255).astype(np.uint8))
        idx += 1


def base_argv(scene_dir, basedir, expname, out, factor):
    return [
        "--datadir", scene_dir, "--basedir", basedir, "--expname", expname,
        "--dataset_type", "mitsuba", "--use_viewdirs",
        "--N_samples", "64", "--N_importance", "128",
        "--coarse_radiance_number", "3",
        "--load_depth_range_from_file",
        "--correct_depth_for_prefiltered_radiance_infer",
        "--calculating_normal_type",
        "normal_map_from_depth_gradient_epsilon",
        "--compute_dtype", "bf16_grad",
        "--render_factor", str(factor),
        "--export_basedir", out,
    ]


def main():
    ap = argparse.ArgumentParser("edit_figure")
    ap.add_argument("--scene", default="/tmp/analytic_scene_128")
    ap.add_argument("--basedir", default="/tmp/p120k")
    ap.add_argument("--expname", default="p120k_bf16_grad_s0")
    ap.add_argument("--outdir", default="docs/figures")
    ap.add_argument("--work", default="/tmp/edit_figure")
    ap.add_argument("--render_factor", type=int, default=1)
    ap.add_argument("--img_idx", type=int, default=1)
    args = ap.parse_args()

    from ibl_nerf_tpu.cli.config import parse_with_includes
    from ibl_nerf_tpu.cli.test import run_test
    from ibl_nerf_tpu.eval.visualize import comparison_grid

    write_edit_buffers(args.scene)
    step_dirname = None

    def run(tag, extra):
        nonlocal step_dirname
        out = os.path.join(args.work, tag)
        targs = parse_with_includes(
            base_argv(args.scene, args.basedir, args.expname, out,
                      args.render_factor) + extra)
        run_test(targs)
        d = os.path.join(out, args.expname)
        step_dirname = sorted(os.listdir(d))[-1]
        return os.path.join(d, step_dirname)

    plain = run("plain", ["--testskip", "1"])
    edited = run("edit", [
        "--edit_intrinsic", "--editing_img_idx", str(args.img_idx),
        "--num_edit_objects", "1",
        "--edit_albedo",
        "--editing_target_albedo_list", "0.15",
        "--editing_target_albedo_list", "0.25",
        "--editing_target_albedo_list", "0.95",
        "--edit_roughness",
        "--editing_target_roughness_list", "0.05",
    ])
    inserted = run("insert", [
        "--insert_object", "--inserting_img_idx", str(args.img_idx),
        "--num_insert_objects", "1",
        "--inserting_target_albedo_list", "0.9",
        "--inserting_target_albedo_list", "0.15",
        "--inserting_target_albedo_list", "0.1",
        "--inserting_target_roughness_list", "0.2",
        "--inserting_target_irradiance_list", "0.75",
    ])

    os.makedirs(args.outdir, exist_ok=True)
    bufs = ["rgb", "albedo", "roughness", "specular"]
    # edited/inserted runs render a single frame -> index 0 in exports;
    # the plain run exports all frames — img_idx is 1-BASED (reference
    # editing_img_idx semantics: frames[idx-1]), so the matching plain
    # export is index img_idx-1.
    f1 = comparison_grid({"original": plain}, bufs, args.img_idx - 1,
                         os.path.join(args.outdir, "_plain_row.png"))
    f_edit = comparison_grid(
        {"albedo->blue, roughness->0.05 (mask gray 10)": edited},
        bufs, 0, os.path.join(args.outdir, "_edit_row.png"))
    f_ins = comparison_grid(
        {"inserted disc (albedo red, rough 0.2, irr 0.75)": inserted},
        bufs, 0, os.path.join(args.outdir, "_insert_row.png"))

    # stack rows into the two final figures (original on top)
    def stack(paths, out):
        imgs = [cv2.imread(p) for p in paths]
        wmin = min(im.shape[1] for im in imgs)
        imgs = [cv2.resize(im, (wmin, int(im.shape[0] * wmin / im.shape[1])))
                for im in imgs]
        cv2.imwrite(out, np.concatenate(imgs, axis=0))
        print(f"wrote {out}")

    stack([f1, f_edit], os.path.join(args.outdir, "edit_intrinsic.png"))
    stack([f1, f_ins], os.path.join(args.outdir, "object_insert.png"))
    for p in (f1, f_edit, f_ins):
        os.remove(p)
    print("done")


if __name__ == "__main__":
    main()
