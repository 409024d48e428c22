"""Generate a tiny on-disk Mitsuba-format scene for end-to-end tests.

Writes the exact file contract the reference dataset expects
(dataset_mitsuba.py): {i}.png, {i}_normal.png, {i}_albedo.png,
{i}_roughness.png, {i}_depth.npy, {i}_irradiance.png, priors
{i}_{bell|ting}_{r,s}.png, edit/insert buffers, transforms_{split}.json
with per-frame fov_degree+transform, min_max_depth.json,
avg_irradiance.json.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


def _write_png(path, img01):
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, arr)


def _pose(i, n):
    """Simple orbit of cameras looking at the origin from z=4."""
    ang = 2 * np.pi * i / max(n, 1) * 0.1
    c, s = np.cos(ang), np.sin(ang)
    pose = np.array(
        [[c, 0, s, 4 * s],
         [0, 1, 0, 0.0],
         [-s, 0, c, 4 * c],
         [0, 0, 0, 1]], dtype=np.float32)
    # pre-invert the Mitsuba x/z flip the loader applies
    pose[:3, 0] *= -1
    pose[:3, 2] *= -1
    return pose


def make_scene(root: str, h: int = 40, w: int = 52, n_train: int = 3,
               n_test: int = 2, prior_type: str = "bell", seed: int = 0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    with open(os.path.join(root, "min_max_depth.json"), "w") as f:
        json.dump({"min_depth": 2.0, "max_depth": 6.0}, f)
    with open(os.path.join(root, "avg_irradiance.json"), "w") as f:
        json.dump({"mean_bell": 0.62, "mean_ting": 0.58}, f)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx / w, yy / h, 0.5 + 0.5 * np.sin(xx / 7)], -1)

    for split, n in [("train", n_train), ("test", n_test)]:
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        frames = []
        for i in range(1, n + 1):
            shift = rng.uniform(0, 1, 3)
            img = np.clip(base * 0.7 + 0.3 * shift, 0, 1)
            _write_png(f"{d}/{i}.png", img)
            _write_png(f"{d}/{i}_normal.png",
                       np.stack([0.5 * np.ones_like(xx),
                                 0.5 * np.ones_like(xx),
                                 np.ones_like(xx)], -1))
            _write_png(f"{d}/{i}_albedo.png", img)
            _write_png(f"{d}/{i}_roughness.png",
                       np.repeat((0.3 + 0.4 * (xx / w))[..., None], 3, -1))
            np.save(f"{d}/{i}_depth.npy",
                    (3.0 + np.sin(xx / 9) * 0.5).astype(np.float32))
            _write_png(f"{d}/{i}_irradiance.png",
                       np.repeat((0.5 + 0.2 * (yy / h))[..., None], 3, -1))
            _write_png(f"{d}/{i}_{prior_type}_r.png", img)
            _write_png(f"{d}/{i}_{prior_type}_s.png",
                       np.repeat((0.6 * np.ones_like(xx))[..., None], 3, -1))

            # edit / insert buffers: one object mask at gray 10/255
            mask = np.zeros((h, w, 3), np.float32)
            mask[h // 4: h // 2, w // 4: w // 2] = 10.0 / 255.0
            _write_png(f"{d}/{i}_edit_intrinsic_mask.png", mask)
            _write_png(f"{d}/{i}_edit_albedo.png", 1.0 - img)
            _write_png(f"{d}/{i}_edit_normal.png",
                       np.stack([np.ones_like(xx), 0.5 * np.ones_like(xx),
                                 0.5 * np.ones_like(xx)], -1))
            _write_png(f"{d}/{i}_edit_roughness.png",
                       np.repeat((0.9 * np.ones_like(xx))[..., None], 3, -1))
            np.save(f"{d}/{i}_edit_depth.npy",
                    (3.2 * np.ones((h, w))).astype(np.float32))
            _write_png(f"{d}/{i}_insert_mask.png", mask)
            np.save(f"{d}/{i}_insert_depth.npy",
                    (2.8 * np.ones((h, w))).astype(np.float32))
            _write_png(f"{d}/{i}_insert_normal.png",
                       np.stack([0.5 * np.ones_like(xx), np.ones_like(xx),
                                 0.5 * np.ones_like(xx)], -1))

            frames.append({"fov_degree": 45.0,
                           "transform": _pose(i, n).tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames}, f)
    return root


def make_colmap_scene(root: str, h: int = 36, w: int = 48, n: int = 10,
                      prior_type: str = "ting", seed: int = 0):
    """Real-scene (colmap) file contract: transforms.json with
    camera_angle_x/h/w + per-frame transform_matrix/file_path, images/
    dir with optional `{stem}_{prior}_r/s.png` priors
    (parity: dataset_colmap.py:6-69)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    with open(os.path.join(root, "avg_irradiance.json"), "w") as f:
        json.dump({"mean_ting": 0.55, "mean_bell": 0.6}, f)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx / w, yy / h, 0.5 + 0.5 * np.cos(yy / 5)], -1)

    frames = []
    for i in range(n):
        name = f"frame_{i:04d}.png"
        img = np.clip(base * 0.8 + 0.2 * rng.uniform(0, 1, 3), 0, 1)
        _write_png(os.path.join(img_dir, name), img)
        _write_png(os.path.join(img_dir, f"frame_{i:04d}_{prior_type}_r.png"),
                   img)
        _write_png(os.path.join(img_dir, f"frame_{i:04d}_{prior_type}_s.png"),
                   np.full((h, w, 3), 0.55, np.float32))
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * i
        frames.append({"file_path": f"./images/{name}",
                       "transform_matrix": pose.tolist()})

    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "h": h, "w": w,
                   "frames": frames}, f)
    return root


if __name__ == "__main__":
    import sys

    make_scene(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_scene")
    print("scene written")
