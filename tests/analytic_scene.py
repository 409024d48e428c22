"""Analytic multi-view scene generator (geometrically consistent).

Ray-traces a tiny world — two lambertian spheres over a backdrop shell —
with the SAME pinhole convention as ops/rays.py, writing a full
Mitsuba-format scene (images + normal/albedo/roughness/depth/irradiance
gt + priors + transforms) so convergence runs train on consistent data
(unlike make_synthetic_scene's per-frame random shifts).
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

SPHERES = [
    # (center, radius, albedo)
    (np.array([0.0, 0.0, 0.0]), 1.0, np.array([0.8, 0.3, 0.25])),
    (np.array([1.2, 0.4, -0.6]), 0.5, np.array([0.25, 0.6, 0.85])),
]
BACKDROP_R = 8.0
BACKDROP_ALBEDO = np.array([0.65, 0.65, 0.6])
LIGHT_DIR = np.array([0.5, 0.8, 0.3]) / np.linalg.norm([0.5, 0.8, 0.3])
AMBIENT = 0.35


def _pose_orbit(i, n, radius=4.0, height=0.8):
    ang = 2 * np.pi * i / n
    eye = np.array([radius * np.sin(ang), height, radius * np.cos(ang)])
    fwd = -eye / np.linalg.norm(eye)          # look at origin
    right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    # camera looks down -z in our convention: z column = -forward
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = up
    pose[:3, 2] = -fwd
    pose[:3, 3] = eye
    return pose


def _trace(rays_o, rays_d):
    """Returns (rgb, depth, normal, albedo) for (...,3) rays."""
    sh = rays_o.shape[:-1]
    t_best = np.full(sh, np.inf)
    normal = np.zeros((*sh, 3))
    albedo = np.zeros((*sh, 3))

    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    def hit_sphere(c, r):
        oc = rays_o - c
        b = np.sum(oc * d, -1)
        cterm = np.sum(oc * oc, -1) - r * r
        disc = b * b - cterm
        ok = disc > 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where(t0 > 1e-3, t0, t1)
        ok = ok & (t > 1e-3)
        return ok, t

    for c, r, alb in SPHERES:
        ok, t = hit_sphere(c, r)
        closer = ok & (t < t_best)
        t_best = np.where(closer, t, t_best)
        p = rays_o + d * t[..., None]
        n = (p - c) / r
        normal = np.where(closer[..., None], n, normal)
        albedo = np.where(closer[..., None], alb, albedo)

    ok, t = hit_sphere(np.zeros(3), BACKDROP_R)
    closer = ok & (t < t_best)
    t_best = np.where(closer, t, t_best)
    p = rays_o + d * t[..., None]
    n = -p / BACKDROP_R  # inward normal
    normal = np.where(closer[..., None], n, normal)
    albedo = np.where(closer[..., None], BACKDROP_ALBEDO, albedo)

    lam = np.clip(np.sum(normal * LIGHT_DIR, -1), 0, 1)
    irr = AMBIENT + (1 - AMBIENT) * lam
    rgb = albedo * irr[..., None]
    depth = np.where(np.isfinite(t_best), t_best, BACKDROP_R)
    return rgb, depth, normal, albedo, irr


def make_analytic_scene(root, h=64, w=64, n_train=10, n_test=3,
                        fov_deg=50.0, prior_type="bell"):
    os.makedirs(root, exist_ok=True)
    focal = 0.5 * w / np.tan(0.5 * np.deg2rad(fov_deg))
    i_px, j_px = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32), indexing="xy")

    depth_min, depth_max = np.inf, -np.inf
    irr_means = []

    def png(path, img01):
        arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 3:
            arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, arr)

    for split, n, start in [("train", n_train, 0), ("test", n_test, 0.5)]:
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        frames = []
        for i in range(1, n + 1):
            pose = _pose_orbit(i - 1 + start, n, radius=4.0)
            dirs = np.stack([(i_px - w / 2) / focal, -(j_px - h / 2) / focal,
                             -np.ones_like(i_px)], -1)
            rays_d = np.einsum("hwc,rc->hwr", dirs, pose[:3, :3])
            rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
            rgb, depth, normal, albedo, irr = _trace(rays_o, rays_d)
            # depth along the ray scaled to |d|=1 convention of gt depth
            depth_unit = depth * np.linalg.norm(dirs, axis=-1)

            png(f"{d}/{i}.png", rgb)
            png(f"{d}/{i}_normal.png", (normal + 1) / 2)
            png(f"{d}/{i}_albedo.png", albedo)
            png(f"{d}/{i}_roughness.png",
                np.repeat(np.full((h, w, 1), 0.6), 3, -1))
            np.save(f"{d}/{i}_depth.npy", depth_unit.astype(np.float32))
            png(f"{d}/{i}_irradiance.png", np.repeat(irr[..., None], 3, -1))
            png(f"{d}/{i}_{prior_type}_r.png", albedo)
            png(f"{d}/{i}_{prior_type}_s.png", np.repeat(irr[..., None], 3, -1))

            if split == "train":
                depth_min = min(depth_min, float(depth_unit.min()))
                depth_max = max(depth_max, float(depth_unit.max()))
                irr_means.append(float(irr.mean()))

            # store the pose pre-inverted for the loader's Mitsuba flip
            p_out = pose.copy()
            p_out[:3, 0] *= -1
            p_out[:3, 2] *= -1
            frames.append({"fov_degree": fov_deg, "transform": p_out.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames}, f)

    with open(os.path.join(root, "min_max_depth.json"), "w") as f:
        json.dump({"min_depth": depth_min, "max_depth": depth_max}, f)
    with open(os.path.join(root, "avg_irradiance.json"), "w") as f:
        json.dump({f"mean_{prior_type}": float(np.mean(irr_means))}, f)
    return root


if __name__ == "__main__":
    import sys

    make_analytic_scene(sys.argv[1] if len(sys.argv) > 1 else
                        "/tmp/analytic_scene")
    print("analytic scene written")
