"""Scene dataset loading (mitsuba / colmap / eval readback).

Capability parity with the reference data layer
(/root/reference/src/dataset/): same JSON contracts, file naming,
Mitsuba axis flips (x,z columns negated: dataset_mitsuba.py:130-131),
near/far from min_max_depth.json x [0.9, 1.1], prior-mean from
avg_irradiance.json, colmap every-8th-frame split.

TPU-first: instead of torch Dataset + DataLoader + per-pixel host
fancy-indexing, everything is loaded once into dense numpy arrays
(`SceneData`) and transferred to device a single time; per-step pixel
sampling is a jitted gather (see data/sampler.py).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from concurrent.futures import ThreadPoolExecutor

import cv2
import numpy as np

from ibl_nerf_tpu.data.pyramid import build_prefiltered_pyramid


def _load_image(path: str, scale: float = 1.0) -> np.ndarray:
    """cv2 BGR->RGB uint8 -> [0,1] float; parity image_utils.py:39-47."""
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if scale != 1:
        img = cv2.resize(img, None, fx=scale, fy=scale)
    return img.astype(np.float32) / 255.0


def _load_npy(path: str, scale: float = 1.0) -> np.ndarray:
    arr = np.load(path)
    if scale != 1:
        arr = cv2.resize(arr, None, fx=scale, fy=scale)
    return arr.astype(np.float32)


@dataclasses.dataclass
class SceneData:
    """All per-scene arrays, host-side numpy, dense and stacked."""

    name: str
    split: str
    height: int
    width: int
    focal: float
    near: float
    far: float
    prior_irradiance_mean: float

    images: np.ndarray | None = None            # (N, H, W, 3)
    poses: np.ndarray | None = None             # (N, 4, 4)
    prefiltered_images: np.ndarray | None = None  # (K, N, H, W, 3)
    normals: np.ndarray | None = None
    albedos: np.ndarray | None = None
    roughness: np.ndarray | None = None         # (N, H, W, 1)
    depths: np.ndarray | None = None            # (N, H, W, 1)
    irradiances: np.ndarray | None = None
    diffuses: np.ndarray | None = None
    speculars: np.ndarray | None = None
    prior_albedos: np.ndarray | None = None
    prior_irradiances: np.ndarray | None = None

    edit_intrinsic_masks: np.ndarray | None = None
    edit_albedos: np.ndarray | None = None
    edit_normals: np.ndarray | None = None
    edit_roughnesses: np.ndarray | None = None
    edit_irradiances: np.ndarray | None = None
    edit_depths: np.ndarray | None = None

    object_insert_masks: np.ndarray | None = None
    object_insert_depths: np.ndarray | None = None
    object_insert_normals: np.ndarray | None = None

    def __len__(self):
        return 0 if self.poses is None else len(self.poses)

    @property
    def n_images(self) -> int:
        return len(self)

    def focal_matrix(self) -> np.ndarray:
        return np.array(
            [[self.focal, 0, 0.5 * self.width],
             [0, self.focal, 0.5 * self.height],
             [0, 0, 1]], dtype=np.float32)

    def gt_buffers(self) -> dict[str, np.ndarray]:
        """Name -> (N, H, W, C) map of every loaded gt buffer, using the
        per-pixel key names the renderer/losses expect."""
        pairs = {
            "normal": self.normals,
            "albedo": self.albedos,
            "roughness": self.roughness,
            "depth": self.depths,
            "irradiance": self.irradiances,
            "prior_albedo": self.prior_albedos,
            "prior_irradiance": self.prior_irradiances,
            "edit_intrinsic_mask": self.edit_intrinsic_masks,
            "edit_albedo": self.edit_albedos,
            "edit_normal": self.edit_normals,
            "edit_roughness": self.edit_roughnesses,
            "edit_irradiance": self.edit_irradiances,
            "edit_depth": self.edit_depths,
            "object_insert_mask": self.object_insert_masks,
            "object_insert_depth": self.object_insert_depths,
            "object_insert_normal": self.object_insert_normals,
        }
        return {k: v for k, v in pairs.items() if v is not None}


def _mitsuba_frame_paths(basedir, split, idx, prior_type):
    d = os.path.join(basedir, split)
    return {
        "image": f"{d}/{idx}.png",
        "normal": f"{d}/{idx}_normal.png",
        "albedo": f"{d}/{idx}_albedo.png",
        "roughness": f"{d}/{idx}_roughness.png",
        "depth": f"{d}/{idx}_depth.npy",
        "diffuse": f"{d}/{idx}_diffuse.png",
        "specular": f"{d}/{idx}_specular.png",
        "irradiance": f"{d}/{idx}_irradiance.png",
        "prior_albedo": f"{d}/{idx}_{prior_type}_r.png",
        "prior_irradiance": f"{d}/{idx}_{prior_type}_s.png",
        "edit_intrinsic_mask": f"{d}/{idx}_edit_intrinsic_mask.png",
        "edit_albedo": f"{d}/{idx}_edit_albedo.png",
        "edit_normal": f"{d}/{idx}_edit_normal.png",
        "edit_roughness": f"{d}/{idx}_edit_roughness.png",
        "edit_irradiance": f"{d}/{idx}_edit_irradiance.png",
        "edit_depth": f"{d}/{idx}_edit_depth.npy",
        "object_insert_mask": f"{d}/{idx}_insert_mask.png",
        "object_insert_depth": f"{d}/{idx}_insert_depth.npy",
        "object_insert_normal": f"{d}/{idx}_insert_normal.png",
    }


def load_mitsuba(
    basedir: str,
    split: str = "train",
    image_scale: float = 1.0,
    coarse_radiance_number: int = 3,
    near_plane: float = 1.0,
    far_plane: float = 20.0,
    load_depth_range_from_file: bool = False,
    load_image: bool = True,
    load_normal: bool = False,
    load_albedo: bool = False,
    load_roughness: bool = False,
    load_depth: bool = False,
    load_irradiance: bool = False,
    load_diffuse_specular: bool = False,
    load_priors: bool = False,
    prior_type: str = "bell",
    load_edit: tuple[str, ...] = (),   # subset of {"mask","albedo","normal","roughness","irradiance","depth"}
    object_insert: bool = False,
    skip: int = 1,
    editing_idx: int | None = None,
    num_workers: int = 8,
) -> SceneData:
    """Mitsuba synthetic scenes (parity: dataset_mitsuba.py:8-133)."""
    near, far = near_plane, far_plane
    if load_depth_range_from_file:
        with open(os.path.join(basedir, "min_max_depth.json")) as fp:
            f = json.load(fp)
        near, far = f["min_depth"] * 0.9, f["max_depth"] * 1.1

    prior_mean = 0.7
    if load_priors:
        with open(os.path.join(basedir, "avg_irradiance.json")) as fp:
            prior_mean = json.load(fp)["mean_" + prior_type]

    with open(os.path.join(basedir, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)

    if split == "train":
        skip = 1
    camera_angle_x = float(meta["frames"][0]["fov_degree"]) / 180.0 * math.pi

    probe = cv2.imread(os.path.join(basedir, "train/1.png"))
    oh, ow = probe.shape[:2]
    height = int(oh * image_scale)
    width = int(ow * image_scale)
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)

    if editing_idx is not None:
        frame_ids = [editing_idx]
        frames = [meta["frames"][editing_idx - 1]]
    else:
        frames = meta["frames"][::skip]
        frame_ids = [skip * i + 1 for i in range(len(frames))]

    want = {"image": load_image, "normal": load_normal, "albedo": load_albedo,
            "roughness": load_roughness, "depth": load_depth,
            "irradiance": load_irradiance,
            "diffuse": load_diffuse_specular, "specular": load_diffuse_specular,
            "prior_albedo": load_priors, "prior_irradiance": load_priors,
            "edit_intrinsic_mask": "mask" in load_edit,
            "edit_albedo": "albedo" in load_edit,
            "edit_normal": "normal" in load_edit,
            "edit_roughness": "roughness" in load_edit,
            "edit_irradiance": "irradiance" in load_edit,
            "edit_depth": "depth" in load_edit,
            "object_insert_mask": object_insert,
            "object_insert_depth": object_insert,
            "object_insert_normal": object_insert}

    all_paths = [_mitsuba_frame_paths(basedir, split, fid, prior_type)
                 for fid in frame_ids]

    # Fast path: native threaded PNG decode (native/ibl_data.cc) when no
    # resampling is needed (decode is bit-exact vs cv2); otherwise the
    # cv2 thread pool below.
    native_loaded: dict[str, np.ndarray] = {}
    if image_scale == 1:
        from ibl_nerf_tpu.data import native_loader

        if native_loader.native_available():
            for k, on in want.items():
                if not on or k.endswith("depth"):
                    continue
                out = native_loader.batch_load_png_rgb(
                    [p[k] for p in all_paths], height, width,
                    n_threads=num_workers)
                if out is not None:
                    native_loaded[k] = out

    def load_frame(i):
        paths = all_paths[i]
        s = {}
        for k, on in want.items():
            if not on or k in native_loaded:
                continue
            if k.endswith("depth"):
                s[k] = _load_npy(paths[k], image_scale)[..., None]
            else:
                s[k] = _load_image(paths[k], image_scale)
        pose = np.array(frames[i]["transform"], dtype=np.float32)
        # Mitsuba camera forward is +Z: flip x and z basis columns.
        pose[:3, 0] *= -1
        pose[:3, 2] *= -1
        s["pose"] = pose
        return s

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        samples = list(ex.map(load_frame, range(len(frames))))

    def stack(k):
        if k in native_loaded:
            arr = native_loaded[k]
        elif k in samples[0]:
            arr = np.stack([s[k] for s in samples], 0)
        else:
            return None
        if k in ("roughness", "edit_roughness"):
            arr = arr[..., 0:1]
        return arr

    data = SceneData(
        name="mitsuba", split=split, height=height, width=width, focal=focal,
        near=near, far=far, prior_irradiance_mean=prior_mean,
        images=stack("image"), poses=stack("pose"),
        normals=stack("normal"), albedos=stack("albedo"),
        roughness=stack("roughness"), depths=stack("depth"),
        irradiances=stack("irradiance"), diffuses=stack("diffuse"),
        speculars=stack("specular"),
        prior_albedos=stack("prior_albedo"),
        prior_irradiances=stack("prior_irradiance"),
        edit_intrinsic_masks=stack("edit_intrinsic_mask"),
        edit_albedos=stack("edit_albedo"), edit_normals=stack("edit_normal"),
        edit_roughnesses=stack("edit_roughness"),
        edit_irradiances=stack("edit_irradiance"),
        edit_depths=stack("edit_depth"),
        object_insert_masks=stack("object_insert_mask"),
        object_insert_depths=stack("object_insert_depth"),
        object_insert_normals=stack("object_insert_normal"),
    )
    if data.images is not None and coarse_radiance_number > 0:
        data.prefiltered_images = build_prefiltered_pyramid(
            data.images, coarse_radiance_number, image_scale)
    return data


def load_colmap(
    basedir: str,
    split: str = "train",
    image_scale: float = 1.0,
    coarse_radiance_number: int = 3,
    near_plane: float = 0.5,
    far_plane: float = 20.0,
    load_priors: bool = False,
    prior_type: str = "ting",
    num_workers: int = 8,
    **_,
) -> SceneData:
    """Real scenes from colmap (parity: dataset_colmap.py:6-69):
    every-8th-frame test split, transforms.json camera model."""
    prior_mean = 0.7
    if load_priors:
        with open(os.path.join(basedir, "avg_irradiance.json")) as fp:
            prior_mean = json.load(fp)["mean_" + prior_type]

    with open(os.path.join(basedir, "transforms.json")) as fp:
        meta = json.load(fp)

    camera_angle_x = float(meta["camera_angle_x"])
    oh, ow = meta["h"], meta["w"]
    height = int(oh * image_scale)
    width = int(ow * image_scale)
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)

    n_total = len(meta["frames"])
    if split == "train":
        idx = [i * 8 + j + 1 for i in range(n_total // 8 + 1) for j in range(7)]
    else:
        idx = [i * 8 for i in range(n_total // 8 + 1)]
    index_list = [i for i in idx if i < n_total]

    def load_frame(i):
        frame = meta["frames"][index_list[i]]
        fname = os.path.split(frame["file_path"])[-1]
        s = {"image": _load_image(os.path.join(basedir, "images", fname),
                                  image_scale)}
        if load_priors:
            stem = fname[:-4]
            s["prior_albedo"] = _load_image(
                os.path.join(basedir, "images", f"{stem}_{prior_type}_r.png"),
                image_scale)
            s["prior_irradiance"] = _load_image(
                os.path.join(basedir, "images", f"{stem}_{prior_type}_s.png"),
                image_scale)
        s["pose"] = np.array(frame["transform_matrix"], dtype=np.float32)
        return s

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        samples = list(ex.map(load_frame, range(len(index_list))))

    def stack(k):
        if k not in samples[0]:
            return None
        return np.stack([s[k] for s in samples], 0)

    data = SceneData(
        name="colmap", split=split, height=height, width=width, focal=focal,
        near=near_plane, far=far_plane, prior_irradiance_mean=prior_mean,
        images=stack("image"), poses=stack("pose"),
        prior_albedos=stack("prior_albedo"),
        prior_irradiances=stack("prior_irradiance"),
    )
    if data.images is not None and coarse_radiance_number > 0:
        data.prefiltered_images = build_prefiltered_pyramid(
            data.images, coarse_radiance_number, image_scale)
    return data


def load_scene(dataset_type: str, basedir: str, **kwargs) -> SceneData:
    if dataset_type == "mitsuba":
        return load_mitsuba(basedir, **kwargs)
    if dataset_type == "colmap":
        return load_colmap(basedir, **kwargs)
    raise ValueError(f"unknown dataset type {dataset_type}")
