"""Tests for auxiliary subsystems: preprocessing, env map, mesh
extraction, video export, native loader, visualization, compare sweeps."""

import json
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from make_synthetic_scene import make_scene  # noqa: E402


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scene_aux")))


class TestPreprocess:
    def test_min_max_depth(self, scene_dir):
        from ibl_nerf_tpu.cli.preprocess import compute_min_max_depth

        mm = compute_min_max_depth(scene_dir)
        assert 2.0 < mm["min_depth"] < 3.0
        assert 3.0 < mm["max_depth"] < 4.0

    def test_avg_irradiance(self, scene_dir):
        from ibl_nerf_tpu.cli.preprocess import compute_avg_irradiance

        avg = compute_avg_irradiance(scene_dir, ("bell",))
        assert abs(avg["mean_bell"] - 0.6) < 0.02

    def test_cli(self, scene_dir):
        from ibl_nerf_tpu.cli.preprocess import main

        main(["--datadir", scene_dir])
        assert os.path.exists(os.path.join(scene_dir, "min_max_depth.json"))
        data = json.load(open(os.path.join(scene_dir, "avg_irradiance.json")))
        assert "mean_bell" in data


class TestEnvmap:
    def test_shapes_and_lookup(self):
        from ibl_nerf_tpu.models.envmap import init_envmap, sample_envmap

        p = init_envmap(jax.random.key(0), n=8)
        assert p["emission"].shape == (16, 8, 3)
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                            [0.0, 1.0, 0.0]])
        out = sample_envmap(p, dirs)
        assert out.shape == (3, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_differentiable(self):
        from ibl_nerf_tpu.models.envmap import init_envmap, sample_envmap

        p = init_envmap(jax.random.key(0), n=4)
        d = jnp.asarray([[0.3, 0.4, 0.87]])
        g = jax.grad(lambda pp: jnp.sum(sample_envmap(pp, d)))(p)
        assert float(jnp.sum(jnp.abs(g["emission"]))) > 0


class TestMeshExtraction:
    def test_marching_tetrahedra_sphere(self):
        from ibl_nerf_tpu.utils.mesh_extract import (
            marching_tetrahedra, export_obj)

        n = 24
        t = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        values = 100.0 * (1.0 - np.linalg.norm(g, axis=-1))  # sphere r=1
        verts, faces = marching_tetrahedra(values, iso=0.0,
                                           origin=(-1.5, -1.5, -1.5),
                                           spacing=3.0 / (n - 1))
        assert len(verts) > 100 and len(faces) > 100
        radii = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(radii.mean(), 1.0, atol=0.05)

    def test_marching_cubes_sphere(self):
        from ibl_nerf_tpu.utils.mesh_extract import marching_cubes

        n = 24
        t = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        values = 100.0 * (1.0 - np.linalg.norm(g, axis=-1))  # sphere r=1
        verts, faces = marching_cubes(values, iso=0.0,
                                      origin=(-1.5, -1.5, -1.5),
                                      spacing=3.0 / (n - 1))
        assert len(verts) > 100 and len(faces) > 100
        radii = np.linalg.norm(verts, axis=-1)
        # MC vertices interpolate the (linear-in-r) field exactly on
        # edges -> much tighter than the tetrahedra variant
        np.testing.assert_allclose(radii, 1.0, atol=0.02)

    def test_marching_cubes_watertight_all_cases(self):
        """Closed surface: every mesh edge shared by exactly 2 faces and
        V - E + F == 2 (sphere topology). A random smooth blob exercises
        many of the 256 generated cases incl. ambiguous faces."""
        from ibl_nerf_tpu.utils.mesh_extract import marching_cubes

        rng = np.random.default_rng(3)
        n = 20
        t = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        r = np.linalg.norm(g, axis=-1)
        # bumpy star-shaped blob (genus 0)
        bump = sum(a * np.sin(f * g[..., i] + p) for i, (a, f, p) in
                   enumerate(zip(rng.uniform(0.05, 0.15, 3),
                                 rng.uniform(2.0, 5.0, 3),
                                 rng.uniform(0, 6, 3))))
        values = (1.0 + bump) - r
        verts, faces = marching_cubes(values, iso=0.0,
                                      origin=(-1.5, -1.5, -1.5),
                                      spacing=3.0 / (n - 1))
        edges = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                        faces[:, [2, 0]]]), axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all(), "non-manifold or open edges"
        euler = len(verts) - len(uniq) + len(faces)
        assert euler == 2, f"Euler characteristic {euler} != 2"

    def test_marching_cubes_orientation(self):
        """Triangle normals point away from the inside (above-iso)
        region: signed volume of the sphere mesh is positive."""
        from ibl_nerf_tpu.utils.mesh_extract import marching_cubes

        n = 16
        t = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        values = 1.0 - np.linalg.norm(g, axis=-1)
        verts, faces = marching_cubes(values, iso=0.0,
                                      origin=(-1.5, -1.5, -1.5),
                                      spacing=3.0 / (n - 1))
        tri = verts[faces]
        signed_vol = np.sum(np.einsum(
            "ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2]))) / 6.0
        assert abs(abs(signed_vol) - 4.0 / 3.0 * np.pi) < 0.3
        assert signed_vol > 0, "normals flipped"

    def test_export_obj(self, tmp_path):
        from ibl_nerf_tpu.utils.mesh_extract import export_obj

        path = export_obj(str(tmp_path / "m.obj"),
                          np.zeros((3, 3), np.float32),
                          np.array([[0, 1, 2]], np.int32))
        lines = open(path).read().splitlines()
        assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"

    def test_density_grid_query(self):
        from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
        from ibl_nerf_tpu.utils.mesh_extract import query_density_grid

        cfg = FieldConfig(depth=2, width=16, skips=())
        params = init_field_params(jax.random.key(0), cfg)
        g = query_density_grid(params, cfg, n=8, radius=1.0)
        assert g.shape == (8, 8, 8) and np.isfinite(g).all()


class TestVideo:
    def test_stack_export(self, tmp_path):
        from ibl_nerf_tpu.utils.video import export_stack_as_video

        stack = np.random.default_rng(0).uniform(0, 1, (5, 32, 48, 3))
        out = export_stack_as_video(stack.astype(np.float32),
                                    str(tmp_path / "v.avi"), fps=5)
        assert os.path.getsize(out) > 1000


class TestNativeLoader:
    def test_decode_matches_cv2(self, scene_dir):
        import cv2
        from ibl_nerf_tpu.data.native_loader import (
            batch_load_png_rgb, native_available)

        if not native_available():
            pytest.skip("native lib unavailable")
        paths = [os.path.join(scene_dir, "train", f"{i}.png")
                 for i in (1, 2, 3)]
        out = batch_load_png_rgb(paths, 40, 52)
        ref = np.stack([
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32)
            / 255.0 for p in paths])
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestPortCheckpoint:
    def test_roundtrip(self, tmp_path):
        import torch

        sys.path.insert(0, "/root/reference/src")
        from nerf_models.ibl_nerf import IBLNeRF

        torch.manual_seed(0)
        m_c = IBLNeRF(D=2, W=16, input_ch=63, input_ch_views=27, skips=[],
                      coarse_radiance_number=1)
        m_f = IBLNeRF(D=2, W=16, input_ch=63, input_ch_views=27, skips=[],
                      coarse_radiance_number=1)
        tar = tmp_path / "000050.tar"
        torch.save({"global_step": 50,
                    "network_fn_state_dict": m_c.state_dict(),
                    "network_fine_state_dict": m_f.state_dict(),
                    "elapsed_time": 12.5}, tar)

        from ibl_nerf_tpu.cli.port_checkpoint import main

        out = tmp_path / "ported"
        main(["--tar", str(tar), "--out", str(out),
              "--coarse_radiance_number", "1", "--netdepth", "2"])

        from ibl_nerf_tpu.train.checkpoint import (
            list_checkpoints, restore_checkpoint)
        from ibl_nerf_tpu.train.step import build_optimizer, init_train_state
        from ibl_nerf_tpu.utils.port import field_params_from_torch_state

        assert list_checkpoints(str(out))[0][0] == 50
        np_sd = {k: v.numpy() for k, v in m_c.state_dict().items()}
        template_vars = {
            "coarse": field_params_from_torch_state(np_sd, 1, 2),
            "fine": field_params_from_torch_state(np_sd, 1, 2),
        }
        opt = build_optimizer(template_vars)
        state = init_train_state(template_vars, opt)
        state, elapsed, found = restore_checkpoint(str(out), state)
        assert found and int(state.step) == 50 and abs(elapsed - 12.5) < 1e-6
        np.testing.assert_allclose(
            np.asarray(state.variables["coarse"]["sigma"]["w"]),
            np_sd["sigma_linear.weight"].T, atol=1e-7)


class TestMergedSampling:
    def test_per_ray_images(self):
        from ibl_nerf_tpu.data.sampler import sample_pixel_batch

        rng = np.random.default_rng(0)
        n_img, h, w = 4, 8, 8
        images = rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * n_img)
        poses[:, 0, 3] = np.arange(n_img)  # distinct origins per image
        arrays = {
            "images": jnp.asarray(images),
            "poses": jnp.asarray(poses),
            "K": jnp.asarray(np.array(
                [[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)),
        }
        info, ro, rd, _, _, _ = sample_pixel_batch(
            jax.random.key(0), arrays, 64, h, w, merged=True)
        assert info["rgb"].shape == (64, 3)
        # rays from multiple distinct cameras
        assert len(np.unique(np.asarray(ro)[:, 0])) > 1

    def test_single_image_mode_unchanged(self):
        from ibl_nerf_tpu.data.sampler import sample_pixel_batch

        arrays = {
            "images": jnp.zeros((2, 8, 8, 3)),
            "poses": jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)),
            "K": jnp.asarray(np.array(
                [[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)),
        }
        info, ro, rd, _, _, _ = sample_pixel_batch(
            jax.random.key(0), arrays, 16, 8, 8, merged=False)
        assert np.allclose(np.asarray(ro), np.asarray(ro)[0])  # one camera


class TestLabelEncoders:
    COLORS = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)

    def test_colored_mask_roundtrip(self):
        from ibl_nerf_tpu.utils.labels import (
            colored_mask_to_label_map, label_to_colored_label)

        label = np.array([[0, 1], [2, 1]])
        mask = self.COLORS[label]
        back = colored_mask_to_label_map(mask, self.COLORS)
        np.testing.assert_array_equal(back, label)
        colored = label_to_colored_label(jnp.asarray(label),
                                         jnp.asarray(self.COLORS))
        np.testing.assert_array_equal(np.asarray(colored), mask)

    @pytest.mark.parametrize("cls_name", [
        "OneHotLabelEncoder", "ScalarLabelEncoder",
        "ColoredLabelEncoder", "RandomLabelEncoder"])
    def test_encode_decode_roundtrip(self, cls_name):
        from ibl_nerf_tpu.utils import labels as L

        enc = getattr(L, cls_name)(self.COLORS)
        lab = jnp.asarray([0, 1, 2, 1, 0])
        e = enc.encode(lab)
        assert e.shape == (5, enc.get_dimension())
        np.testing.assert_array_equal(np.asarray(enc.decode(e)),
                                      np.asarray(lab))
        assert float(enc.error(e, lab)) < 1e-10


class TestSamplerModes:
    def _arrays(self):
        rng = np.random.default_rng(0)
        n_img, h, w = 3, 16, 16
        poses = np.stack([np.eye(4, dtype=np.float32)] * n_img)
        return {
            "images": jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)),
            "normal": jnp.asarray(rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)),
            "poses": jnp.asarray(poses),
            "K": jnp.asarray(np.array(
                [[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)),
        }, h, w

    def test_patch_mode(self):
        """8-neighbor patch sampling (parity: sample_generator ray_sample
        ='patch' + get_neighbor_coord)."""
        from ibl_nerf_tpu.data.sampler import sample_pixel_batch

        arrays, h, w = self._arrays()
        info, ro, rd, neigh, ro_n, rd_n = sample_pixel_batch(
            jax.random.key(0), arrays, 8, h, w, patch=True)
        assert neigh["rgb"].shape == (8, 8, 3)
        assert neigh["normal"].shape == (8, 8, 3)
        assert ro_n.shape == (8, 8, 3) and rd_n.shape == (8, 8, 3)
        # patch mode keeps pixels 1 away from the border
        assert np.isfinite(np.asarray(rd_n)).all()

    def test_precrop(self):
        """Precrop warm-up restricts samples to the center crop."""
        from ibl_nerf_tpu.data.sampler import sample_pixel_batch
        from ibl_nerf_tpu.ops.rays import get_rays_for_pixels

        arrays, h, w = self._arrays()
        _, ro, rd, _, _, _ = sample_pixel_batch(
            jax.random.key(1), arrays, 64, h, w,
            precrop=True, precrop_frac=0.25)
        # reconstruct pixel x from direction: x = dirs_x * f + cx
        dirs_cam_x = np.asarray(rd)[:, 0] / (-np.asarray(rd)[:, 2])
        px = dirs_cam_x * 20.0 + 8.0
        # frac 0.25 of 16 -> central [6, 10)
        assert px.min() >= 5.5 and px.max() <= 10.5


class TestCompare:
    def test_time_calculator(self, tmp_path):
        from ibl_nerf_tpu.eval.compare import time_calculator

        d = tmp_path / "exp1"
        d.mkdir()
        json.dump({"training_time": 100.0, "global_step": 50},
                  open(d / "train_info_step_time.json", "w"))
        df = time_calculator([str(d)])
        assert abs(df.iloc[0]["time_per_step"] - 2.0) < 1e-9

    def test_calculate_metrics_folder_protocol(self, tmp_path):
        """Reference protocol: pred `{prefix}_{i:03d}.png` vs gt
        `test/{i+1}{suffix}.png` folders."""
        import cv2
        from ibl_nerf_tpu.eval.compare import calculate_metrics, error_calculator

        rng = np.random.default_rng(0)
        scene = tmp_path / "results" / "kitchen" / "ours"
        gt = tmp_path / "data" / "kitchen" / "test"
        scene.mkdir(parents=True)
        gt.mkdir(parents=True)
        for i in range(3):
            img = (rng.uniform(0, 1, (24, 32, 3)) * 255).astype(np.uint8)
            noisy = np.clip(img.astype(int) + rng.integers(-10, 10, img.shape),
                            0, 255).astype(np.uint8)
            cv2.imwrite(str(scene / f"rgb_{i:03d}.png"), noisy)
            cv2.imwrite(str(gt / f"{i + 1}.png"), img)
            cv2.imwrite(str(scene / f"albedo_{i:03d}.png"), img)
            cv2.imwrite(str(gt / f"{i + 1}_albedo.png"), img)

        m = calculate_metrics(str(scene), str(gt), 3, "image")
        assert 20 < m["psnr"] < 50 and 0.5 < m["ssim"] < 1.0
        m2 = calculate_metrics(str(scene), str(gt), 3, "albedo")
        assert m2["psnr"] > 50  # identical images

        df = error_calculator(["kitchen"], ["ours"],
                              str(tmp_path / "results"),
                              str(tmp_path / "data"),
                              targets=("image", "albedo"), n_images=3,
                              out_csv=str(tmp_path / "sweep.csv"))
        assert len(df) == 2
        assert os.path.exists(tmp_path / "sweep.csv")

    def test_pprint_latex(self):
        import pandas as pd
        from ibl_nerf_tpu.eval.compare import pprint_latex

        df = pd.DataFrame([
            {"scene": "kitchen", "experiment": "ours", "target": "image",
             "psnr": 30.1, "ssim": 0.9, "mse": 0.001},
            {"scene": "bathroom", "experiment": "ours", "target": "image",
             "psnr": 28.2, "ssim": 0.8, "mse": 0.002},
        ])
        tex = pprint_latex(df, "psnr")
        assert "ours &" in tex and "\\\\" in tex


class TestVisualize:
    def test_comparison_grid(self, tmp_path):
        import cv2
        from ibl_nerf_tpu.eval.visualize import comparison_grid, crop_zoom

        d = tmp_path / "res"
        d.mkdir()
        img = (np.random.default_rng(0).uniform(0, 1, (24, 32, 3)) * 255
               ).astype(np.uint8)
        cv2.imwrite(str(d / "rgb_000.png"), img)
        cv2.imwrite(str(d / "albedo_000.png"), img)
        out = comparison_grid({"ours": str(d)}, ["rgb", "albedo"], 0,
                              str(tmp_path / "grid.pdf"))
        assert os.path.getsize(out) > 500
        cz = crop_zoom(str(d / "rgb_000.png"), (2, 2, 8, 8),
                       str(tmp_path / "crop.png"))
        assert os.path.exists(cz)
