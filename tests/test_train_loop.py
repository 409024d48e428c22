"""End-to-end training/inference tests on a tiny synthetic scene:
dataset loading, the jitted train step (loss decreases), phase
transitions, checkpoint save/resume, full-path rendering + CLI test
driver with editing."""

import json
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from make_synthetic_scene import make_scene  # noqa: E402

from ibl_nerf_tpu.cli.config import parse_with_includes  # noqa: E402


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    return make_scene(str(root))


def small_args(scene_dir, logdir, extra=()):
    argv = [
        "--datadir", scene_dir,
        "--basedir", logdir,
        "--expname", "exp",
        "--dataset_type", "mitsuba",
        "--netdepth", "2", "--netwidth", "32",
        "--N_rand", "16", "--N_samples", "8", "--N_importance", "8",
        "--N_iter", "12",
        "--coarse_radiance_number", "2",
        "--load_priors", "--prior_type", "bell",
        "--load_depth_range_from_file",
        "--freeze_roughness",
        "--N_iter_ignore_approximated_radiance", "4",
        "--N_iter_ignore_prior", "8",
        "--calculating_normal_type", "normal_map_from_depth_gradient_epsilon",
        "--correct_depth_for_prefiltered_radiance_infer",
        "--i_weights", "10", "--i_testset", "100000",
        "--summary_step", "4",
        "--render_factor", "4",
        "--lrate", "5e-3",
        "--use_viewdirs",
    ] + list(extra)
    return parse_with_includes(argv)


class TestConfigHygiene:
    def test_unknown_key_warns(self, tmp_path):
        """A typo'd config key must warn loudly (file + key), not
        silently run the experiment with defaults."""
        import warnings

        cfg = tmp_path / "exp.txt"
        cfg.write_text("N_importence = 128\nN_samples = 32\n")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            args = parse_with_includes(["--config", str(cfg)])
        msgs = [str(x.message) for x in w]
        assert any("N_importence" in m and str(cfg) in m for m in msgs), msgs
        assert args.N_samples == 32          # valid keys still apply
        assert args.N_importance == 0        # the typo'd key did nothing

    def test_dead_reference_flags_skip_silently(self, tmp_path):
        """Known-dead reference flags (the instance-decomposition / LLFF
        remnants) parse without warning spam — verbatim reference
        configs must stay quiet."""
        import warnings

        cfg = tmp_path / "ref.txt"
        cfg.write_text("spherify = true\ndecompose_mode = entire\n"
                       "llffhold = 8\nN_rand = 512\n")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            args = parse_with_includes(["--config", str(cfg)])
        assert not w, [str(x.message) for x in w]
        assert args.N_rand == 512

    def test_reference_config_tree_parses_clean(self, tmp_path):
        """The live reference config hierarchy (common -> IBL-NeRF ->
        scene) parses verbatim with zero warnings."""
        import shutil
        import warnings

        src = "/root/reference/configs"
        if not os.path.isdir(src):
            pytest.skip("reference configs unavailable")
        dst = tmp_path / "configs"
        shutil.copytree(src, dst)
        scene_cfg = dst / "IBL-NeRF" / "kitchen" / "IBL-NeRF.txt"
        if not scene_cfg.exists():
            pytest.skip("kitchen config not in reference tree")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            args = parse_with_includes(["--config", str(scene_cfg)])
        assert not w, [str(x.message) for x in w]
        assert args.N_iter == 120000
        assert args.N_importance == 128


class TestDataset:
    def test_mitsuba_load(self, scene_dir):
        from ibl_nerf_tpu.data.dataset import load_mitsuba

        s = load_mitsuba(scene_dir, split="train", coarse_radiance_number=2,
                         load_depth_range_from_file=True, load_normal=True,
                         load_albedo=True, load_priors=True)
        assert len(s) == 3
        assert s.images.shape == (3, 40, 52, 3)
        assert s.prefiltered_images.shape == (2, 3, 40, 52, 3)
        assert abs(s.near - 1.8) < 1e-6 and abs(s.far - 6.6) < 1e-5
        assert abs(s.prior_irradiance_mean - 0.62) < 1e-9
        assert s.poses.shape == (3, 4, 4)
        # loader applies the Mitsuba x/z flip; generator pre-inverted it
        np.testing.assert_allclose(s.poses[0][:3, 1], [0, 1, 0], atol=1e-6)

    def test_editing_idx_single_frame(self, scene_dir):
        from ibl_nerf_tpu.data.dataset import load_mitsuba

        s = load_mitsuba(scene_dir, split="test", coarse_radiance_number=0,
                         editing_idx=2, load_edit=("mask", "roughness"),
                         object_insert=False)
        assert len(s) == 1
        assert s.edit_intrinsic_masks.shape[0] == 1


class TestColmap:
    @pytest.fixture(scope="class")
    def colmap_dir(self, tmp_path_factory):
        from make_synthetic_scene import make_colmap_scene

        return make_colmap_scene(str(tmp_path_factory.mktemp("colmap")))

    def test_load_and_split(self, colmap_dir):
        from ibl_nerf_tpu.data.dataset import load_colmap

        train = load_colmap(colmap_dir, split="train", load_priors=True,
                            prior_type="ting", coarse_radiance_number=2)
        test = load_colmap(colmap_dir, split="test", load_priors=False,
                           coarse_radiance_number=0)
        # every-8th-frame test split: 10 frames -> train {1..7,9}, test {0,8}
        assert len(train) == 8
        assert len(test) == 2
        assert train.images.shape[1:] == (36, 48, 3)
        assert train.prefiltered_images.shape[0] == 2
        assert abs(train.prior_irradiance_mean - 0.55) < 1e-9
        # half-res real-scene mode
        half = load_colmap(colmap_dir, split="train", image_scale=0.5,
                           coarse_radiance_number=0)
        assert half.images.shape[1:3] == (18, 24)

    def test_train_on_real_scene_config(self, colmap_dir, tmp_path):
        """BASELINE config #5 capability: the real-scene (colmap) path
        trains end-to-end with priors, half resolution."""
        from ibl_nerf_tpu.cli.config import parse_with_includes
        from ibl_nerf_tpu.train.loop import train

        args = parse_with_includes([
            "--datadir", colmap_dir,
            "--basedir", str(tmp_path / "logs"),
            "--expname", "real",
            "--dataset_type", "colmap",
            "--image_scale", "0.5",
            "--near_plane", "0.5", "--far_plane", "20",
            "--netdepth", "2", "--netwidth", "32",
            "--N_rand", "16", "--N_samples", "8", "--N_importance", "8",
            "--N_iter", "6",
            "--coarse_radiance_number", "2",
            "--load_priors", "--prior_type", "ting",
            "--N_iter_ignore_approximated_radiance", "2",
            "--N_iter_ignore_prior", "4",
            "--calculating_normal_type",
            "normal_map_from_depth_gradient_epsilon",
            "--i_weights", "100000", "--i_testset", "100000",
            "--summary_step", "2", "--use_viewdirs",
        ])
        state = train(args)
        # N_iter=6 -> updates 0..6 inclusive (reference trange parity)
        assert int(state.step) == 7


class TestTrainLoop:
    def test_full_training_run(self, scene_dir, tmp_path):
        from ibl_nerf_tpu.train.loop import train

        args = small_args(scene_dir, str(tmp_path / "logs"))
        state = train(args)
        # N_iter=12 -> updates 0..12 inclusive (reference trange parity)
        assert int(state.step) == 13

        logdir = os.path.join(args.basedir, "exp")
        assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
        assert os.path.exists(os.path.join(logdir,
                                           "train_info_step_time.json"))
        # checkpoint written at step 10
        from ibl_nerf_tpu.train.checkpoint import list_checkpoints

        ckpts = list_checkpoints(logdir)
        assert any(s == 10 for s, _ in ckpts)

        # loss went down over the run
        recs = [json.loads(l) for l in
                open(os.path.join(logdir, "metrics.jsonl"))]
        losses = [r["loss_total"] for r in recs]
        assert losses[-1] < losses[0] * 1.5  # smoke: finite & not exploding
        assert all(np.isfinite(l) for l in losses)

    def test_infer_depth_and_normal_heads(self, scene_dir, tmp_path):
        """Aux depth MLP (with the NeRV random-volume distillation pass)
        and normal MLP train without error and produce scalars."""
        from ibl_nerf_tpu.train.loop import train

        args = small_args(scene_dir, str(tmp_path / "logs"),
                          extra=["--infer_depth", "--infer_normal",
                                 "--N_iter_ignore_depth", "6",
                                 "--N_iter_ignore_normal", "6",
                                 "--N_depth_random_volume", "8",
                                 "--summary_step", "1",
                                 "--infer_normal_target",
                                 "normal_map_from_depth_gradient_epsilon"])
        args.N_iter = 8
        state = train(args)
        assert "depth_mlp" in state.variables
        assert "normal_mlp" in state.variables
        recs = [json.loads(l) for l in
                open(os.path.join(args.basedir, "exp", "metrics.jsonl"))]
        last = recs[-1]
        assert np.isfinite(last["loss_depth"])
        assert np.isfinite(last["loss_inferred_normal"])
        # updates are 0-based (reference trange convention): the depth
        # loss activates at update 6, so updates 6 and 7 carry it.
        assert last["loss_depth"] > 0

    def test_fast_sgs_preset_trains(self, scene_dir, tmp_path):
        """The shipped fast preset (configs/fast_sgs.txt: sgs normals +
        bf16_grad) trains end to end through the production driver and
        emits finite losses + the acc_mean detector scalar."""
        from ibl_nerf_tpu.cli.config import parse_with_includes
        from ibl_nerf_tpu.train.loop import train

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        preset = parse_with_includes(
            ["--config", os.path.join(repo, "configs", "fast_sgs.txt")])
        assert preset.calculating_normal_type == (
            "normal_map_from_sigma_gradient_surface")
        assert preset.compute_dtype == "bf16_grad"

        args = small_args(scene_dir, str(tmp_path / "logs"),
                          extra=["--summary_step", "2"])
        args.calculating_normal_type = preset.calculating_normal_type
        args.compute_dtype = preset.compute_dtype
        args.N_iter = 6
        train(args)
        recs = [json.loads(l) for l in
                open(os.path.join(args.basedir, "exp", "metrics.jsonl"))]
        assert all(np.isfinite(r["loss_total"]) for r in recs)
        assert any("acc_mean" in r for r in recs)

    def test_fast_full_preset_parses(self):
        """configs/fast_full.txt (round 5: sgs + bf16_grad + fused
        train kernel — the bench-default mode) parses through the
        production config front end. Training with the kernel is
        covered by tests/test_kernels.py (grad parity + in-step run);
        a CPU interpret-mode train here would add minutes for no new
        coverage."""
        from ibl_nerf_tpu.cli.config import parse_with_includes

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        preset = parse_with_includes(
            ["--config", os.path.join(repo, "configs", "fast_full.txt")])
        assert preset.use_pallas_train is True
        assert preset.compute_dtype == "bf16_grad"
        assert preset.calculating_normal_type == (
            "normal_map_from_sigma_gradient_surface")

    def test_patch_ray_sample_mode(self, scene_dir, tmp_path):
        """`--ray_sample patch` is config-reachable: the loop samples
        patch-mode pixel batches and logs the no-grad neighbor-depth
        smoothness diagnostic every summary step."""
        from ibl_nerf_tpu.train.loop import train

        args = small_args(scene_dir, str(tmp_path / "logs"),
                          extra=["--ray_sample", "patch", "--no_batching",
                                 "--summary_step", "1"])
        args.N_iter = 4
        state = train(args)
        assert int(state.step) == 5
        recs = [json.loads(l) for l in
                open(os.path.join(args.basedir, "exp", "metrics.jsonl"))]
        assert all("patch_depth_smoothness" in r for r in recs)
        assert all(np.isfinite(r["patch_depth_smoothness"]) for r in recs)
        assert all(np.isfinite(r["loss_total"]) for r in recs)

    def test_patch_mode_sharded(self, scene_dir, tmp_path):
        """patch mode composes with the mesh-sharded driver (neighbor
        rays stay chip-local)."""
        from ibl_nerf_tpu.train.loop import train

        args = small_args(scene_dir, str(tmp_path / "logs"),
                          extra=["--ray_sample", "patch", "--no_batching",
                                 "--summary_step", "1",
                                 "--mesh_devices", "8"])
        args.N_iter = 2
        train(args)
        recs = [json.loads(l) for l in
                open(os.path.join(args.basedir, "exp", "metrics.jsonl"))]
        assert all(np.isfinite(r["patch_depth_smoothness"]) for r in recs)

    def test_train_driver_sharded_over_mesh(self, scene_dir, tmp_path):
        """The training driver auto-shards the ray batch over all
        available devices (8 virtual CPU devices in tests)."""
        import jax
        from ibl_nerf_tpu.train.loop import train

        assert len(jax.devices()) >= 8
        args = small_args(scene_dir, str(tmp_path / "logs"),
                          extra=["--mesh_devices", "8"])
        args.N_iter = 6
        args.i_weights = 100000
        state = train(args)
        assert int(state.step) == 7
        recs = [json.loads(l) for l in
                open(os.path.join(args.basedir, "exp", "metrics.jsonl"))]
        assert all(np.isfinite(r["loss_total"]) for r in recs)

    def test_resume(self, scene_dir, tmp_path):
        from ibl_nerf_tpu.train.loop import train

        args = small_args(scene_dir, str(tmp_path / "logs"))
        train(args)
        # resume: should pick up from step 10's ckpt and continue to 14
        args2 = small_args(scene_dir, str(tmp_path / "logs"))
        args2.N_iter = 14
        state = train(args2)
        # restored from the i=10 ckpt (11 completed updates), continued
        # through update 14 inclusive
        assert int(state.step) == 15


class TestRenderPathAndCLI:
    @pytest.fixture(scope="class")
    def trained(self, scene_dir, tmp_path_factory):
        from ibl_nerf_tpu.train.loop import train

        logdir = str(tmp_path_factory.mktemp("logs"))
        args = small_args(scene_dir, logdir)
        args.N_iter = 10
        train(args)
        return logdir

    def test_cli_test_driver(self, scene_dir, trained):
        from ibl_nerf_tpu.cli.test import run_test

        args = small_args(scene_dir, trained,
                          extra=["--render_factor", "4", "--testskip", "1",
                                 "--export_basedir",
                                 os.path.join(trained, "eval")])
        results = run_test(args)
        assert "rgb" in results and "albedo" in results
        assert "radiance_1" in results and "normal_from_depth" in results
        out = os.path.join(trained, "eval", "exp", "testset_000010")
        assert os.path.exists(os.path.join(out, "rgb_000.png"))
        assert os.path.exists(os.path.join(out, "roughness_001.png"))

    def test_cli_orbit_render(self, scene_dir, trained):
        from ibl_nerf_tpu.cli.render import main

        argv = [
            "--orbit_frames", "3", "--orbit_radius", "3.5",
            "--datadir", scene_dir, "--basedir", trained,
            "--expname", "exp", "--dataset_type", "mitsuba",
            "--netdepth", "2", "--netwidth", "32",
            "--N_samples", "8", "--N_importance", "8",
            "--coarse_radiance_number", "2",
            "--load_depth_range_from_file",
            "--calculating_normal_type",
            "normal_map_from_depth_gradient_epsilon",
            "--render_factor", "4", "--use_viewdirs",
        ]
        results = main(argv)
        assert results["rgb"].shape[0] == 3
        out = os.path.join(trained, "exp", "orbit_000010")
        assert os.path.exists(os.path.join(out, "rgb.avi"))

    def test_trajectory_presets(self):
        from ibl_nerf_tpu.cli.render import TRAJECTORIES

        for name, fn in TRAJECTORIES.items():
            poses = fn(12, -30.0, 4.0)
            assert poses.shape == (12, 4, 4), name
            rot = poses[:, :3, :3]
            # camera-to-world rotations stay orthonormal along the path
            eye = np.einsum("nij,nkj->nik", rot, rot)
            np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3),
                                                            (12, 3, 3)),
                                       atol=1e-5)
            # camera stays on the requested radius
            np.testing.assert_allclose(np.linalg.norm(poses[:, :3, 3], axis=1),
                                       4.0, rtol=1e-5)
        # presets actually differ from the plain orbit
        orbit = TRAJECTORIES["orbit"](12, -30.0, 4.0)
        for name in ("spiral", "lemniscate"):
            assert not np.allclose(TRAJECTORIES[name](12, -30.0, 4.0), orbit)

    def test_cli_extract_mesh(self, scene_dir, trained):
        from ibl_nerf_tpu.cli.test import run_test

        args = small_args(scene_dir, trained,
                          extra=["--render_factor", "8", "--testskip", "8",
                                 "--extract_mesh",
                                 "--export_basedir",
                                 os.path.join(trained, "eval_mesh")])
        run_test(args)
        out = os.path.join(trained, "eval_mesh", "exp", "testset_000010")
        assert os.path.exists(os.path.join(out, "mesh.obj"))

    def test_cli_edit_intrinsic(self, scene_dir, trained):
        from ibl_nerf_tpu.cli.test import run_test

        args = small_args(
            scene_dir, trained,
            extra=["--render_factor", "4",
                   "--export_basedir", os.path.join(trained, "eval_edit"),
                   "--edit_intrinsic", "--editing_img_idx", "1",
                   "--num_edit_objects", "1",
                   "--edit_roughness",
                   "--editing_target_roughness_list", "0.9",
                   "--edit_albedo",
                   "--editing_target_albedo_list", "1.0",
                   "--editing_target_albedo_list", "0.0",
                   "--editing_target_albedo_list", "0.0"])
        results = run_test(args)
        assert "rgb" in results
        assert results["rgb"].shape[0] == 1  # single edited frame

    def test_cli_object_insert(self, scene_dir, trained):
        from ibl_nerf_tpu.cli.test import run_test

        args = small_args(
            scene_dir, trained,
            extra=["--render_factor", "4",
                   "--export_basedir", os.path.join(trained, "eval_ins"),
                   "--insert_object", "--inserting_img_idx", "1",
                   "--num_insert_objects", "1",
                   "--inserting_target_roughness_list", "0.2",
                   "--inserting_target_irradiance_list", "0.5",
                   "--inserting_target_albedo_list", "0.8",
                   "--inserting_target_albedo_list", "0.1",
                   "--inserting_target_albedo_list", "0.1"])
        results = run_test(args)
        assert "rgb" in results


class TestMetrics:
    def test_psnr_ssim(self, rng):
        from ibl_nerf_tpu.eval.metrics import psnr, ssim

        a = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        assert float(psnr(a, a)) > 100
        assert abs(float(ssim(a, a)) - 1.0) < 1e-5
        b = jnp.clip(a + 0.1, 0, 1)
        assert float(psnr(a, b)) < 25
        assert float(ssim(a, b)) < 1.0

    def test_ssim_immune_to_low_matmul_precision(self, rng):
        """The SSIM gaussian filter must pin HIGHEST conv precision: on
        TPU the default rounds conv operands to bf16 and the
        E[x^2]-E[x]^2 variance terms cancel catastrophically on
        low-variance patches (measured: SSIM 0.41 / even negative on
        buffers whose true SSIM is 0.88). Under a forced-low default
        precision the result must be unchanged."""
        import jax as _jax

        from ibl_nerf_tpu.eval.metrics import ssim

        # near-flat buffers with sub-1% texture — the cancellation regime
        base = 0.5 + 0.004 * rng.standard_normal((64, 64, 3))
        a = jnp.asarray(np.clip(base, 0, 1).astype(np.float32))
        b = jnp.asarray(np.clip(base + 0.002 * rng.standard_normal(
            (64, 64, 3)), 0, 1).astype(np.float32))
        ref = float(ssim(a, b))
        with _jax.default_matmul_precision("bfloat16"):
            low = float(_jax.jit(ssim)(a, b))
        assert abs(low - ref) < 1e-3, (
            f"ssim changed under low default matmul precision: "
            f"{low} vs {ref}")

    def test_ssim_matches_skimage_formula(self, rng):
        """Cross-check against an independent torch implementation of the
        standard gaussian-window SSIM. The oracle constructs its OWN
        11x11 sigma=1.5 window from the definition (it must not share
        eval.metrics' kernel code, or a kernel-generation bug would pass
        both sides)."""
        import torch
        import torch.nn.functional as TF

        from ibl_nerf_tpu.eval.metrics import ssim

        a = rng.uniform(0, 1, (24, 24, 1)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))

        # independent gaussian window (standard SSIM: 11x11, sigma 1.5)
        x = torch.arange(11, dtype=torch.float64) - 5.0
        g1 = torch.exp(-x.pow(2) / (2 * 1.5**2))
        g1 = g1 / g1.sum()
        k = torch.outer(g1, g1).to(torch.float32)[None, None]
        ta = torch.tensor(a).permute(2, 0, 1)[None]
        tb = torch.tensor(b).permute(2, 0, 1)[None]

        def f(x):
            return TF.conv2d(x, k)

        c1, c2 = 0.01**2, 0.03**2
        mua, mub = f(ta), f(tb)
        saa = f(ta * ta) - mua**2
        sbb = f(tb * tb) - mub**2
        sab = f(ta * tb) - mua * mub
        ref = (((2 * mua * mub + c1) * (2 * sab + c2))
               / ((mua**2 + mub**2 + c1) * (saa + sbb + c2))).mean()
        np.testing.assert_allclose(ours, float(ref), atol=1e-5)
