"""Trajectory rendering: novel-view orbit video from a checkpoint.

The capability behind the reference's render_poses/`i_video` plumbing
(pose_spherical at math_utils.py:25-30; get_test_render_poses stubs):
renders a spherical camera orbit and encodes a video per buffer.

    python -m ibl_nerf_tpu.cli.render --config <cfg> \
        [--orbit_frames 60 --orbit_phi -30 --orbit_radius 4]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.cli.config import build_parser, parse_with_includes
from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
from ibl_nerf_tpu.data.dataset import load_scene
from ibl_nerf_tpu.eval.render_path import render_path
from ibl_nerf_tpu.ops.geometry import pose_spherical
from ibl_nerf_tpu.train import checkpoint as ckpt_lib
from ibl_nerf_tpu.train.loop import (
    field_config_from_args,
    init_variables,
    render_config_from_args,
)
from ibl_nerf_tpu.train.step import build_optimizer, init_train_state
from ibl_nerf_tpu.utils.logging import load_logger
from ibl_nerf_tpu.utils.video import export_stack_as_video


def orbit_poses(n_frames: int, phi: float, radius: float) -> np.ndarray:
    return np.stack([
        pose_spherical(theta, phi, radius)
        for theta in np.linspace(-180.0, 180.0, n_frames, endpoint=False)
    ])


def spiral_poses(n_frames: int, phi: float, radius: float,
                 n_turns: float = 2.0, phi_amp: float = 15.0) -> np.ndarray:
    """Spiral: theta sweeps n_turns revolutions while elevation
    oscillates +-phi_amp around phi (the classic NeRF demo path)."""
    t = np.linspace(0.0, 1.0, n_frames, endpoint=False)
    return np.stack([
        pose_spherical(-180.0 + 360.0 * n_turns * ti,
                       phi + phi_amp * np.sin(2.0 * np.pi * ti),
                       radius)
        for ti in t
    ])


def lemniscate_poses(n_frames: int, phi: float, radius: float,
                     theta_amp: float = 60.0,
                     phi_amp: float = 20.0) -> np.ndarray:
    """Figure-eight (lemniscate of Gerono in angle space) centered on
    (theta=0, phi): good for inspecting a single wall/region."""
    t = np.linspace(0.0, 2.0 * np.pi, n_frames, endpoint=False)
    return np.stack([
        pose_spherical(theta_amp * np.sin(ti),
                       phi + phi_amp * np.sin(ti) * np.cos(ti),
                       radius)
        for ti in t
    ])


TRAJECTORIES = {
    "orbit": orbit_poses,
    "spiral": spiral_poses,
    "lemniscate": lemniscate_poses,
}


def main(argv=None):
    from ibl_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logger = load_logger("render")
    # extra orbit flags on top of the shared parser
    argv = argv if argv is not None else None
    import sys as _sys

    raw = list(argv if argv is not None else _sys.argv[1:])

    def pop_flag(name, default, cast):
        if name in raw:
            i = raw.index(name)
            val = cast(raw[i + 1])
            del raw[i:i + 2]
            return val
        return default

    n_frames = pop_flag("--orbit_frames", 60, int)
    phi = pop_flag("--orbit_phi", -30.0, float)
    radius = pop_flag("--orbit_radius", 4.0, float)
    traj = pop_flag("--trajectory", "orbit", str)
    if traj not in TRAJECTORIES:
        raise SystemExit(f"--trajectory must be one of {sorted(TRAJECTORIES)}")

    args = parse_with_includes(raw)

    scene = load_scene(
        args.dataset_type, args.datadir, split="test",
        image_scale=args.image_scale,
        coarse_radiance_number=args.coarse_radiance_number,
        near_plane=args.near_plane, far_plane=args.far_plane,
        load_depth_range_from_file=args.load_depth_range_from_file,
        skip=args.testskip or 1,
    )

    fcfg = field_config_from_args(args)
    rcfg = render_config_from_args(args, fcfg).replace(
        approximate_radiance=True, perturb=False, raw_noise_std=0.0,
        # gt-free trajectory: analytic normal estimator and no gt
        # substitutions (orbit poses have no aligned ground truth)
        normal_type=(args.calculating_normal_type
                     if args.calculating_normal_type != "ground_truth"
                     else "normal_map_from_depth_gradient_epsilon"),
        depth_map_from_ground_truth=False,
        calculate_albedo_from_gt=False,
        calculate_roughness_from_gt=False,
        calculate_irradiance_from_gt=False)

    variables = init_variables(jax.random.key(0), args, fcfg)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}
    optimizer = build_optimizer(variables, lrate=args.lrate,
                                lrate_decay=args.lrate_decay)
    state = init_train_state(variables, optimizer)
    logdir = os.path.join(args.basedir, args.expname)
    state, _, found = ckpt_lib.restore_checkpoint(
        logdir, state, ft_path=args.ft_path,
        target_step=args.target_load_N_iter)
    if not found:
        raise FileNotFoundError(f"no checkpoint in {logdir}")

    poses = TRAJECTORIES[traj](n_frames, phi, radius)
    outdir = os.path.join(logdir, f"{traj}_{int(state.step):06d}")
    # strip gt buffers: trajectory has no aligned ground truth
    scene.normals = scene.albedos = scene.roughness = None
    scene.depths = scene.irradiances = None
    results = render_path(state.variables, consts, scene, rcfg,
                          savedir=outdir, render_factor=args.render_factor,
                          poses=poses)
    for buf in ("rgb", "radiance", "albedo"):
        if buf in results and results[buf].ndim == 4:
            export_stack_as_video(results[buf],
                                  os.path.join(outdir, f"{buf}.avi"))
    logger.info("orbit rendered to %s (%d frames)", outdir, n_frames)
    return results


if __name__ == "__main__":
    main()
