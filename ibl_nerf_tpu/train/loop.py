"""The training driver.

Parity: /root/reference/src/train.py:30-542 — staged losses, periodic
checkpoint + testset render, per-group LR decay, elapsed-time
accounting with the `time_limit_in_minute` equal-time mode, and the
final `train_info_step_time.json`.

TPU-first: the phase schedule compiles one specialized step per phase
(3 live phases); within a phase every iteration is a single donated jit
call with on-device batch sampling — the host only feeds PRNG keys and
reads scalars every `summary_step`.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import replace as dataclasses_replace

import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.data.brdf_lut import load_brdf_lut
from ibl_nerf_tpu.data.dataset import load_scene
from ibl_nerf_tpu.data.sampler import device_arrays_from_scene
from ibl_nerf_tpu.models.aux_mlp import (
    init_position_direction_mlp,
    init_position_mlp,
)
from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.render.config import RenderConfig
from ibl_nerf_tpu.train import checkpoint as ckpt_lib
from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
from ibl_nerf_tpu.train.step import (
    build_optimizer,
    init_train_state,
    make_train_step,
)
from ibl_nerf_tpu.utils.logging import load_logger, ScalarWriter


def field_config_from_args(args) -> FieldConfig:
    # netdepth_fine/netwidth_fine are accepted-but-dead flags, exactly as
    # in the reference: create_IBLNeRF builds BOTH models from
    # netdepth/netwidth (ibl_nerf.py:266-286 never reads the _fine ones).
    return FieldConfig(
        depth=args.netdepth, width=args.netwidth,
        multires=args.multires, multires_views=args.multires_views,
        coarse_radiance_number=args.coarse_radiance_number,
        color_independent_to_direction=args.color_independent_to_direction,
    )


def fine_field_config_from_args(args, fcfg: FieldConfig) -> FieldConfig | None:
    """Distinct fine-network architecture — an opt-in capability the
    reference only pretends to have (its netdepth_fine/netwidth_fine
    flags are parsed but never read). None = fine shares the coarse
    architecture (verbatim reference-config behavior)."""
    if not getattr(args, "use_fine_arch_flags", False):
        return None
    if (args.netdepth_fine == fcfg.depth
            and args.netwidth_fine == fcfg.width):
        return None
    return dataclasses_replace(fcfg, depth=args.netdepth_fine,
                               width=args.netwidth_fine)


def render_config_from_args(args, fcfg: FieldConfig) -> RenderConfig:
    return RenderConfig(
        field=fcfg,
        field_fine=fine_field_config_from_args(args, fcfg),
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb > 0,
        lindisp=args.lindisp,
        raw_noise_std=args.raw_noise_std,
        use_radiance_linear=args.use_radiance_linear,
        gamma_correct=args.gamma_correct,
        shading_mode=args.shading_mode,
        mc_samples_axis=args.mc_samples_axis,
        normal_type=args.calculating_normal_type,
        epsilon=args.epsilon_for_numerical_normal,
        epsilon_direction=args.epsilon_direction_for_numerical_normal,
        lut_coefficient=args.lut_coefficient,
        correct_depth_for_prefiltered_radiance_infer=(
            args.correct_depth_for_prefiltered_radiance_infer),
        use_gradient_for_incident_radiance=(
            args.use_gradient_for_incident_radiance),
        depth_map_from_ground_truth=args.depth_map_from_ground_truth,
        calculate_albedo_from_gt=args.calculate_albedo_from_gt,
        calculate_roughness_from_gt=args.calculate_roughness_from_gt,
        calculate_irradiance_from_gt=args.calculate_irradiance_from_gt,
        infer_normal=args.infer_normal,
        infer_normal_at_surface=args.infer_normal_at_surface,
        infer_depth=args.infer_depth,
        infer_albedo_separate=args.infer_albedo_separate,
        infer_roughness_separate=args.infer_roughness_separate,
        infer_irradiance_separate=args.infer_irradiance_separate,
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        use_pallas_train=args.use_pallas_train,
    )


def loss_config_from_args(args) -> LossConfig:
    return LossConfig(
        beta_render=args.beta_render,
        beta_radiance_render=args.beta_radiance_render,
        beta_albedo_render=args.beta_albedo_render,
        beta_inferred_normal=args.beta_inferred_normal,
        beta_inferred_depth=args.beta_inferred_depth,
        beta_sigma_depth=args.beta_sigma_depth,
        beta_roughness_render=args.beta_roughness_render,
        beta_prior_albedo=args.beta_prior_albedo,
        beta_prior_irradiance=args.beta_prior_irradiance,
        beta_irradiance_reg=args.beta_irradiance_reg,
        n_iter_ignore_normal=args.N_iter_ignore_normal,
        n_iter_ignore_depth=args.N_iter_ignore_depth,
        n_iter_ignore_approximated_radiance=(
            args.N_iter_ignore_approximated_radiance),
        n_iter_ignore_prior=args.N_iter_ignore_prior,
        coarse_radiance_number=args.coarse_radiance_number,
        load_priors=args.load_priors,
        albedo_prior_type=args.albedo_prior_type,
        learn_albedo_from_oracle=args.learn_albedo_from_oracle,
        initialize_roughness=args.initialize_roughness,
        roughness_init=args.roughness_init,
        infer_normal=args.infer_normal,
        infer_normal_target=args.infer_normal_target,
        infer_depth=args.infer_depth,
        depth_map_from_ground_truth=args.depth_map_from_ground_truth,
        train_depth_from_ground_truth=args.train_depth_from_ground_truth,
        freeze_radiance=args.freeze_radiance,
        freeze_roughness=args.freeze_roughness,
    )


def init_variables(key, args, fcfg: FieldConfig) -> dict:
    """Model factory (parity: create_IBLNeRF, ibl_nerf.py:255-335)."""
    keys = iter(jax.random.split(key, 16))
    variables = {"coarse": init_field_params(next(keys), fcfg)}
    if args.N_importance > 0:
        fcfg_fine = fine_field_config_from_args(args, fcfg) or fcfg
        variables["fine"] = init_field_params(next(keys), fcfg_fine)
    in_ch, in_ch_views = fcfg.input_ch, fcfg.input_ch_views
    if args.infer_depth:
        variables["depth_mlp"] = init_position_direction_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, in_ch_views, 1)
    if args.infer_visibility:
        variables["visibility_mlp"] = init_position_direction_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, in_ch_views, 1)
    if args.infer_normal:
        variables["normal_mlp"] = init_position_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, 3)
    if args.infer_albedo_separate:
        variables["albedo_mlp"] = init_position_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, 3)
    if args.infer_roughness_separate:
        variables["roughness_mlp"] = init_position_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, 1)
    if args.infer_irradiance_separate:
        variables["irradiance_mlp"] = init_position_mlp(
            next(keys), args.netdepth, args.netwidth, in_ch, 1)
    if args.use_environment_map:
        from ibl_nerf_tpu.models.envmap import init_envmap

        variables["env_map"] = init_envmap(next(keys), args.N_envmap_size)
    return variables


def _panelize(stack, max_images: int = 4):
    """Image stack (N,H,W,C)/(N,H,W) -> clipped NHWC batch for the
    tensorboard image panels (parity: reference train.py:140-154,
    206-210)."""
    x = np.asarray(stack[:max_images], dtype=np.float32)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return np.clip(x, 0.0, 1.0)


def _load_params(args):
    return {
        "image_scale": args.image_scale,
        "coarse_radiance_number": args.coarse_radiance_number,
        "near_plane": args.near_plane,
        "far_plane": args.far_plane,
        "load_depth_range_from_file": args.load_depth_range_from_file,
        "load_priors": args.load_priors,
        "prior_type": args.prior_type,
    }


def train(args):
    logger = load_logger("train")
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")
    if getattr(args, "use_pallas_train", False):
        # must precede the kernel module import and the first compile:
        # raises the scoped-VMEM cap (24 MB) and defaults the backward
        # tile to the measured-best 512 (RESULTS.md round 5).
        from ibl_nerf_tpu.utils.tpu import configure_pallas_train_env
        configure_pallas_train_env()

    # Multi-host: cli.train already joined the distributed runtime; here
    # we only need to know our coordinates. Non-main processes run the
    # same compute but skip all filesystem/log output.
    pid, pcount = jax.process_index(), jax.process_count()
    is_main = pid == 0
    use_dist = pcount > 1

    # (1) data
    t0 = time.time()
    load_params = _load_params(args)
    if args.dataset_type == "mitsuba":
        load_params.update(load_normal=True, load_albedo=True,
                           load_depth=args.depth_map_from_ground_truth
                           or args.train_depth_from_ground_truth)
    scene = load_scene(args.dataset_type, args.datadir, split="train",
                       **load_params)
    val_params = dict(load_params)
    val_params["load_priors"] = False
    if args.dataset_type == "mitsuba":
        val_params.update(load_albedo=True, load_normal=True,
                          load_irradiance=True, skip=args.testskip or 10)
    else:
        val_params["skip"] = 1
    scene_val = load_scene(args.dataset_type, args.datadir, split="test",
                           **val_params)
    logger.info("data loaded in %.1fs: train %d, val %d imgs (%dx%d)",
                time.time() - t0, len(scene), len(scene_val),
                scene.width, scene.height)

    # (2) logdir
    basedir, expname = args.basedir, args.expname
    logdir = os.path.join(basedir, expname)
    if is_main:
        os.makedirs(logdir, exist_ok=True)
    writer = ScalarWriter(logdir) if is_main else None

    # (3) model + optimizer + restore
    fcfg = field_config_from_args(args)
    rcfg = render_config_from_args(args, fcfg)
    lcfg = loss_config_from_args(args)

    seed = int(getattr(args, "seed", 0) or 0)
    variables = init_variables(jax.random.key(seed), args, fcfg)
    if getattr(args, "init_port_path", None):
        # same-init cross-framework studies: start from a torch
        # reference checkpoint's (possibly initial) weights.
        from ibl_nerf_tpu.utils.port import load_reference_checkpoint

        p_coarse, p_fine, _, _ = load_reference_checkpoint(
            args.init_port_path, fcfg.coarse_radiance_number, fcfg.depth)
        variables["coarse"] = p_coarse
        if p_fine is not None and "fine" in variables:
            variables["fine"] = p_fine
        logger.info("ported initial coarse/fine weights from %s",
                    args.init_port_path)
        # NEVER re-draw a ported init: a same-init cross-framework study
        # must train from exactly these weights, or fail loudly — a
        # silent fresh re-draw would invalidate the study while its
        # report still claims the ported init. Probe and warn instead.
        from ibl_nerf_tpu.train.health import (
            field_density_stats, probe_points_from_scene)

        probe = probe_points_from_scene(scene)
        ffine = fine_field_config_from_args(args, fcfg)
        for name in ("coarse", "fine"):
            if name not in variables:
                continue
            cfg = ffine if (name == "fine" and ffine is not None) else fcfg
            fp, mx = field_density_stats(variables[name], cfg, probe)
            if mx <= 0.0:
                logger.error(
                    "ported %s field init is DEAD (max raw sigma %.3f "
                    "<= 0 over %d scene probe points) — training it "
                    "cannot learn geometry. Keeping it anyway because "
                    "--init_port_path pins the exact weights.",
                    name, mx, len(probe))
    elif not getattr(args, "no_init_rejection", False):
        # ~30% of reference-init draws start with a DEAD density field
        # (raw sigma < 0 everywhere -> zero density gradient forever;
        # measured for both frameworks in scripts/init_mortality.py),
        # and another ~8-14% are NEAR-dead (<1% positive probe points;
        # they train to degraded quality). Deterministically re-draw
        # both basins. Identical on every process (pure function of
        # seed + scene), so multi-host safe.
        from ibl_nerf_tpu.train.health import (
            probe_points_from_scene, reject_dead_inits)

        variables = reject_dead_inits(
            jax.random.fold_in(jax.random.key(seed), 0x5EED),
            variables, fcfg, probe_points_from_scene(scene),
            fcfg_fine=fine_field_config_from_args(args, fcfg),
            min_fracpos=float(getattr(args, "init_reject_fracpos", 0.01)),
            logger=logger)
    consts = {"brdf_lut": jnp.asarray(load_brdf_lut())}

    optimizer = build_optimizer(
        variables, lrate=args.lrate, lrate_decay=args.lrate_decay, lcfg=lcfg,
        group_lr_overrides={"env_map": args.lrate_env_map},
        normal_feeds_shading=(
            args.calculating_normal_type == "inferred_normal_map"))
    state = init_train_state(variables, optimizer)
    elapsed_time = 0.0
    if not args.no_reload:
        state, elapsed_time, found = ckpt_lib.restore_checkpoint(
            logdir, state, ft_path=args.ft_path,
            target_step=args.target_load_N_iter)
        if found:
            logger.info("restored checkpoint at step %d (elapsed %.0fs)",
                        int(state.step), elapsed_time)

    # 0-based update index, matching the reference's trange(start,
    # N_iters) convention exactly: update i is gated by phases via
    # `i >= N_iter_ignore_*` and is the (i+1)-th Adam step. state.step
    # counts completed updates, so a restored run resumes at the first
    # update the checkpoint does NOT contain.
    start = int(state.step)

    # (4) dataset: device-resident single-host; host-side (sharded by
    # image across processes) in multi-host runs.
    include = ("normal", "albedo", "roughness", "depth", "prior_albedo",
               "prior_irradiance")
    if use_dist:
        from ibl_nerf_tpu.data.sampler import host_arrays_from_scene

        arrays = host_arrays_from_scene(scene, include=include)
    else:
        arrays = device_arrays_from_scene(scene, include=include)

    # (5) phase segmentation. Parity: the reference runs
    # `for i in trange(start, N_iter + 1)` (train.py:137,223) — update
    # indices 0..N_iter INCLUSIVE, i.e. a fresh run does N_iter+1 Adam
    # steps and the final weights checkpoint lands exactly at i=N_iter.
    n_iters = args.N_iter + 1
    time_limit_sec = -1.0
    if args.time_limit_in_minute > 0:
        time_limit_sec = args.time_limit_in_minute * 60
        n_iters = 1000000

    boundaries = sorted({
        0, start,
        args.N_iter_ignore_approximated_radiance,
        args.N_iter_ignore_prior,
        args.N_iter_ignore_normal if args.infer_normal else 0,
        args.N_iter_ignore_depth if args.infer_depth else 0,
        args.precrop_iters,
        n_iters,
    })
    boundaries = [b for b in boundaries if start <= b <= n_iters]
    if not boundaries or boundaries[0] != start:
        boundaries.insert(0, start)
    if boundaries[-1] != n_iters:
        boundaries.append(n_iters)

    def _local_state_view():
        """state with host-local leaves — in multi-host runs the live
        state is globally replicated, and checkpointing / testset
        rendering must not launch collective computations from one
        process, so they work on a local numpy copy."""
        if not use_dist:
            return state
        from ibl_nerf_tpu.parallel.distributed import fetch_replicated

        return fetch_replicated(state)

    def save_ckpt(i):
        # ALL processes must call save: orbax runs a cross-process sync
        # inside (process 0 writes, the others participate in the
        # barrier). State is passed as host-local numpy replicas.
        path = ckpt_lib.save_checkpoint(logdir, i, _local_state_view(),
                                        elapsed_time)
        if is_main:
            logger.info("saved checkpoint %s", path)

    def run_testset(i, export_video=False):
        if not is_main:
            return
        from ibl_nerf_tpu.eval.render_path import render_path

        testdir = os.path.join(logdir, f"testset_{i:06d}")
        rcfg_test = rcfg.replace(approximate_radiance=True)
        results = render_path(_local_state_view().variables, consts,
                              scene_val, rcfg_test, savedir=testdir,
                              render_factor=args.render_factor)
        logger.info("saved test set to %s", testdir)
        # held-out collapse check (train/health.py): empty held-out
        # geometry with plausible train loss is the silent failure mode
        # the reference's NaN scans never catch.
        from ibl_nerf_tpu.train.health import (
            check_collapse, testset_acc_coverage)

        coverage = testset_acc_coverage(results)
        if coverage is not None:
            check_collapse(coverage, i, logger, source="held-out testset")
            if writer is not None:
                writer.write(i, {"testset_acc_coverage": coverage})
        # TB image panels: one panel per inferred buffer at every
        # testset dump (parity: reference train.py:206-210).
        if writer is not None:
            for name in ("rgb", "albedo", "roughness", "irradiance",
                         "radiance", "target_normal_map", "depth",
                         "specular", "diffuse"):
                if name in results:
                    writer.write_images(f"testset/{name}",
                                        _panelize(results[name]), i)
        if export_video and "rgb" in results:
            from ibl_nerf_tpu.utils.video import export_stack_as_video

            path = os.path.join(logdir, f"video_{i:06d}.avi")
            export_stack_as_video(results["rgb"], path)
            logger.info("saved video %s", path)

    # Multi-chip: --mesh_devices N>1 shards the ray batch over a 1-D
    # mesh (params replicate; XLA psums grads over ICI). Explicit opt-in
    # so single-chip/CI behavior is unchanged. Multi-host (use_dist):
    # the mesh spans every process's devices, data is host-sharded, and
    # each host samples its shard of every ray batch.
    n_dev = len(jax.devices())
    mesh_n = min(args.mesh_devices, n_dev)
    use_mesh = mesh_n > 1 and args.N_rand % mesh_n == 0
    mesh = None
    if use_dist:
        from ibl_nerf_tpu.parallel import distributed as dist_lib

        use_mesh = False
        mesh = dist_lib.global_mesh()
        logger.info("multi-host: %d processes, %d devices; rays sharded "
                    "over the global mesh, images sharded by host",
                    pcount, mesh.devices.size)
    elif use_mesh:
        from ibl_nerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:mesh_n])
        logger.info("sharding rays over %d devices", mesh_n)

    if writer is not None and start <= 1:
        # gt image panels at step 0 (parity: reference train.py:140-154)
        writer.write_images("gt/rgb", _panelize(scene.images), 0)
        if scene.prefiltered_images is not None:
            for lv in range(scene.prefiltered_images.shape[0]):
                writer.write_images(f"gt/rgb_prefiltered_{lv + 1}",
                                    _panelize(scene.prefiltered_images[lv]), 0)
        for name, buf in scene.gt_buffers().items():
            writer.write_images(f"gt/{name}", _panelize(buf), 0)

    # `--ray_sample patch`: live 8-neighbor patch sampling (the
    # reference parses the flag, builds the neighbor rays and never
    # consumes them — train.py:240-242; here the neighbor depths feed a
    # logged smoothness diagnostic). Single-image mode only (the
    # reference's patch generator is single-image only too).
    use_patch = args.ray_sample == "patch" and args.no_batching
    if args.ray_sample == "patch" and not args.no_batching:
        logger.warning("--ray_sample patch requires --no_batching "
                       "(single-image sampling); ignoring patch mode")

    stop_training = False
    collapse_warned = False  # warn loudly once, keep logging the scalar
    global_step = start
    for seg_start, seg_end in zip(boundaries[:-1], boundaries[1:]):
        if stop_training or seg_start >= seg_end:
            continue
        phase = resolve_phase(seg_start, lcfg)
        precrop = seg_start < args.precrop_iters
        if use_dist:
            sampler = dist_lib.HostShardedSampler(
                arrays, mesh, args.N_rand, scene.height, scene.width,
                precrop=precrop, precrop_frac=args.precrop_frac,
                merged=not args.no_batching)
            gstep_fn, place_state = dist_lib.make_global_train_step(
                rcfg, lcfg, phase, optimizer, consts, args.N_rand,
                prior_irradiance_mean=scene.prior_irradiance_mean,
                near=scene.near, far=scene.far, mesh=mesh,
                n_depth_random_volume=args.N_depth_random_volume)
            state = place_state(state)

            def step_call(state, key, i, _fn=gstep_fn, _s=sampler):
                pixel_info, rays_o, rays_d = _s.sample(i)
                return _fn(state, key, pixel_info, rays_o, rays_d)
        elif use_mesh:
            from ibl_nerf_tpu.parallel.mesh import make_sharded_train_step

            step_fn, place_state, place_arrays = make_sharded_train_step(
                rcfg, lcfg, phase, optimizer, consts,
                scene.height, scene.width, args.N_rand,
                prior_irradiance_mean=scene.prior_irradiance_mean,
                near=scene.near, far=scene.far, mesh=mesh,
                precrop=precrop, precrop_frac=args.precrop_frac,
                merged_sampling=not args.no_batching,
                n_depth_random_volume=args.N_depth_random_volume,
                patch=use_patch)
            state = place_state(state)
            arrays = place_arrays(arrays)

            def step_call(state, key, i, _fn=step_fn):
                return _fn(state, key, arrays)
        else:
            step_fn = make_train_step(
                rcfg, lcfg, phase, optimizer, consts,
                scene.height, scene.width, args.N_rand,
                prior_irradiance_mean=scene.prior_irradiance_mean,
                near=scene.near, far=scene.far,
                precrop=precrop, precrop_frac=args.precrop_frac,
                merged_sampling=not args.no_batching,
                n_depth_random_volume=args.N_depth_random_volume,
                patch=use_patch)

            def step_call(state, key, i, _fn=step_fn):
                return _fn(state, key, arrays)
        logger.info("phase segment [%d, %d): %s", seg_start, seg_end, phase)

        for i in range(seg_start, seg_end):
            it_t0 = time.time()
            key = jax.random.fold_in(jax.random.key(42 + seed), i)
            state, scalars = step_call(state, key, i)

            if i % args.summary_step == 0:
                scalars = jax.device_get(scalars)
                if writer is not None:
                    writer.write(
                        i, {**{k: float(v) for k, v in scalars.items()},
                            "elapsed_time": elapsed_time})
                if is_main:
                    logger.info("iter %d loss %.5f", i,
                                float(scalars["loss_total"]))
                    if "acc_mean" in scalars and i > 0:
                        from ibl_nerf_tpu.train.health import check_collapse

                        hit = check_collapse(
                            float(scalars["acc_mean"]), i,
                            logger if not collapse_warned else None)
                        collapse_warned |= hit

            elapsed_time += time.time() - it_t0
            global_step = i + 1  # completed updates (ref: global_step += 1)

            if time_limit_sec > 0 and elapsed_time > time_limit_sec:
                logger.info("time limit reached (%.0fs)", elapsed_time)
                run_testset(i)
                save_ckpt(i)
                stop_training = True
                break

            if i % args.i_weights == 0:  # parity: ref saves at i=0 too
                save_ckpt(i)
            if i % args.i_testset == 0 and i > 0:
                run_testset(i, export_video=(i % args.i_video == 0))

    if is_main:
        with open(os.path.join(logdir, "train_info_step_time.json"),
                  "w") as f:
            json.dump({"training_time": elapsed_time,
                       "global_step": global_step}, f, indent=4)
    if writer is not None:
        writer.close()
    return state
