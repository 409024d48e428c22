"""Reference-compatible config front end.

Parity: /root/reference/src/config_parser.py — the same flag set and
the same recursive `include=` chain semantics (child config lists one
parent; deeper files win), on plain argparse (configargparse is not
available here; we implement its config-file behavior: `key = value`
lines feed argparse defaults, CLI flags override).

Config file syntax accepted: `key = value`, bare `flag` lines (set a
store_true flag), `#` comments; `true/false` for booleans; repeated
keys for append actions.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def parse_config_file(path: str) -> list[tuple[str, str | None]]:
    """Returns ordered (key, value-or-None) pairs from a config file."""
    pairs = []
    with open(path) as fp:
        for line in fp:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                pairs.append((k.strip(), v.strip()))
            else:
                pairs.append((line.strip(), None))
    return pairs


def load_include_chain(config_file: str) -> list[str]:
    """Walk the `include=` chain upward (nearest file last when
    reversed; parity: config_parser.py:6-26)."""
    chain = []
    current = config_file
    while True:
        include = None
        for k, v in parse_config_file(current):
            if k == "include" and v:
                include = v
                break
        if include is None:
            return chain
        parent = os.path.join(Path(current).parent, include)
        chain.append(parent)
        current = parent


# Reference flags we intentionally drop: all are dead in the reference
# itself (parsed by config_parser.py:29-273 but never read outside it —
# the instance-decomposition / LLFF remnants; verified by grep, see
# PARITY.md). Keys in this set are skipped silently so verbatim
# reference configs parse without warning spam; any OTHER unknown key is
# a likely typo and gets a loud warning (a typo'd `N_importence` must
# not silently run the experiment with defaults).
REFERENCE_DEAD_FLAGS = frozenset({
    "CE_weight_type", "N_iter_ignore_instancewise_constant",
    "N_iter_ignore_smooth", "albedo_instance_constant", "albedo_smooth",
    "alpha_th", "beta_indirect", "beta_instance",
    "beta_instancewise_constant", "beta_mod", "beta_res",
    "beta_sparse_base", "decompose_mode", "decompose_target", "factor",
    "half_res", "instance_label_dimension", "instance_label_encoding",
    "instance_loss_weight", "instance_mask", "instance_th",
    "irradiance_instance_constant", "irradiance_smooth", "llffhold",
    "no_ndc", "render_decompose", "roughness_smooth", "spherify",
    "use_basecolor_score_feature_layer", "use_illumination_feature_layer",
    "use_instance_feature_layer",
})


def _coerce(action: argparse.Action, value: str | None):
    if isinstance(action, (argparse._StoreTrueAction,)):
        if value is None:
            return True
        return value.strip().lower() in ("true", "1", "yes")
    if value is None:
        return True
    t = action.type or str
    if isinstance(action, argparse._AppendAction):
        # configargparse list syntax: `key = [a, b, c]` or repeated keys.
        items = value.strip()
        if items.startswith("[") and items.endswith("]"):
            items = items[1:-1]
            parts = [s.strip() for s in items.split(",") if s.strip()]
        else:
            parts = [items]
        return [t(s) if t is not str else s for s in parts]
    return t(value)


def apply_config_defaults(parser: argparse.ArgumentParser, files: list[str]):
    """Apply config files as parser defaults, later files win.

    Unknown keys: known-dead reference flags (REFERENCE_DEAD_FLAGS) are
    skipped silently; anything else warns with file + key so config
    typos can't silently no-op.
    """
    actions = {a.dest: a for a in parser._actions}
    for f in files:
        updates: dict = {}
        for k, v in parse_config_file(f):
            if k in ("include", "config"):
                continue
            a = actions.get(k)
            if a is None:
                if k not in REFERENCE_DEAD_FLAGS:
                    import warnings

                    warnings.warn(
                        f"config {f}: unknown key '{k}' ignored "
                        f"(typo? it matches no flag)", stacklevel=2)
                continue
            val = _coerce(a, v)
            if isinstance(a, argparse._AppendAction):
                updates.setdefault(k, [])
                if isinstance(val, list):
                    updates[k].extend(val)
                else:
                    updates[k].append(val)
            else:
                updates[k] = val
        parser.set_defaults(**updates)


def build_parser() -> argparse.ArgumentParser:
    """The full reference flag set (config_parser.py:29-273)."""
    p = argparse.ArgumentParser("ibl_nerf_tpu")
    add = p.add_argument

    add("--config", type=str, help="config file path")
    add("--include", type=str, default=None)

    add("--expname", type=str, default=None)
    add("--basedir", type=str, default="./logs/")
    add("--export_basedir", type=str, default=None)
    add("--datadir", type=str, default="./data/llff/fern")

    add("--calculate_in_linear_rgb", action="store_true")
    add("--image_scale", type=float, default=1.0)
    add("--load_depth_range_from_file", action="store_true")

    add("--N_iter", type=int, default=200000)
    add("--target_load_N_iter", type=int, default=-1)

    add("--netdepth", type=int, default=8)
    add("--netwidth", type=int, default=256)
    add("--netdepth_fine", type=int, default=8)
    add("--netwidth_fine", type=int, default=256)
    # The reference accepts netdepth_fine/netwidth_fine but never reads
    # them (create_IBLNeRF builds both models from netdepth/netwidth,
    # ibl_nerf.py:266-286). Opt in to actually honor them:
    add("--use_fine_arch_flags", action="store_true")
    add("--N_rand", type=int, default=32 * 32 * 4)
    add("--ray_sample", type=str, default="pixel")
    add("--N_depth_random_volume", type=int, default=256)

    add("--N_iter_ignore_normal", type=int, default=15000)
    add("--N_iter_ignore_depth", type=int, default=15000)
    add("--N_iter_ignore_approximated_radiance", type=int, default=5000)
    add("--N_iter_ignore_prior", type=int, default=10000)

    add("--coarse_radiance_number", type=int, default=0)

    add("--beta_render", type=float, default=1.0)
    add("--beta_inferred_normal", type=float, default=0.1)
    add("--beta_albedo_render", type=float, default=1.0)
    add("--beta_radiance_render", type=float, default=1.0)
    add("--beta_inferred_depth", type=float, default=1.0)
    add("--beta_sigma_depth", type=float, default=1.0)
    add("--beta_roughness_render", type=float, default=1.0)
    add("--beta_prior_albedo", type=float, default=0.01)
    add("--beta_prior_irradiance", type=float, default=0.0)
    add("--beta_irradiance_reg", type=float, default=0.0)

    add("--color_independent_to_direction", action="store_true")
    add("--initialize_roughness", action="store_true")
    add("--freeze_roughness", action="store_true")
    add("--correct_depth_for_prefiltered_radiance_infer", action="store_true")
    add("--roughness_init", type=float, default=0.5)

    add("--infer_albedo_separate", action="store_true")
    add("--infer_roughness_separate", action="store_true")
    add("--infer_irradiance_separate", action="store_true")

    add("--gamma_correct", action="store_true")
    add("--freeze_radiance", action="store_true")

    add("--albedo_multiplier", type=float, default=1.0)
    add("--load_priors", action="store_true")
    add("--prior_type", type=str, default="bell")
    add("--albedo_prior_type", type=str, default="rgb")

    add("--lrate", type=float, default=5e-4)
    add("--lrate_decay", type=int, default=250)
    add("--chunk", type=int, default=1024 * 16)
    add("--netchunk", type=int, default=1024 * 64)
    add("--no_batching", action="store_true")
    add("--no_reload", action="store_true")
    add("--ft_path", type=str, default=None)

    add("--N_samples", type=int, default=64)
    add("--N_importance", type=int, default=0)
    add("--perturb", type=float, default=1.0)
    add("--use_viewdirs", action="store_true")
    add("--i_embed", type=int, default=0)
    add("--multires", type=int, default=10)
    add("--multires_views", type=int, default=4)
    add("--raw_noise_std", type=float, default=0.0)

    add("--render_only", action="store_true")
    add("--render_test", action="store_true")
    add("--render_factor", type=int, default=1)

    add("--infer_normal", action="store_true")
    add("--infer_normal_at_surface", action="store_true")
    add("--infer_normal_target", type=str,
        default="normal_map_from_sigma_gradient")
    add("--infer_depth", action="store_true")
    add("--use_radiance_linear", action="store_true")
    add("--infer_visibility", action="store_true")

    add("--use_gradient_for_incident_radiance", action="store_true")
    add("--use_environment_map", action="store_true")
    add("--N_envmap_size", type=int, default=16)
    add("--lrate_env_map", type=float, default=5e-4)
    add("--use_monte_carlo_integration", action="store_true")
    add("--monte_carlo_integration_method", type=str, default="surface")

    add("--learn_normal_from_oracle", action="store_true")
    add("--learn_albedo_from_oracle", action="store_true")

    add("--calculate_irradiance_from_gt", action="store_true")
    add("--calculate_roughness_from_gt", action="store_true")
    add("--calculate_albedo_from_gt", action="store_true")
    add("--roughness_exp_coefficient", type=float, default=1.0)

    add("--calculate_all_analytic_normals", action="store_true")
    add("--calculating_normal_type", type=str, default="ground_truth")

    add("--N_hemisphere_sample_sqrt", type=int, default=16)
    add("--depth_map_from_ground_truth", action="store_true")
    add("--train_depth_from_ground_truth", action="store_true")
    add("--lut_coefficient", type=str, default="F")
    # Shading estimator (ours; the reference ships Microfacet/hemisphere
    # samplers but only ever shades via split-sum):
    add("--shading_mode", type=str, default="split_sum",
        choices=["split_sum", "monte_carlo"])
    add("--mc_samples_axis", type=int, default=3)

    add("--precrop_iters", type=int, default=0)
    add("--precrop_frac", type=float, default=0.5)
    add("--epsilon_for_numerical_normal", type=float, default=0.01)
    add("--epsilon_direction_for_numerical_normal", type=float, default=0.005)
    add("--time_limit_in_minute", type=float, default=-1)

    add("--extract_mesh", action="store_true")

    add("--dataset_type", type=str, default="mitsuba")
    add("--testskip", type=int, default=8)
    add("--near_plane", type=float, default=1.0)
    add("--far_plane", type=float, default=20.0)
    add("--white_bkgd", action="store_true")
    add("--lindisp", action="store_true")

    add("--summary_step", type=int, default=100)
    add("--i_print", type=int, default=100)
    add("--i_img", type=int, default=500)
    add("--i_weights", type=int, default=10000)
    add("--i_testset", type=int, default=50000)
    add("--i_video", type=int, default=50000)

    # editing
    add("--edit_intrinsic", action="store_true")
    add("--editing_img_idx", type=int, default=0)
    add("--edit_roughness", action="store_true")
    add("--edit_albedo", action="store_true")
    add("--edit_normal", action="store_true")
    add("--edit_depth", action="store_true")
    add("--num_edit_objects", type=int, default=1)
    add("--edit_albedo_by_img", action="store_true")
    add("--edit_normal_by_img", action="store_true")
    add("--edit_roughness_by_img", action="store_true")
    add("--edit_irradiance_by_img", action="store_true")
    add("--editing_target_roughness_list", type=float, action="append")
    add("--editing_target_albedo_list", type=float, action="append")
    add("--editing_target_irradiance_list", type=float, action="append")

    # inserting
    add("--insert_object", action="store_true")
    add("--inserting_img_idx", type=int, default=0)
    add("--num_insert_objects", type=int, default=1)
    add("--inserting_target_roughness_list", type=float, action="append")
    add("--inserting_target_albedo_list", type=float, action="append")
    add("--inserting_target_irradiance_list", type=float, action="append")

    # TPU-native additions
    add("--seed", type=int, default=0,
        help="init + per-iter PRNG seed (multi-seed convergence studies)")
    # bf16_grad is the default training mode: full-bf16 fwd+bwd speed,
    # f32 no-grad sweeps, f32-accumulated raw head outputs. Multi-seed
    # 10k study (RESULTS.md): >= f32 quality on every buffer at
    # ~1.25x the throughput. float32 remains the strict-parity mode.
    add("--compute_dtype", type=str, default="bf16_grad",
        help="float32 | bfloat16 (MXU fast path) | mixed (f32 grads, "
             "bf16 no-grad sweeps) | bf16_grad (bf16 grads, f32 sweeps) "
             "| amp (f32 storage/grads, bf16 MXU passes w/ f32 accum)")
    add("--use_pallas", action="store_true",
        help="Pallas fused-field kernel on the no-grad sweeps "
             "(parity with XLA on v5e — kept as an opt-in lever for "
             "other topologies; see RESULTS.md)")
    add("--use_pallas_train", action="store_true",
        help="fused fwd+bwd custom-vjp Pallas kernel on the gradient "
             "path; the trainer raises the scoped-VMEM cap to 24 MB "
             "and uses the measured-best 512 backward tile (~12% "
             "faster step than XLA's schedule in both normal modes — "
             "RESULTS.md round 5; grad-parity-tested)")
    add("--mesh_devices", type=int, default=0,
        help="0 = all local devices; N = first N")
    add("--coordinator_address", type=str, default=None,
        help="jax.distributed coordinator host:port (multi-host runs)")
    add("--num_processes", type=int, default=0,
        help=">1 joins a multi-host run (requires --process_id; "
             "data is sharded by host, rays by device)")
    add("--process_id", type=int, default=-1,
        help="this process's index in a multi-host run")
    add("--debug_nans", action="store_true",
        help="enable jax_debug_nans (TPU-native analogue of the "
             "reference's autograd anomaly mode + NaN output scans)")
    add("--init_port_path", type=str, default=None,
        help="torch reference .tar checkpoint whose coarse/fine state "
             "dicts are PORTED (utils/port.py) as this run's initial "
             "weights — same-init cross-framework comparisons")
    add("--no_init_rejection", action="store_true",
        help="disable dead-init rejection (train/health.py): by default "
             "a density field whose init has raw sigma < 0 over the "
             "whole scene volume (~30%% of reference-init draws; dead "
             "under ReLU forever) is deterministically re-drawn")
    add("--init_reject_fracpos", type=float, default=0.01,
        help="init rejection also re-draws NEAR-dead fields whose "
             "fraction of positive-raw-sigma scene probe points is below "
             "this floor (measured: another ~8-14%% of draws; they train "
             "to degraded quality, e.g. the reference's anchor seed 4 at "
             "22.2 dB). 0 restores the round-4 dead-only gate")
    return p


def parse_with_includes(argv=None) -> argparse.Namespace:
    """Parse CLI args; when --config is given, resolve its include
    chain and apply (root-first) as defaults. CLI flags win."""
    pre = build_parser()
    args, _ = pre.parse_known_args(argv)

    parser = build_parser()
    if args.config:
        chain = load_include_chain(args.config)
        files = list(reversed(chain)) + [args.config]
        apply_config_defaults(parser, files)
    out = parser.parse_args(argv)

    if out.expname is None and out.config:
        out.expname = os.path.splitext(os.path.basename(out.config))[0]
    return out


def export_config(args: argparse.Namespace, basedir: str):
    """Dump resolved args + the raw config into the logdir (parity:
    config_parser.py:276-289)."""
    expdir = os.path.join(basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    if args.config:
        with open(os.path.join(expdir, "config.txt"), "w") as f:
            f.write(open(args.config).read())
