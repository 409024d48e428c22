"""The jitted train step: on-device sampling -> render -> loss -> Adam.

Parity: the reference hot loop (/root/reference/src/train.py:223-521)
with named Adam param groups and per-group exponential LR decay with
start offsets (train.py:483-498).

TPU-first: ONE jit covers pixel sampling, coarse+fine+reflected+normal
field sweeps, loss, backward and the optimizer update — the reference
crosses host<->device every iteration for batch assembly and chunks the
forward into 1024-ray pieces. Gradients are rematerialized
(jax.checkpoint over the field query) to keep HBM small, and under a
multi-chip mesh the batch is sharded over a 'rays' axis with params
replicated — XLA inserts the psum gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ibl_nerf_tpu.data.sampler import sample_pixel_batch
from ibl_nerf_tpu.render.config import RenderConfig
from ibl_nerf_tpu.render.renderer import make_ray_batch, render_rays
from ibl_nerf_tpu.train.losses import LossConfig, Phase, compute_losses


@struct.dataclass
class TrainState:
    variables: Any           # dict of named param groups
    opt_state: Any
    step: jnp.ndarray        # global step (int32 scalar)


# Per-group LR decay start offsets (train.py:492-498); decay factor 0.1
# over lrate_decay*1000 steps from each group's start count.
GROUP_START_KEYS = {
    "coarse": 0,
    "fine": 0,
    "depth_mlp": "n_iter_ignore_depth",
    "normal_mlp": "n_iter_ignore_normal",
    "albedo_mlp": "n_iter_ignore_approximated_radiance",
    "roughness_mlp": "n_iter_ignore_approximated_radiance",
    "irradiance_mlp": "n_iter_ignore_approximated_radiance",
    "visibility_mlp": 0,
}


def _group_schedule(lrate: float, decay_steps: float, start: int):
    def sched(count):
        count = jnp.maximum(count, 0)
        # Parity (train.py:483-498): the reference calls set_lr AFTER
        # optimizer.step(), so the Adam step at iteration i uses the LR
        # computed from global_step = i-1 — and only when that exceeds
        # the group's start count. Hence the extra -1 in the exponent:
        # update #c (0-based count c) runs at lrate*0.1^(max(c-1-start,
        # 0)/decay_steps). Below/at the start the exponent clamps to 0.
        exponent = jnp.maximum(count - 1 - start, 0) / decay_steps
        return lrate * jnp.power(0.1, exponent)
    return sched


def _delayed_start(inner, start: int):
    """Freeze a param group's optimizer until its loss first activates.

    Parity: reference aux MLPs have `.grad is None` until their gated
    loss first backpropagates (torch's zero_grad only zeroes grads that
    exist), and torch.optim.Adam SKIPS None-grad params — their Adam
    step count / moments start evolving at the group's start iteration.
    optax instead sees explicit zero gradients from the first step,
    which would advance the bias-correction count and decay the
    schedule early. This wrapper reproduces the torch semantics
    exactly: zero updates and a frozen inner state while the global
    update count < start; from `start` on, the inner chain evolves from
    t=1 (fresh bias correction), and its schedule sees only
    post-activation counts (matching set_lr(name, start)'s
    (global_step - start) exponent).
    """
    if start <= 0:
        return inner

    def init_fn(params):
        return (jnp.zeros((), jnp.int32), inner.init(params))

    def update_fn(updates, state, params=None):
        n, inner_state = state

        def run(_):
            return inner.update(updates, inner_state, params)

        def skip(_):
            return jax.tree.map(jnp.zeros_like, updates), inner_state

        new_updates, new_inner = jax.lax.cond(n >= start, run, skip, None)
        return new_updates, (n + 1, new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(variables: dict, lrate: float = 5e-4,
                    lrate_decay: int = 250, lcfg: LossConfig | None = None,
                    group_lr_overrides: dict[str, float] | None = None,
                    normal_feeds_shading: bool = False):
    """Named-group Adam with per-group exponential schedules.

    group_lr_overrides: per-group base LR (e.g. env_map's lrate_env_map,
    parity ibl_nerf.py:334).
    normal_feeds_shading: True when the renderer's normal_type is
    'inferred_normal_map' — the normal MLP then receives shading
    gradients before its own loss activates, so its optimizer must not
    be start-delayed (only its LR schedule keeps the start offset).
    """
    decay_steps = lrate_decay * 1000.0
    overrides = group_lr_overrides or {}

    transforms = {}
    for name in variables:
        start_spec = GROUP_START_KEYS.get(name, 0)
        if isinstance(start_spec, str):
            start = getattr(lcfg, start_spec) if lcfg is not None else 0
        else:
            start = start_spec
        lr0 = overrides.get(name, lrate)
        # Groups whose params are grad-free in the reference until their
        # start iteration get the frozen-until-start treatment (torch
        # skips None-grad params). Exceptions where grads flow earlier:
        # roughness_mlp under initialize_roughness (its init loss runs
        # from step 0, train.py:421-422) and normal_mlp when the
        # inferred normal feeds shading.
        delay = start
        if name == "roughness_mlp" and lcfg is not None and lcfg.initialize_roughness:
            delay = 0
        if name == "normal_mlp" and normal_feeds_shading:
            delay = 0
        inner = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_schedule(
                _group_schedule(lr0, decay_steps,
                                0 if delay > 0 else start)),
            optax.scale(-1.0),
        )
        transforms[name] = _delayed_start(inner, delay)

    labels = {name: name for name in variables}
    return optax.multi_transform(transforms, labels)


def init_train_state(variables: dict, optimizer, step: int = 0) -> TrainState:
    return TrainState(
        variables=variables,
        opt_state=optimizer.init(variables),
        step=jnp.asarray(step, jnp.int32),
    )


def loss_from_batch(variables, keys, consts, pixel_info, rays_o, rays_d,
                    rcfg_phase: RenderConfig, lcfg: LossConfig, phase: Phase,
                    prior_irradiance_mean: float, near, far, n_vol: int):
    """Render + depth-distillation volume pass + loss for an
    already-sampled pixel batch. Shared by the single-chip, sharded, and
    multi-host train steps (parity: the loss assembly of the reference
    hot loop, /root/reference/src/train.py:286-441).

    keys: (k_render, k_vol, k_vol_render).
    n_vol: depth random-volume ray count (already rounded for mesh
    divisibility by the caller; parity train.py:368).
    """
    k_render, k_vol, k_vol_render = keys
    batch = make_ray_batch(rays_o, rays_d, near, far)
    result = render_rays(k_render, variables, consts, batch, rcfg_phase,
                         gt_values=pixel_info)

    # Depth distillation random-volume pass (NeRV-style; parity:
    # train.py:347-381): rays from the detached expected surface points
    # along random normal-aligned directions, depth-only. Chip-local
    # under a mesh: volume rays derive from local primary rays.
    depth_volume_result = None
    if phase.depth_loss_on and "normal" in pixel_info:
        normal_map = pixel_info["normal"] * 2.0 - 1.0
        normal_map = normal_map / jnp.maximum(
            jnp.linalg.norm(normal_map, axis=-1, keepdims=True), 1e-12)
        x_surface = jax.lax.stop_gradient(
            rays_o + rays_d * result["depth_map"][..., None])
        rand_dir = 2.0 * jax.random.uniform(k_vol, rays_d.shape) - 1.0
        sign = jnp.sign(jnp.sum(rand_dir * normal_map, -1))[..., None]
        rand_dir = sign * rand_dir
        rand_dir = rand_dir / jnp.maximum(
            jnp.linalg.norm(rand_dir, axis=-1, keepdims=True), 1e-12)
        vol_batch = make_ray_batch(x_surface[:n_vol], rand_dir[:n_vol],
                                   near, far)
        depth_volume_result = render_rays(
            k_vol_render, variables, consts, vol_batch, rcfg_phase,
            is_depth_only=True)
        depth_volume_result["depth_map"] = jax.lax.stop_gradient(
            depth_volume_result["depth_map"])

    return compute_losses(
        result, pixel_info, lcfg, phase, prior_irradiance_mean, far,
        depth_volume_result=depth_volume_result)


def phase_render_config(rcfg: RenderConfig, phase: Phase) -> RenderConfig:
    """Specialize the render config to a training phase."""
    return rcfg.replace(
        approximate_radiance=phase.approximate_radiance,
        freeze_radiance=phase.freeze_radiance,
        freeze_roughness=phase.freeze_roughness,
    )


def make_optimizer_step(optimizer, donate: bool = True):
    """Wrap a loss_fn(variables, key, *batch) into a jitted Adam step."""
    def build(loss_fn):
        @partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state: TrainState, key, *batch_args):
            (_, scalars), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.variables, key, *batch_args)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.variables)
            new_vars = optax.apply_updates(state.variables, updates)
            return (
                TrainState(variables=new_vars, opt_state=new_opt,
                           step=state.step + 1),
                scalars,
            )
        return train_step
    return build


def make_train_step(
    rcfg: RenderConfig,
    lcfg: LossConfig,
    phase: Phase,
    optimizer,
    consts: dict,
    H: int,
    W: int,
    batch_size: int,
    prior_irradiance_mean: float,
    near: float,
    far: float,
    precrop: bool = False,
    precrop_frac: float = 0.5,
    merged_sampling: bool = False,
    n_depth_random_volume: int = 256,
    donate: bool = True,
    patch: bool = False,
):
    """Build the jitted train step for one phase.

    The render config is specialized to the phase (approximate_radiance,
    freezing); one compiled program per phase.

    patch: `--ray_sample patch` mode — pixels are drawn from [1, H-1)x
    [1, W-1) and the 8-neighbor rays are built exactly as the
    reference's sample generator does (generator_utils.py:100-147).
    The reference then never consumes them (train.py:240-242 builds
    batch_rays_neigh and drops it); here they are rendered depth-only
    under stop_gradient and logged as a `patch_depth_smoothness`
    diagnostic scalar (mean per-patch neighbor-depth std) — the
    optimization trajectory is unchanged by construction.
    """
    rcfg_phase = phase_render_config(rcfg, phase)

    if phase.normal_loss_on and not phase.approximate_radiance:
        from ibl_nerf_tpu.utils.logging import load_logger

        load_logger("train").warning(
            "inferred-normal loss is active but approximate_radiance is "
            "off for this phase — no normal estimator runs, so the loss "
            "is 0 until step %d",
            lcfg.n_iter_ignore_approximated_radiance)

    n_vol = min(n_depth_random_volume, batch_size)

    def loss_fn(variables, key, arrays):
        (k_sample, k_render, k_vol, k_vol_render,
         k_patch) = jax.random.split(key, 5)
        pixel_info, rays_o, rays_d, _, rays_o_n, rays_d_n = \
            sample_pixel_batch(
                k_sample, arrays, batch_size, H, W,
                precrop=precrop, precrop_frac=precrop_frac,
                patch=patch, merged=merged_sampling)
        total, scalars = loss_from_batch(
            variables, (k_render, k_vol, k_vol_render), consts, pixel_info,
            rays_o, rays_d, rcfg_phase, lcfg, phase, prior_irradiance_mean,
            near, far, n_vol)
        if patch:
            # no-grad depth render of the 8-neighbor rays (B*8 flat,
            # ray-major so it shards chip-local under a mesh)
            vars_ng = jax.lax.stop_gradient(variables)
            nb = make_ray_batch(rays_o_n.reshape(-1, 3),
                                rays_d_n.reshape(-1, 3), near, far)
            nres = render_rays(k_patch, vars_ng, consts, nb, rcfg_phase,
                               is_depth_only=True)
            ndepth = nres["depth_map"].reshape(batch_size, 8)
            scalars = dict(scalars)
            scalars["patch_depth_smoothness"] = jnp.mean(
                jnp.std(ndepth, axis=-1))
        return total, scalars

    return make_optimizer_step(optimizer, donate=donate)(loss_fn)
