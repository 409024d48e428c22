"""Data-parallel sharding over a 1-D `rays` mesh axis.

The reference is strictly single-GPU (SURVEY.md §2.3 — no DDP/NCCL);
distribution here is a first-class TPU-native design: the ray batch
(and every per-ray intermediate: samples, reflected rays, ε-normal rays)
is sharded across chips along axis "rays", params are replicated, and
XLA inserts the gradient `psum` over ICI automatically because the loss
is a mean over the sharded axis under jit-with-shardings. Coarse→fine
importance resampling is per-ray math, so it stays chip-local — no
resharding between passes.

Scaling: rays/s is expected ~linear in chips (the MLP sweeps dominate
and are embarrassingly parallel over rays; the only collective is the
~0.6M-param grad all-reduce, overlapped by XLA with the backward pass).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ibl_nerf_tpu.data.sampler import sample_pixel_batch
from ibl_nerf_tpu.render.renderer import render_rays
from ibl_nerf_tpu.train.step import (
    TrainState,
    loss_from_batch,
    make_optimizer_step,
    phase_render_config,
)


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (axis,))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, axis: str = "rays"):
    return NamedSharding(mesh, P(axis))


def make_sharded_train_step(
    rcfg, lcfg, phase, optimizer, consts, H, W, batch_size,
    prior_irradiance_mean, near, far, mesh: Mesh,
    precrop: bool = False, precrop_frac: float = 0.5,
    merged_sampling: bool = False,
    n_depth_random_volume: int = 256,
    patch: bool = False,
):
    """Jitted SPMD train step: batch sampled on device, rays sharded over
    the mesh, params replicated, grads psum'd by XLA.

    batch_size must divide by mesh size. patch: `--ray_sample patch`
    (see train.step.make_train_step) — the 8-neighbor rays derive from
    local primary rays, so the no-grad neighbor render stays chip-local.
    """
    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    rcfg_phase = phase_render_config(rcfg, phase)

    repl = replicate(mesh)
    rays_sh = shard_rays(mesh)

    # truncate to N_depth_random_volume rays (parity reference
    # train.py:368), keeping divisibility by the mesh
    n_vol = min(n_depth_random_volume, batch_size)
    n_vol -= n_vol % n_dev
    n_vol = max(n_vol, n_dev)

    def loss_fn(variables, key, arrays):
        (k_sample, k_render, k_vol, k_vol_render,
         k_patch) = jax.random.split(key, 5)
        pixel_info, rays_o, rays_d, _, rays_o_n, rays_d_n = \
            sample_pixel_batch(
                k_sample, arrays, batch_size, H, W,
                precrop=precrop, precrop_frac=precrop_frac,
                patch=patch, merged=merged_sampling)
        # Constrain the ray batch (and gt pixels) to the rays axis; all
        # downstream per-ray tensors inherit this sharding.
        rays_o = jax.lax.with_sharding_constraint(rays_o, rays_sh)
        rays_d = jax.lax.with_sharding_constraint(rays_d, rays_sh)
        pixel_info = {k: jax.lax.with_sharding_constraint(v, rays_sh)
                      for k, v in pixel_info.items()}
        total, scalars = loss_from_batch(
            variables, (k_render, k_vol, k_vol_render), consts, pixel_info,
            rays_o, rays_d, rcfg_phase, lcfg, phase, prior_irradiance_mean,
            near, far, n_vol)
        if patch:
            from ibl_nerf_tpu.render.renderer import make_ray_batch

            vars_ng = jax.lax.stop_gradient(variables)
            ro = jax.lax.with_sharding_constraint(
                rays_o_n.reshape(-1, 3), rays_sh)
            rd = jax.lax.with_sharding_constraint(
                rays_d_n.reshape(-1, 3), rays_sh)
            nres = render_rays(k_patch, vars_ng, consts,
                               make_ray_batch(ro, rd, near, far),
                               rcfg_phase, is_depth_only=True)
            ndepth = nres["depth_map"].reshape(batch_size, 8)
            scalars = dict(scalars)
            scalars["patch_depth_smoothness"] = jax.numpy.mean(
                jax.numpy.std(ndepth, axis=-1))
        return total, scalars

    train_step = make_optimizer_step(optimizer)(loss_fn)

    def place_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl)

    def place_arrays(arrays: dict[str, Any]) -> dict[str, Any]:
        return jax.device_put(arrays, repl)

    return train_step, place_state, place_arrays


def make_sharded_render_fn(mesh: Mesh, variables, consts, rcfg):
    """Jitted chunk renderer with rays sharded over the mesh — full-image
    evaluation fans out across all chips (pass to
    render_image/render_path via `render_fn`; use chunk = per-chip-chunk
    * mesh size). All per-ray work stays chip-local; outputs gather on
    host at image assembly, the only cross-chip data motion.
    """
    rays_sh = shard_rays(mesh)
    repl = replicate(mesh)
    variables = jax.device_put(variables, repl)
    consts = jax.device_put(consts, repl)

    @jax.jit
    def render_fn(key, batch, gt):
        batch = {k: jax.lax.with_sharding_constraint(v, rays_sh)
                 for k, v in batch.items()}
        if gt is not None:
            gt = {k: jax.lax.with_sharding_constraint(v, rays_sh)
                  for k, v in gt.items()}
        return render_rays(key, variables, consts, batch, rcfg, gt_values=gt)

    return render_fn
