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

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ibl_nerf_tpu.data.sampler import sample_pixel_batch
from ibl_nerf_tpu.render.renderer import make_ray_batch, render_rays
from ibl_nerf_tpu.train.losses import compute_losses
from ibl_nerf_tpu.train.step import TrainState


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
):
    """Jitted SPMD train step: batch sampled on device, rays sharded over
    the mesh, params replicated, grads psum'd by XLA.

    batch_size must divide by mesh size.
    """
    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    rcfg_phase = rcfg.replace(
        approximate_radiance=phase.approximate_radiance,
        freeze_radiance=phase.freeze_radiance,
        freeze_roughness=phase.freeze_roughness,
    )

    repl = replicate(mesh)
    rays_sh = shard_rays(mesh)

    def loss_fn(variables, key, arrays):
        k_sample, k_render, k_vol, k_vol_render = jax.random.split(key, 4)
        pixel_info, rays_o, rays_d, _, _, _ = sample_pixel_batch(
            k_sample, arrays, batch_size, H, W,
            precrop=precrop, precrop_frac=precrop_frac,
            merged=merged_sampling)
        # Constrain the ray batch (and gt pixels) to the rays axis; all
        # downstream per-ray tensors inherit this sharding.
        rays_o = jax.lax.with_sharding_constraint(rays_o, rays_sh)
        rays_d = jax.lax.with_sharding_constraint(rays_d, rays_sh)
        pixel_info = {k: jax.lax.with_sharding_constraint(v, rays_sh)
                      for k, v in pixel_info.items()}
        batch = make_ray_batch(rays_o, rays_d, near, far)
        result = render_rays(k_render, variables, consts, batch, rcfg_phase,
                             gt_values=pixel_info)

        # Depth-distillation random-volume pass (chip-local: volume rays
        # derive from local primary rays — no resharding).
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
            # truncate to N_depth_random_volume rays (parity step.py /
            # reference train.py:368), keeping divisibility by the mesh
            n_vol = min(n_depth_random_volume, batch_size)
            n_vol -= n_vol % mesh.devices.size
            n_vol = max(n_vol, mesh.devices.size)
            vol_batch = make_ray_batch(x_surface[:n_vol], rand_dir[:n_vol],
                                       near, far)
            depth_volume_result = render_rays(
                k_vol_render, variables, consts, vol_batch, rcfg_phase,
                is_depth_only=True)
            depth_volume_result["depth_map"] = jax.lax.stop_gradient(
                depth_volume_result["depth_map"])

        total, scalars = compute_losses(
            result, pixel_info, lcfg, phase, prior_irradiance_mean, far,
            depth_volume_result=depth_volume_result)
        return total, scalars

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, key, arrays):
        (_, scalars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.variables, key, arrays)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.variables)
        new_vars = optax.apply_updates(state.variables, updates)
        return (
            TrainState(variables=new_vars, opt_state=new_opt,
                       step=state.step + 1),
            scalars,
        )

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
