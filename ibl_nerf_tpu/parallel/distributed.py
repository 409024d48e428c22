"""Multi-host SPMD: process-spanning mesh, host-sharded data pipeline,
and a global train step.

The reference is strictly single-GPU (SURVEY.md §2.3 — no DDP/NCCL/MPI
anywhere); multi-host distribution is this build's TPU-native design:

 - `initialize()` wraps `jax.distributed.initialize` so every host joins
   one JAX runtime; the device mesh then spans all processes and the
   gradient all-reduce rides ICI/DCN via the XLA collectives jit inserts
   for the sharded-mean loss.
 - Data is sharded BY HOST: each process keeps only its slice of the
   image stack (`images[pid::pcount]`) and samples its shard of the
   global ray batch from those host-local arrays
   (`HostShardedSampler`) — no host ever materializes the full dataset
   batch, and the global batch is assembled zero-copy with
   `jax.make_array_from_process_local_data`.
 - `make_global_train_step` consumes the pre-sampled global batch; all
   per-ray work (coarse→fine resampling, ε-normal sweeps, reflected
   march) stays chip-local, so the ONLY collective is the parameter
   gradient psum.

Validated without TPU pods by `tests/test_multiprocess.py`: two
localhost processes × 4 virtual CPU devices (gloo collectives) must
produce the same losses/params as a single-process run that emulates the
same per-host sampling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ibl_nerf_tpu.data.sampler import sample_pixel_batch
from ibl_nerf_tpu.train.step import (
    loss_from_batch,
    make_optimizer_step,
    phase_render_config,
)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               cpu_collectives: str = "gloo") -> tuple[int, int]:
    """Join the multi-process JAX runtime; no-op for single process.

    Returns (process_index, process_count). On CPU (the multi-process
    test rig) cross-process collectives need the gloo backend, which
    must be configured before the backend initializes.
    """
    if num_processes is None or num_processes <= 1:
        return 0, 1
    try:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    except Exception:
        pass  # flag absent or backend already chosen — TPU doesn't need it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "rays") -> Mesh:
    """1-D mesh over every device of every process (process 0's devices
    first — jax.devices() global order)."""
    return Mesh(np.asarray(jax.devices()).reshape(-1), (axis,))


def put_replicated(tree, mesh: Mesh):
    """Place a host-identical pytree fully replicated on a (possibly
    process-spanning) mesh. Works in both single- and multi-process:
    each process supplies the full value and contributes its addressable
    replicas."""
    repl = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    return jax.tree.map(put, tree)


def _slice_host_arrays(arrays: dict[str, Any], pid: int, pcount: int):
    """This host's image shard: image-indexed buffers keep rows
    [pid::pcount]; the intrinsic matrix K is shared."""
    local = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if k == "K":
            local[k] = v
        elif k == "prefiltered_images":  # (levels, N, H, W, 3)
            local[k] = v[:, pid::pcount]
        else:  # (N, H, W, C) / (N, 4, 4)
            local[k] = v[pid::pcount]
    return local


class HostShardedSampler:
    """Per-host pixel-batch sampling from host-local data.

    Each process samples batch_size/process_count rays from ITS image
    shard with a process-folded PRNG stream, then the shards assemble
    into one global `rays`-sharded array. Deterministic: step i on
    process p always draws from fold_in(fold_in(key(seed), i), p), so a
    run is reproducible across restarts and emulatable single-process
    (the correctness test exploits this).
    """

    def __init__(self, arrays: dict[str, Any], mesh: Mesh, batch_size: int,
                 H: int, W: int, process_index: int | None = None,
                 process_count: int | None = None, precrop: bool = False,
                 precrop_frac: float = 0.5, merged: bool = False,
                 seed: int = 42):
        pid = jax.process_index() if process_index is None else process_index
        pcount = (jax.process_count() if process_count is None
                  else process_count)
        assert batch_size % pcount == 0, (batch_size, pcount)
        self.mesh = mesh
        self.pid, self.pcount = pid, pcount
        self.local_batch = batch_size // pcount
        self._key0 = jax.random.key(seed)
        self._rays_sh = NamedSharding(mesh, P("rays"))

        local = _slice_host_arrays(arrays, pid, pcount)
        n_local = local["images"].shape[0]
        assert n_local > 0, f"process {pid} has no images (pcount={pcount})"
        self._local_arrays = {k: jnp.asarray(v) for k, v in local.items()}

        def _sample(key):
            pixel_info, rays_o, rays_d, _, _, _ = sample_pixel_batch(
                key, self._local_arrays, self.local_batch, H, W,
                precrop=precrop, precrop_frac=precrop_frac, merged=merged)
            return pixel_info, rays_o, rays_d

        self._sample_jit = jax.jit(_sample)

    def step_key(self, step: int):
        return jax.random.fold_in(
            jax.random.fold_in(self._key0, step), self.pid)

    def sample_local(self, step: int):
        """This host's shard: (pixel_info, rays_o, rays_d), local shapes
        (B/P, ...)."""
        return self._sample_jit(self.step_key(step))

    def sample(self, step: int):
        """The global sharded batch for one step."""
        pixel_info, rays_o, rays_d = self.sample_local(step)

        def mk(x):
            return jax.make_array_from_process_local_data(
                self._rays_sh, np.asarray(x))

        return ({k: mk(v) for k, v in pixel_info.items()},
                mk(rays_o), mk(rays_d))


def make_global_train_step(
    rcfg, lcfg, phase, optimizer, consts, batch_size,
    prior_irradiance_mean, near, far, mesh: Mesh,
    n_depth_random_volume: int = 256,
):
    """Jitted SPMD train step over a (possibly multi-host) mesh,
    consuming a pre-sampled global batch from HostShardedSampler.

    Returns (train_step(state, key, pixel_info, rays_o, rays_d),
    place_state). Params replicated, rays sharded; XLA inserts the grad
    psum across the whole mesh (ICI within hosts, DCN across).
    """
    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    rcfg_phase = phase_render_config(rcfg, phase)
    rays_sh = NamedSharding(mesh, P("rays"))
    consts = put_replicated(consts, mesh)

    n_vol = min(n_depth_random_volume, batch_size)
    n_vol -= n_vol % n_dev
    n_vol = max(n_vol, n_dev)

    def loss_fn(variables, key, pixel_info, rays_o, rays_d):
        k_render, k_vol, k_vol_render = jax.random.split(key, 3)
        rays_o = jax.lax.with_sharding_constraint(rays_o, rays_sh)
        rays_d = jax.lax.with_sharding_constraint(rays_d, rays_sh)
        pixel_info = {k: jax.lax.with_sharding_constraint(v, rays_sh)
                      for k, v in pixel_info.items()}
        return loss_from_batch(
            variables, (k_render, k_vol, k_vol_render), consts, pixel_info,
            rays_o, rays_d, rcfg_phase, lcfg, phase, prior_irradiance_mean,
            near, far, n_vol)

    train_step = make_optimizer_step(optimizer)(loss_fn)

    def place_state(state):
        return put_replicated(state, mesh)

    return train_step, place_state


def fetch_replicated(tree):
    """Host-local numpy copy of a fully-replicated global pytree (every
    process holds complete replicas, so this never communicates). Used
    to checkpoint from process 0."""
    return jax.tree.map(lambda x: np.asarray(x), tree)
