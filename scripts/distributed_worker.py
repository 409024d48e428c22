"""One process of a multi-host SPMD training run (correctness rig).

Launched N times (once per process) by tests/test_multiprocess.py with
JAX_PLATFORMS=cpu and xla_force_host_platform_device_count to emulate a
multi-host TPU slice on localhost. Each process:
  1. joins the distributed runtime (gloo collectives on CPU),
  2. builds the process-spanning `rays` mesh,
  3. samples its host-local shard of every ray batch
     (HostShardedSampler over images[pid::pcount]),
  4. runs `--steps` global train steps,
and prints one JSON line with the per-step losses and a parameter
checksum. All processes must agree (replicated state), and the result
must match a single-process emulation of the same per-host sampling.

The same entry works on a real multi-host TPU pod: jax.distributed
picks coordinates from the TPU environment when flags are omitted.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_tiny_problem():
    """The deterministic tiny scene/model shared with the in-process
    emulation in tests/test_multiprocess.py."""
    import jax
    import jax.numpy as jnp

    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.render import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import build_optimizer, init_train_state

    fcfg = FieldConfig(depth=2, width=32, coarse_radiance_number=2, skips=())
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, perturb=True,
        normal_type="normal_map_from_depth_gradient_epsilon")
    lcfg = LossConfig(coarse_radiance_number=2,
                      n_iter_ignore_approximated_radiance=0,
                      n_iter_ignore_prior=10**9)
    phase = resolve_phase(1, lcfg)

    h = w = 16
    n_img = 4
    rng = np.random.default_rng(0)
    arrays = {
        "images": rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32),
        "prefiltered_images": rng.uniform(
            0, 1, (2, n_img, h, w, 3)).astype(np.float32),
        "poses": np.stack([np.eye(4, dtype=np.float32)] * n_img),
        "K": np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                      np.float32),
    }

    variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                 "fine": init_field_params(jax.random.key(1), fcfg)}
    optimizer = build_optimizer(variables, lcfg=lcfg)
    state = init_train_state(variables, optimizer)
    consts = {"brdf_lut": jnp.full((8, 8, 3), 0.4, jnp.float32)}
    return rcfg, lcfg, phase, optimizer, consts, state, arrays, h, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args()

    from ibl_nerf_tpu.parallel import distributed as dist

    pid, pcount = dist.initialize(args.coordinator, args.num_processes,
                                  args.process_id)

    import jax

    (rcfg, lcfg, phase, optimizer, consts, state, arrays,
     h, w) = build_tiny_problem()

    mesh = dist.global_mesh()
    sampler = dist.HostShardedSampler(arrays, mesh, args.batch_size, h, w)
    step_fn, place_state = dist.make_global_train_step(
        rcfg, lcfg, phase, optimizer, consts, args.batch_size,
        prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
    state = place_state(state)

    losses = []
    for i in range(args.steps):
        pixel_info, rays_o, rays_d = sampler.sample(i)
        key = jax.random.fold_in(jax.random.key(7), i)
        state, scalars = step_fn(state, key, pixel_info, rays_o, rays_d)
        losses.append(float(scalars["loss_total"]))

    param_sum = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree.leaves(dist.fetch_replicated(state.variables))))
    print(json.dumps({
        "process_id": pid,
        "process_count": pcount,
        "n_devices": jax.device_count(),
        "losses": losses,
        "param_sum": param_sum,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
