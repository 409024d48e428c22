"""Analytic multi-chip scaling bound from the compiled sharded step.

Real multi-chip hardware is not available in this environment, so this
turns the ≥90%-scaling BASELINE target into a defensible predicted
number: compile the FLAGSHIP sharded train step (8x256, K=3, 64+128
samples, live batch 512) over an 8-device virtual mesh, read the
actual collective bytes out of the compiled HLO, and combine with
v5e interconnect bandwidths:

    efficiency(n) = T_comp / (T_comp + T_collective(n))

with T_comp the measured single-chip step time (bench.py) and
T_collective the ring all-reduce cost 2*(n-1)/n * bytes / BW_per_chip.
This is CONSERVATIVE: it assumes zero overlap of the grad psum with
the backward pass, which XLA normally provides (the psum depends only
on dW, not on the optimizer update).

Run (CPU, no TPU needed):
    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bound.py
"""

from __future__ import annotations

import re
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# measured single-chip step time, bf16_grad default (RESULTS.md)
T_STEP_MS = 18.5
# v5e interconnect (public datasheet / scaling-book numbers):
# 1600 Gbps aggregate ICI per chip -> ~100 GB/s usable one-way per chip
# for a ring; DCN per host (8 chips) ~ 25 GB/s.
ICI_GBPS_PER_CHIP = 100.0   # GB/s, one-way ring bandwidth per chip
DCN_GBPS_PER_HOST = 25.0    # GB/s per host NIC

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
               "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def collective_bytes_from_hlo(hlo: str) -> tuple[int, list[tuple[str, int]]]:
    """Sum output bytes of every cross-replica collective in the HLO.

    Handles both scalar-shaped and TUPLE-shaped ops (XLA groups many
    gradient tensors into one tuple all-reduce):
        %ar = f32[256,256]{1,0} all-reduce(...)
        %ar = (f32[63,256]{1,0}, f32[256]{0}, ...) all-reduce(...)
    """
    total = 0
    per_op = []
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for line in hlo.splitlines():
        m = re.search(
            r"=\s*(.+?)\s+"
            r"(all-reduce|reduce-scatter|all-gather|all-to-all)"
            r"(?:-start)?\(", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        b = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d.strip():
                    n *= int(d)
            b += n * DTYPE_BYTES[dt]
        if b:
            total += b
            label = shapes if len(shapes) < 60 else shapes[:57] + "..."
            per_op.append((f"{kind} {label}", b))
    return total, per_op


def build_flagship_sharded_hlo(n_devices: int = 8, batch: int = 512) -> str:
    from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
    from ibl_nerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step
    from ibl_nerf_tpu.render import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import build_optimizer, init_train_state

    mesh = make_mesh(jax.devices()[:n_devices])
    fcfg = FieldConfig(depth=8, width=256, coarse_radiance_number=3)
    rcfg = RenderConfig(field=fcfg, n_samples=64, n_importance=128,
                        perturb=True,
                        normal_type="normal_map_from_depth_gradient_epsilon")
    lcfg = LossConfig(load_priors=True, freeze_roughness=True,
                      n_iter_ignore_approximated_radiance=0,
                      n_iter_ignore_prior=10**9)
    phase = resolve_phase(1, lcfg)

    variables = {"coarse": init_field_params(jax.random.key(0), fcfg),
                 "fine": init_field_params(jax.random.key(1), fcfg)}
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    consts = {"brdf_lut": jnp.full((64, 64, 3), 0.5, jnp.float32)}
    optimizer = build_optimizer(variables, lcfg=lcfg)

    h, w, n_img = 16, 16, 3
    rng = np.random.default_rng(0)
    arrays = {
        "images": jnp.asarray(
            rng.uniform(0, 1, (n_img, h, w, 3)).astype(np.float32)),
        "prefiltered_images": jnp.asarray(
            rng.uniform(0, 1, (3, n_img, h, w, 3)).astype(np.float32)),
        "poses": jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * n_img)),
        "K": jnp.asarray(np.array(
            [[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)),
    }

    step_fn, place_state, place_arrays = make_sharded_train_step(
        rcfg, lcfg, phase, optimizer, consts, h, w, batch,
        prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
    state = place_state(init_train_state(variables, optimizer))
    arrays = place_arrays(arrays)
    hlo = step_fn.lower(state, jax.random.key(2), arrays).compile().as_text()
    print(f"flagship params: {n_params / 1e6:.2f} M "
          f"({n_params * 4 / 1e6:.1f} MB f32 grads)")
    return hlo


def main():
    hlo = build_flagship_sharded_hlo()
    total, per_op = collective_bytes_from_hlo(hlo)
    big = sorted(per_op, key=lambda t: -t[1])[:8]
    print(f"\ncollectives in compiled sharded step: {len(per_op)} ops, "
          f"{total / 1e6:.2f} MB total")
    for name, b in big:
        print(f"  {b / 1e6:8.3f} MB  {name}")

    print(f"\nassumptions: T_step={T_STEP_MS} ms (measured, bf16_grad), "
          f"ICI {ICI_GBPS_PER_CHIP} GB/s/chip one-way, "
          f"DCN {DCN_GBPS_PER_HOST} GB/s/host; ring all-reduce "
          f"2(n-1)/n * bytes / BW; NO overlap credited (conservative)")

    print("\nWEAK scaling (512 rays per chip — per-chip compute constant):")
    print("  chips | collective ms | predicted efficiency")
    rows = []
    for n in (2, 4, 8, 16):
        t_ar = 2 * (n - 1) / n * total / (ICI_GBPS_PER_CHIP * 1e9) * 1e3
        eff = T_STEP_MS / (T_STEP_MS + t_ar)
        rows.append((n, t_ar, eff))
        print(f"  {n:5d} | {t_ar:10.3f} ms | {100 * eff:6.2f}%")

    print("\n2 hosts x 8 chips (DCN leg, hierarchical all-reduce):")
    t_ici = 2 * 7 / 8 * total / (ICI_GBPS_PER_CHIP * 1e9) * 1e3
    t_dcn = 2 * (2 - 1) / 2 * total / (DCN_GBPS_PER_HOST * 1e9) * 1e3
    eff = T_STEP_MS / (T_STEP_MS + t_ici + t_dcn)
    print(f"  ICI {t_ici:.3f} ms + DCN {t_dcn:.3f} ms -> "
          f"predicted efficiency {100 * eff:.2f}%")

    print("\nSTRONG scaling (512 global rays, compute splits n ways):")
    print("  chips | compute ms | collective ms | predicted efficiency")
    for n in (2, 4, 8):
        t_c = T_STEP_MS / n
        t_ar = 2 * (n - 1) / n * total / (ICI_GBPS_PER_CHIP * 1e9) * 1e3
        eff = t_c / (t_c + t_ar)
        print(f"  {n:5d} | {t_c:8.2f} | {t_ar:10.3f} ms | {100 * eff:6.2f}%")


if __name__ == "__main__":
    main()
