"""Port a PyTorch reference checkpoint (.tar) into an ibl_nerf_tpu
orbax checkpoint — the weight-port leg of the parity harness
(SURVEY.md §7.7): lets trained reference models run through our
renderer for allclose gates and serving.

    python -m ibl_nerf_tpu.cli.port_checkpoint \
        --tar logs/kitchen/100000.tar --out logs_tpu/kitchen \
        --coarse_radiance_number 3
"""

from __future__ import annotations

import argparse

from ibl_nerf_tpu.utils.port import load_reference_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser("port_checkpoint")
    ap.add_argument("--tar", required=True)
    ap.add_argument("--out", required=True, help="logdir for the orbax ckpt")
    ap.add_argument("--coarse_radiance_number", type=int, default=3)
    ap.add_argument("--netdepth", type=int, default=8)
    ap.add_argument("--lrate", type=float, default=5e-4)
    ap.add_argument("--lrate_decay", type=int, default=500)
    args = ap.parse_args(argv)

    coarse, fine, step, elapsed = load_reference_checkpoint(
        args.tar, args.coarse_radiance_number, args.netdepth)
    variables = {"coarse": coarse}
    if fine is not None:
        variables["fine"] = fine

    from ibl_nerf_tpu.train import checkpoint as ckpt_lib
    from ibl_nerf_tpu.train.step import build_optimizer, init_train_state

    optimizer = build_optimizer(variables, lrate=args.lrate,
                                lrate_decay=args.lrate_decay)
    state = init_train_state(variables, optimizer, step=step)
    path = ckpt_lib.save_checkpoint(args.out, step, state, elapsed)
    print(f"ported step {step} (elapsed {elapsed:.0f}s) -> {path}")


if __name__ == "__main__":
    main()
