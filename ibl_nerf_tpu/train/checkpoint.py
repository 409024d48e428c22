"""Checkpoint / resume with reference-compatible semantics.

Parity: /root/reference/src/train.py:180-191 and ibl_nerf.py:344-378 —
checkpoints carry {params, optimizer state, global_step, elapsed_time};
restore picks explicit path > target iteration > latest in logdir, and
the LR schedule continues from global_step.

Implementation: orbax PyTreeCheckpointer under `{logdir}/ckpt_{step:06d}`.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"ckpt_(\d+)$")


def _ckpt_dir(logdir: str, step: int) -> str:
    return os.path.join(os.path.abspath(logdir), f"ckpt_{step:06d}")


def list_checkpoints(logdir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(logdir):
        return []
    out = []
    for name in sorted(os.listdir(logdir)):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(os.path.abspath(logdir), name)))
    return sorted(out)


def save_checkpoint(logdir: str, step: int, state, elapsed_time: float):
    path = _ckpt_dir(logdir, step)
    payload = {
        "variables": state.variables,
        "opt_state": state.opt_state,
        "step": np.asarray(step),
        "elapsed_time": np.asarray(elapsed_time),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(logdir: str, state, ft_path: str | None = None,
                       target_step: int = -1):
    """Restore into the (abstract) structure of `state`.

    Returns (state, elapsed_time, found) — found=False leaves state
    untouched (parity: fresh start when no ckpt).
    """
    if ft_path and ft_path != "None":
        path = ft_path
    elif target_step > 0:
        path = _ckpt_dir(logdir, target_step)
    else:
        ckpts = list_checkpoints(logdir)
        if not ckpts:
            return state, 0.0, False
        path = ckpts[-1][1]

    if not os.path.isdir(path):
        return state, 0.0, False

    template = {
        "variables": state.variables,
        "opt_state": state.opt_state,
        "step": np.asarray(0),
        "elapsed_time": np.asarray(0.0),
    }
    ckptr = ocp.PyTreeCheckpointer()
    # Restore with explicit shardings from the live state so sharded
    # (mesh-placed) arrays come back on their devices directly instead
    # of via a host round-trip (and without orbax's sharding warning).
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = ckptr.restore(path, item=template, restore_args=restore_args)
    new_state = state.replace(
        variables=restored["variables"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(int(restored["step"])),
    )
    return new_state, float(restored["elapsed_time"]), True
