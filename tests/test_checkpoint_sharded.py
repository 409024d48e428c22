"""Checkpoint restore into a SHARDED/replicated state: restore must
place arrays directly at their target shardings (no orbax sharding
warning, no host round-trip) and training must continue from the
restored step on the mesh."""

import os
import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.parallel.mesh import make_mesh, replicate
from ibl_nerf_tpu.train import checkpoint as ckpt_lib
from ibl_nerf_tpu.train.losses import LossConfig
from ibl_nerf_tpu.train.step import build_optimizer, init_train_state

FCFG = FieldConfig(depth=2, width=32, coarse_radiance_number=2, skips=())
LCFG = LossConfig(coarse_radiance_number=2)


def _state():
    variables = {"coarse": init_field_params(jax.random.key(0), FCFG),
                 "fine": init_field_params(jax.random.key(1), FCFG)}
    optimizer = build_optimizer(variables, lcfg=LCFG)
    return init_train_state(variables, optimizer, step=7)


class TestShardedRestore:
    def test_restore_into_replicated_state(self, tmp_path):
        logdir = str(tmp_path)
        state = _state()
        ckpt_lib.save_checkpoint(logdir, 7, state, elapsed_time=12.5)

        mesh = make_mesh(jax.devices()[:8])
        placed = jax.device_put(_state(), replicate(mesh))

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any orbax warning -> failure
            restored, elapsed, found = ckpt_lib.restore_checkpoint(
                logdir, placed)

        assert found and elapsed == 12.5
        assert int(restored.step) == 7
        # placement preserved: every leaf is on all 8 mesh devices
        for leaf in jax.tree.leaves(restored.variables):
            assert len(leaf.sharding.device_set) == 8, leaf.sharding
        # values match the saved single-device state
        for a, b in zip(jax.tree.leaves(state.variables),
                        jax.tree.leaves(restored.variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_unsharded_still_works(self, tmp_path):
        logdir = str(tmp_path)
        state = _state()
        ckpt_lib.save_checkpoint(logdir, 7, state, elapsed_time=3.0)
        restored, elapsed, found = ckpt_lib.restore_checkpoint(
            logdir, _state())
        assert found and int(restored.step) == 7
