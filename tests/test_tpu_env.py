"""utils/tpu.py: scoped-VMEM / pallas-train environment wiring.

The fused train kernel's winning backward tile (512) needs libtpu's
scoped-VMEM cap raised from 16 MB to 24 MB; the only channel is
LIBTPU_INIT_ARGS before the first compile (see utils/tpu.py). These
tests pin the env-merging semantics (never clobber explicit settings)
and the CLI plumbing of --use_pallas{,_train} into RenderConfig.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ibl_nerf_tpu.cli.config import parse_with_includes  # noqa: E402
from ibl_nerf_tpu.utils.tpu import (  # noqa: E402
    DEFAULT_SCOPED_VMEM_KIB, PTRAIN_BEST_TILE_B, SCOPED_VMEM_FLAG,
    configure_pallas_train_env, ensure_scoped_vmem_kib)


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.delenv("IBL_PTRAIN_TILE_B", raising=False)
    return monkeypatch


class TestScopedVmem:
    def test_sets_flag_when_absent(self, clean_env):
        assert ensure_scoped_vmem_kib() is True
        assert (os.environ["LIBTPU_INIT_ARGS"]
                == f"{SCOPED_VMEM_FLAG}={DEFAULT_SCOPED_VMEM_KIB}")

    def test_appends_to_existing_args(self, clean_env):
        clean_env.setenv("LIBTPU_INIT_ARGS", "--some_other_flag=1")
        assert ensure_scoped_vmem_kib(20000) is True
        val = os.environ["LIBTPU_INIT_ARGS"]
        assert "--some_other_flag=1" in val
        assert f"{SCOPED_VMEM_FLAG}=20000" in val

    def test_explicit_setting_wins(self, clean_env):
        clean_env.setenv("LIBTPU_INIT_ARGS", f"{SCOPED_VMEM_FLAG}=8192")
        assert ensure_scoped_vmem_kib() is False
        assert os.environ["LIBTPU_INIT_ARGS"] == f"{SCOPED_VMEM_FLAG}=8192"

    def test_configure_sets_tile_default_not_clobbering(self, clean_env):
        configure_pallas_train_env()
        assert os.environ["IBL_PTRAIN_TILE_B"] == PTRAIN_BEST_TILE_B
        clean_env.setenv("IBL_PTRAIN_TILE_B", "256")
        configure_pallas_train_env()
        assert os.environ["IBL_PTRAIN_TILE_B"] == "256"


class TestCliPlumbing:
    def test_flags_reach_render_config(self):
        from ibl_nerf_tpu.train.loop import (
            field_config_from_args, render_config_from_args)

        args = parse_with_includes(
            ["--datadir", "/tmp/x", "--use_pallas_train", "--use_pallas"])
        rcfg = render_config_from_args(args, field_config_from_args(args))
        assert rcfg.use_pallas_train is True
        assert rcfg.use_pallas is True

    def test_flags_default_off(self):
        from ibl_nerf_tpu.train.loop import (
            field_config_from_args, render_config_from_args)

        args = parse_with_includes(["--datadir", "/tmp/x"])
        rcfg = render_config_from_args(args, field_config_from_args(args))
        assert rcfg.use_pallas_train is False
        assert rcfg.use_pallas is False
