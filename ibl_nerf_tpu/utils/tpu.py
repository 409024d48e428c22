"""TPU backend tuning knobs that must be set before the first compile.

Scoped VMEM: libtpu caps each kernel's scoped (stack) VMEM allocation
at 16 MB by default. The fused fwd+bwd train kernel's best backward
tile (TILE_B=512: residual inputs + f32 dW accumulators, ~18.2 MB)
exceeds that cap inside the full train step, which round 4 measured as
the kernel being pinned to XLA's ~61-63% gradient-path plateau at
TILE_B=256. Raising the cap to 24 MB (v5e has 128 MB of VMEM; measured
safe — 32 MB regresses the surrounding program's schedule) unlocks the
512 tile and a ~12% whole-step win in both normal modes (RESULTS.md
"Scoped-VMEM unlock", round 5).

The only channel to libtpu — including through the axon remote-compile
tunnel, which snapshots the client environment per compile request —
is the LIBTPU_INIT_ARGS environment variable, read when libtpu
initializes. Hence this must run before the first TPU compile.
"""

from __future__ import annotations

import os

SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib"

# Measured optimum for the fused train kernel on v5e (perf_sweep tile
# sweep, RESULTS.md): 24 MB fits TILE_B=512; 32 MB hurts.
DEFAULT_SCOPED_VMEM_KIB = 24576
PTRAIN_BEST_TILE_B = "512"


def ensure_scoped_vmem_kib(kib: int = DEFAULT_SCOPED_VMEM_KIB) -> bool:
    """Append the scoped-VMEM flag to LIBTPU_INIT_ARGS if absent.

    Returns True if this call set it; False if the environment already
    pins a value (user override wins — never clobber an explicit
    setting).
    """
    current = os.environ.get("LIBTPU_INIT_ARGS", "")
    if SCOPED_VMEM_FLAG in current:
        return False
    os.environ["LIBTPU_INIT_ARGS"] = f"{current} {SCOPED_VMEM_FLAG}={kib}".strip()
    return True


def configure_pallas_train_env() -> None:
    """Production environment for `use_pallas_train`: raise the scoped
    VMEM cap and default the backward tile to the measured-best 512.

    Must run before ibl_nerf_tpu.kernels.fused_field_train is first
    imported (the module reads IBL_PTRAIN_TILE_B at import time) and
    before the first TPU compile. Explicit env settings always win.
    """
    ensure_scoped_vmem_kib()
    os.environ.setdefault("IBL_PTRAIN_TILE_B", PTRAIN_BEST_TILE_B)
