"""Pallas TPU kernels for the hot compute paths."""

from ibl_nerf_tpu.kernels.fused_field import (
    pack_field_weights,
    fused_field_apply,
    fused_field_density,
)
