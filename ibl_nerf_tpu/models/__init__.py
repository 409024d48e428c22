"""Neural field modules (plain-pytree params + pure apply functions)."""

from ibl_nerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    apply_field,
    apply_field_density,
    field_raw_channels,
)
from ibl_nerf_tpu.models.aux_mlp import (
    init_position_mlp,
    apply_position_mlp,
    init_position_direction_mlp,
    apply_position_direction_mlp,
)
