"""SPMD parallelism over a device mesh."""

from ibl_nerf_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_rays,
    make_sharded_train_step,
)
