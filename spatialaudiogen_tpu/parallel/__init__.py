"""Device mesh, sharding rules, and sharded train/eval steps."""

from spatialaudiogen_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_specs,
    shard_pytree,
)
