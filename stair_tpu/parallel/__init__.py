"""Device-mesh construction and sharding rules."""

from stair_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_sharding,
    shard_batch,
)
