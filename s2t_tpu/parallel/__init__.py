from s2t_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
)
