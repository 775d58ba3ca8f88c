"""Device-mesh construction and sharding placement (data parallelism over
ICI; see SURVEY.md §2.6 for the parallelism accounting)."""

from pointcloududa_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    pad_batch,
    shard_batch,
    replicate,
    batch_sharding,
)
