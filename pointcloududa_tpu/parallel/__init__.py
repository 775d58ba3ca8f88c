"""Device-mesh construction and sharding placement (data parallelism over
ICI; see SURVEY.md §2.6 for the parallelism accounting)."""

from pointcloududa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    init_distributed,
    mesh_is_multiprocess,
    pad_batch,
    process_row_slice,
    replicate,
    shard_batch,
    trainer_row_shard,
)
