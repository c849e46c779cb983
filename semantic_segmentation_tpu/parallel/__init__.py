from semantic_segmentation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_data_mesh,
    replicate,
    shard_batch,
)
