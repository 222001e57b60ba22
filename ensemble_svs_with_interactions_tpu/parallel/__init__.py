from ensemble_svs_with_interactions_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    replicate_tree,
    shard_batch,
)
