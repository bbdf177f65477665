from erc_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
    is_main_process,
    batch_sharding,
)
