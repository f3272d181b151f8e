from audiocaption_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    host_local_batch_to_global,
)
