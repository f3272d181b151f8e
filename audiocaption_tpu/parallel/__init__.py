from audiocaption_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    host_local_batch_to_global,
)
from audiocaption_tpu.parallel.tp import (
    DEFAULT_TP_RULES,
    create_sharded_train_state,
    make_tp_mesh,
    shard_params,
)
