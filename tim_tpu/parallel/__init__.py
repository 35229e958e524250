from tim_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_batch, shard_train_state,
    replicate, PARTITION_RULES)
