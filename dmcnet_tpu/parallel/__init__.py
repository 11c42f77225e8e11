"""Device-mesh parallelism."""

from dmcnet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_state,
    make_sharded_train_step,
)
