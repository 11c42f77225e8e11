"""Device-mesh parallelism."""

from dmcnet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_state,
    make_sharded_chunked_steps,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from dmcnet_tpu.parallel.fsdp import (
    fsdp_spec,
    gather_state,
    make_fsdp_eval_step,
    make_fsdp_train_step,
    shard_state_fsdp,
)
from dmcnet_tpu.parallel.pipeline import (
    flatten_tree,
    make_hetero_pipeline_apply,
    make_pipeline_apply,
    make_stage_mesh,
    shard_stage_params,
    stack_stage_params,
    unstack_stage_params,
)
from dmcnet_tpu.parallel.pp_resnet import (
    make_pp_resnet18_apply,
    resnet18_stage_split,
)
from dmcnet_tpu.parallel.tensor import (
    make_mesh_2d,
    shard_state_tp,
    tp_spec,
)
from dmcnet_tpu.parallel.temporal import (
    make_time_mesh,
    make_time_sharded_apply,
    place_time_sharded,
)
