"""Training engine: jitted step functions, optimizers, schedules, metrics."""

from dmcnet_tpu.train.optimizers import (
    GroupAdam,
    lr_mult_tree,
    decay_mult_tree,
    step_decay_lr,
)
from dmcnet_tpu.train.engine import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from dmcnet_tpu.train.metrics import AverageMeter, topk_accuracy
