"""Pipeline-parallel ResNet-18: a REAL heterogeneous model through the
GPipe schedule (parallel/pipeline.make_hetero_pipeline_apply).

The torchvision-graph ResNet (models/resnet.py) splits into `n` pipeline
stages along its residual stages — the natural cut points, where both the
activation geometry and the parameter tree change (which is exactly what
the homogeneous pipeline cannot express):

    4 stages: [stem + layer1] [layer2] [layer3] [layer4 + avgpool + fc]
    2 stages: [stem + layer1 + layer2] [layer3 + layer4 + head]

Eval-mode inference (BN running statistics): the dmcnet test protocol's
scoring forward (cli/test.py --pp).  The same construction TRAINS —
jax.grad through the hetero schedule on this real parameter tree equals
the serial grads leaf-for-leaf, and an SGD step on the stacked parameter
plane tracks the serially-trained model (tested for both splits in
tests/test_pipeline_parallel.py::test_hetero_pipeline_resnet18_grads_
match_serial).  The CLI exposes the inference path, which is where a
25-segment x 10-crop eval batch actually benefits from stage parallelism.
No reference analogue exists (its only parallelism is whole-model
DataParallel, code/dmcnet/train.py:117).
"""

from __future__ import annotations

import flax.linen as nn

from dmcnet_tpu.models.layers import TorchBatchNorm
from dmcnet_tpu.models.resnet import (BasicBlock, block_name, block_stride,
                                      forward_head, forward_stem,
                                      make_stem_conv)
from dmcnet_tpu.parallel.pipeline import make_hetero_pipeline_apply


def _sub(variables, names):
    """Slice {params, batch_stats} down to the given top-level modules."""
    out = {}
    for coll in ("params", "batch_stats"):
        src = variables.get(coll, {})
        picked = {k: src[k] for k in names if k in src}
        out[coll] = picked
    return out


def _bound(variables, name, module):
    """Standalone eval-mode apply-closure over one sliced submodule — the
    pipeline runs the SAME graph functions as `ResNet.__call__` (forward_
    stem/block_stride/forward_head from models/resnet.py), just with the
    submodules bound to stage-sliced variable trees instead of compact
    in-module construction."""
    cols = {"params": variables["params"][name]}
    if name in variables.get("batch_stats", {}):
        cols["batch_stats"] = variables["batch_stats"][name]
    return lambda x: module.apply(cols, x)


def _stem(variables, x):
    return forward_stem(
        x, _bound(variables, "conv1", make_stem_conv()),
        _bound(variables, "bn1", TorchBatchNorm(use_running_average=True)))


def _layer(variables, x, stage, width):
    for block in range(2):  # ResNet-18: two BasicBlocks per stage
        name = block_name(stage, block)
        mod = BasicBlock(width, block_stride(stage, block))
        cols = {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}
        x = mod.apply(cols, x, False)
    return x


def _head(variables, x, num_classes):
    return forward_head(
        x, _bound(variables, "fc", nn.Dense(num_classes)))


_WIDTHS = (64, 128, 256, 512)


def resnet18_stage_split(variables, num_classes, n_stages=4):
    """-> (stage_fns, stage_vars) for the hetero pipeline.  Supported
    splits: 4 (one residual stage per device) and 2."""
    def seg(stages, with_stem=False, with_head=False):
        names = (["conv1", "bn1"] if with_stem else [])
        names += [block_name(s, b) for s in stages for b in range(2)]
        if with_head:
            names.append("fc")

        def fn(v, x):
            if with_stem:
                x = _stem(v, x)
            for s in stages:
                x = _layer(v, x, s, _WIDTHS[s])
            if with_head:
                x = _head(v, x, num_classes)
            return x

        return fn, _sub(variables, names)

    if n_stages == 4:
        parts = [seg([0], with_stem=True), seg([1]), seg([2]),
                 seg([3], with_head=True)]
    elif n_stages == 2:
        parts = [seg([0, 1], with_stem=True),
                 seg([2, 3], with_head=True)]
    else:
        raise ValueError(f"unsupported ResNet-18 split: {n_stages} stages")
    return [p[0] for p in parts], [p[1] for p in parts]


def make_pp_resnet18_apply(variables, num_classes, mesh,
                           n_microbatches=None, axis_name="stage"):
    """fn(x) -> logits, running eval-mode ResNet-18 stage-pipelined over
    `mesh`'s 'stage' axis (optionally x 'data').  Parameters are stored
    stage-sharded (each device holds only its stages' weights)."""
    n = mesh.shape[axis_name]
    fns, svars = resnet18_stage_split(variables, num_classes, n_stages=n)
    run, stacked = make_hetero_pipeline_apply(
        fns, svars, mesh, n_microbatches=n_microbatches,
        axis_name=axis_name)
    return lambda x: run(stacked, x)
