"""Import reference I3D torch checkpoints (.pth) into flax variables.

Key format is the kinetics-i3d-pytorch layout used by the reference
(network/i3d.py module names): `conv3d_1a_7x7.conv3d.weight`,
`mixed_3b.branch_1.0.conv3d.weight`, `conv3d_0c_1x1.conv3d.{weight,bias}`,
`classifier.{weight,bias}`, plus embedded `gen_flow_model.*` /
`discriminator.*` (imported via models.import_torch).

Adaptations mirrored from the reference partial loader
(train/model.py:41-65 and network/initializer.py:62-143):
  * conv3d weight (O, I, kt, kh, kw) -> kernel (kt, kh, kw, I, O);
  * rgb->flow stem adaptation: channel-mean the 3-channel conv3d_1a_7x7
    weight and broadcast to the model's input channel count.
"""

from __future__ import annotations

import re

import numpy as np

from dmcnet_tpu.models.import_torch import (
    _BN_PARTS,
    _map_discriminator,
    _map_estimator,
    _set,
)

_BRANCH_MAP = {
    ("branch_0",): ("branch_0",),
    ("branch_1", "0"): ("branch_1a",),
    ("branch_1", "1"): ("branch_1b",),
    ("branch_2", "0"): ("branch_2a",),
    ("branch_2", "1"): ("branch_2b",),
    ("branch_3", "1"): ("branch_3b",),
}


def _map_i3d_key(parts):
    """parts (no 'module.' prefix) -> (path, kind) or None."""
    top = parts[0]
    if top == "gen_flow_model":
        m = _map_estimator(parts[1:])
        return ((top,) + m[0], m[1]) if m else None
    if top == "discriminator":
        m = _map_discriminator(parts[1:], None)
        return ((top,) + m[0], m[1]) if m else None
    if top == "classifier":
        return (("classifier",), "linear:" + parts[1])
    if top.startswith("conv3d_"):
        unit = (top,)
        rest = parts[1:]
    elif top.startswith("mixed_"):
        if (parts[1], parts[2]) in _BRANCH_MAP:
            unit = (top,) + _BRANCH_MAP[(parts[1], parts[2])]
            rest = parts[3:]
        elif (parts[1],) in _BRANCH_MAP:
            unit = (top,) + _BRANCH_MAP[(parts[1],)]
            rest = parts[2:]
        else:
            return None
    else:
        return None
    if rest[0] == "conv3d":
        return (unit + ("conv3d",),
                "conv3d" if rest[1] == "weight" else "conv_bias")
    if rest[0] == "batch3d":
        return (unit + ("batch3d",), "bn:" + rest[1])
    return None


def import_i3d_state_dict(state_dict, in_channels=None):
    from dmcnet_tpu.models.import_torch import _discriminator_last_width

    params, batch_stats, skipped = {}, {}, []
    d_last_c = _discriminator_last_width(state_dict)
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "module":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        mapped = _map_i3d_key(parts)
        if mapped is None:
            skipped.append(key)
            continue
        path, kind = mapped
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else value)
        if kind == "conv3d":
            if value.ndim == 4:
                # 2D checkpoint (pretrained_2d path): OIhw -> hwIO; temporal
                # inflation happens against the target tree in
                # `load_i3d_pth_2d` (reference initializer.py:62-143).
                w = np.transpose(value, (2, 3, 1, 0))
                in_axis = 2
            else:
                w = np.transpose(value, (2, 3, 4, 1, 0))  # OIthw -> thwIO
                in_axis = 3
            if (path[0] == "conv3d_1a_7x7" and in_channels
                    and w.shape[in_axis] != in_channels):
                # rgb->flow stem adaptation (train/model.py:55-58).
                shape = list(w.shape)
                shape[in_axis] = in_channels
                w = np.broadcast_to(
                    w.mean(axis=in_axis, keepdims=True), shape).copy()
            _set(params, path + ("kernel",), w)
        elif kind == "conv":
            _set(params, path[:-1] + (path[-1], "kernel"),
                 np.transpose(value, (2, 3, 1, 0)))
        elif kind == "conv_bias":
            _set(params, path + ("bias",), value)
        elif kind.startswith("linear:"):
            leaf = kind.split(":")[1]
            if leaf == "weight":
                if path[-1] == "adv_layer" and d_last_c:
                    from dmcnet_tpu.models.import_torch import (
                        _flattened_linear_w,
                    )
                    w = _flattened_linear_w(value, d_last_c)
                else:
                    w = np.transpose(value, (1, 0))
                _set(params, path + ("kernel",), w)
            else:
                _set(params, path + ("bias",), value)
        elif kind.startswith("bn:"):
            leaf = kind.split(":")[1]
            coll, name = _BN_PARTS[leaf]
            target = params if coll == "params" else batch_stats
            _set(target, path + (name,), value)
    return {"params": params, "batch_stats": batch_stats}, skipped


def load_i3d_pth(path, params, batch_stats, modality="flow+mp4"):
    """Partial-load a reference I3D .pth into (params, batch_stats)."""
    import torch

    from dmcnet_tpu.models.import_torch import merge_variables

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    in_ch = 2 if modality in ("flow", "mv", "flow+mp4") else 3
    imported, skipped = import_i3d_state_dict(sd, in_channels=in_ch)
    merged, missing = merge_variables(
        {"params": params, "batch_stats": batch_stats}, imported,
        strict_shapes=False)
    report = f"imported={sum(1 for _ in _leaves(imported['params']))} " \
             f"skipped={len(skipped)} shape-missed={len(missing)}"
    return merged["params"], merged["batch_stats"], report


def load_i3d_pth_2d(path, params, batch_stats, modality="flow+mp4",
                    mode="inflation", rng=None):
    """--pretrained_2d path: partial-load a 2D torch checkpoint (same module
    names, 4D kernels) with temporal inflation against the target 3D tree
    (reference network/initializer.py:62-143 'inflation'/'random' modes;
    the classifier is skipped on shape mismatch like initializer.py:125-126).
    """
    import torch

    from dmcnet_tpu.models.import_torch import merge_variables
    from dmcnet_tpu.models.initializer import inflate_state_2d_to_3d

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    in_ch = 2 if modality in ("flow", "mv", "flow+mp4") else 3
    imported, skipped = import_i3d_state_dict(sd, in_channels=in_ch)
    inflated = inflate_state_2d_to_3d(imported["params"], params,
                                      mode=mode, rng=rng)
    merged, missing = merge_variables(
        {"params": params, "batch_stats": batch_stats},
        {"params": inflated, "batch_stats": imported["batch_stats"]},
        strict_shapes=False)
    report = f"2d-inflated={sum(1 for _ in _leaves(inflated))} " \
             f"skipped={len(skipped)} shape-missed={len(missing)}"
    return merged["params"], merged["batch_stats"], report


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v
