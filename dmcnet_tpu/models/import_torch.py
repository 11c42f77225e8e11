"""Import reference PyTorch checkpoints into flax variables.

Converts the reference `.pth.tar` state_dicts (code/dmcnet/train.py:64-68
strips the DataParallel 'module.' prefix; keys are then
`base_model.*` / `gen_flow_model.*` / `discriminator.*` / `data_bn.*`) into
this framework's NHWC param/batch_stats trees:

  conv weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  linear weight (O, I)       -> kernel (I, O)
  BN weight/bias/running_mean/running_var -> scale/bias/mean/var

Unknown keys (e.g. the reference's never-applied `data_bn`, `num_batches_
tracked`) are skipped and reported, mirroring `load_state_dict(strict=False)`.
"""

from __future__ import annotations

import re

import numpy as np


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _conv_w(v):
    return np.transpose(np.asarray(v), (2, 3, 1, 0))


def _linear_w(v):
    return np.transpose(np.asarray(v), (1, 0))


def _flattened_linear_w(v, c_last):
    """Linear over a FLATTENED conv map: torch flattens NCHW (c-major),
    flax flattens NHWC — reorder the input features accordingly.
    Applies to the discriminators' adv_layer (model.py:290,385); caught by
    tests/test_gen_torch_parity.py."""
    v = np.asarray(v)
    o, flat = v.shape
    hw = int(round((flat // c_last) ** 0.5))
    assert c_last * hw * hw == flat, (v.shape, c_last)
    w = v.reshape(o, c_last, hw, hw).transpose(2, 3, 1, 0)
    return w.reshape(hw * hw * c_last, o)


def _discriminator_last_width(state_dict):
    """Out-channel count of the discriminator's final conv (any name
    prefix), for the adv_layer flatten reorder."""
    best = None
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts and parts[0] == "module":
            parts = parts[1:]
        if len(parts) < 4 or "discriminator" not in parts[0]:
            continue
        m = re.fullmatch(r"discriminator_block_(\d)(?:_(\d))?", parts[1])
        if m and parts[2] == "0" and parts[3] == "weight":
            rank = (int(m.group(1)), int(m.group(2) or 0))
            if best is None or rank > best[0]:
                shape = getattr(value, "shape", np.asarray(value).shape)
                best = (rank, int(shape[0]))
    return best[1] if best else None


_BN_PARTS = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}


def _map_resnet(parts):
    """base_model.X... -> (module_path, leaf_kind).  Returns None to skip."""
    name = parts[0]
    if name == "conv1":
        return ("conv1",), "conv"
    if name == "bn1":
        return ("bn1",), "bn:" + parts[1]
    if name == "fc":
        return ("fc",), "linear:" + parts[1]
    m = re.fullmatch(r"layer(\d)", name)
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        sub = parts[2]
        if sub in ("conv1", "conv2"):
            return (block, sub), "conv"
        if sub in ("bn1", "bn2"):
            return (block, sub), "bn:" + parts[3]
        if sub == "downsample":
            if parts[3] == "0":
                return (block, "downsample_conv"), "conv"
            return (block, "downsample_bn"), "bn:" + parts[4]
    return None


def _map_estimator(parts):
    """gen_flow_model.X... for all estimator families."""
    name = parts[0]
    # Dense estimators: conv_i.0.{weight,bias}, predict_flow.{weight,bias},
    # early-fusion stems conv_0_mv.0 / conv_0_r.0.
    if re.fullmatch(r"conv_\d(_mv|_r)?", name):
        return (name,), ("conv" if parts[2] == "weight" else "conv_bias")
    if name == "predict_flow" and parts[1] in ("weight", "bias"):
        return (name,), ("conv" if parts[1] == "weight" else "conv_bias")
    # ContextNetwork: conv_context.{i}.{0 conv |1 bn}.*
    if name == "conv_context":
        stage = ("stage_" + parts[1],)
        if parts[2] == "0":
            return stage + ("conv",), ("conv" if parts[3] == "weight"
                                       else "conv_bias")
        return stage + ("bn",), "bn:" + parts[3]
    # ContextNetworkAtt heads: predict_flow.{0,1}.*, predict_att.0.{0,1}.*
    if name == "predict_flow":
        idx = parts[1]
        leaf = parts[2]
        if idx == "0":
            return (name, "conv"), ("conv" if leaf == "weight" else "conv_bias")
        return (name, "bn"), "bn:" + leaf
    if name == "predict_att":
        idx = parts[2]
        leaf = parts[3]
        if idx == "0":
            return (name, "conv"), ("conv" if leaf == "weight" else "conv_bias")
        return (name, "bn"), "bn:" + leaf
    return None


def _map_discriminator(parts, depth_by_stage):
    """discriminator_block_{stage}[_{k}].{seq_idx}.* -> stageS_down/deepK."""
    m = re.fullmatch(r"discriminator_block_(\d)(?:_(\d))?", parts[0])
    if not m:
        if parts[0] == "adv_layer":
            return ("adv_layer",), "linear:" + parts[1]
        return None
    stage = int(m.group(1)) - 1
    k = m.group(2)
    block = (f"stage{stage}_down" if k is None else f"stage{stage}_deep{int(k) - 1}")
    seq_idx, leaf = parts[1], parts[2]
    if seq_idx == "0":
        return (block, "conv"), ("conv" if leaf == "weight" else "conv_bias")
    if seq_idx == "3":
        return (block, "bn"), "bn:" + leaf
    return None


def import_state_dict(state_dict, strip_module=True):
    """torch state_dict -> {'params': ..., 'batch_stats': ...} partial trees.

    Returns (variables, skipped_keys).  Merge into freshly initialized
    variables with `merge_variables`.
    """
    params, batch_stats, skipped = {}, {}, []
    d_last_c = _discriminator_last_width(state_dict)
    for key, value in state_dict.items():
        parts = key.split(".")
        if strip_module and parts[0] == "module":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        top = parts[0]
        mapped = None
        if top == "base_model":
            mapped = _map_resnet(parts[1:])
        elif top == "gen_flow_model":
            mapped = _map_estimator(parts[1:])
        elif top == "discriminator":
            mapped = _map_discriminator(parts[1:], None)
        if mapped is None:
            skipped.append(key)
            continue
        path, kind = mapped
        path = (top,) + path
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else value)
        if kind == "conv":
            _set(params, path + ("kernel",), _conv_w(value))
        elif kind == "conv_bias":
            _set(params, path + ("bias",), value)
        elif kind.startswith("linear:"):
            leaf = kind.split(":")[1]
            if leaf == "weight":
                if path[-1] == "adv_layer" and d_last_c:
                    w = _flattened_linear_w(value, d_last_c)
                else:
                    w = _linear_w(value)
                _set(params, path + ("kernel",), w)
            else:
                _set(params, path + ("bias",), value)
        elif kind.startswith("bn:"):
            leaf = kind.split(":")[1]
            coll, name = _BN_PARTS[leaf]
            target = params if coll == "params" else batch_stats
            _set(target, path + (name,), value)
        else:
            skipped.append(key)
    return {"params": params, "batch_stats": batch_stats}, skipped


def merge_variables(variables, imported, strict_shapes=True):
    """Overlay imported leaves onto initialized `variables` (dicts), checking
    shapes; returns (merged, missing_leaf_paths)."""
    import jax

    merged = jax.tree.map(lambda x: x, variables)  # shallow copy tree

    def overlay(dst, src, prefix):
        for k, v in src.items():
            if k not in dst:
                missing.append(prefix + (k,))
                continue
            if isinstance(v, dict):
                overlay(dst[k], v, prefix + (k,))
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    if strict_shapes:
                        raise ValueError(
                            f"shape mismatch at {prefix + (k,)}: "
                            f"{dst[k].shape} vs {v.shape}")
                    missing.append(prefix + (k,))
                    continue
                dst[k] = v.astype(dst[k].dtype)

    missing = []
    merged = {c: dict_copy(merged[c]) if c in merged else {}
              for c in set(merged) | set(imported)}
    for coll in imported:
        if imported[coll]:
            overlay(merged.setdefault(coll, {}), imported[coll], (coll,))
    return merged, missing


def dict_copy(tree):
    if isinstance(tree, dict):
        return {k: dict_copy(v) for k, v in tree.items()}
    return tree


def load_pth_tar(path):
    """torch.load a reference checkpoint; returns its state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt)
