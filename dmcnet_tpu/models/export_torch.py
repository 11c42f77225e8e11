"""Export flax variables as a reference-format torch checkpoint.

The exact inverse of `models.import_torch`: a model trained here becomes a
`.pth.tar` the REFERENCE stack can `torch.load` and feed to its
`--weights` / `--resume` partial-init paths
(/root/reference/code/dmcnet/train.py:64-68,145-163).  Payload layout
matches reference save_checkpoint (train.py:372-377):

    {epoch, arch, state_dict, best_prec1}

with torch key names (`base_model.*`, `gen_flow_model.*`,
`discriminator.*`) and torch layouts (conv OIHW, linear (O, I), BN
weight/bias/running_mean/running_var).  Optimizer states are NOT exported:
torch optimizer state_dicts key moments by parameter id, which is
framework-internal — cross-framework resume of moments is not meaningful.
Round-tripping through `import_state_dict` restores every exported leaf
bit-exactly (tests/test_export_torch.py).
"""

from __future__ import annotations

import re

import numpy as np


def _conv_w(kernel):
    """(kh, kw, I, O) -> (O, I, kh, kw)."""
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def _linear_w(kernel):
    """(I, O) -> (O, I)."""
    return np.transpose(np.asarray(kernel), (1, 0))


def _flattened_linear_w(kernel, c_last):
    """Inverse of import_torch._flattened_linear_w: flax flattens NHWC,
    torch flattens NCHW — restore torch's c-major feature order for the
    discriminators' adv_layer (reference model.py:290,385)."""
    kernel = np.asarray(kernel)
    flat, o = kernel.shape
    hw = int(round((flat // c_last) ** 0.5))
    assert c_last * hw * hw == flat, (kernel.shape, c_last)
    w = kernel.reshape(hw, hw, c_last, o).transpose(3, 2, 0, 1)
    return w.reshape(o, c_last * hw * hw)


def _emit_conv(out, key, node):
    out[key + ".weight"] = _conv_w(node["kernel"])
    if "bias" in node:
        out[key + ".bias"] = np.asarray(node["bias"])


def _emit_bn(out, key, pnode, bnode):
    out[key + ".weight"] = np.asarray(pnode["scale"])
    out[key + ".bias"] = np.asarray(pnode["bias"])
    out[key + ".running_mean"] = np.asarray(bnode["mean"])
    out[key + ".running_var"] = np.asarray(bnode["var"])


def _export_resnet(out, params, bstats, prefix):
    for name, node in params.items():
        bnode = bstats.get(name, {})
        if name == "conv1":
            _emit_conv(out, f"{prefix}.conv1", node)
        elif name == "bn1":
            _emit_bn(out, f"{prefix}.bn1", node, bnode)
        elif name == "fc":
            out[f"{prefix}.fc.weight"] = _linear_w(node["kernel"])
            out[f"{prefix}.fc.bias"] = np.asarray(node["bias"])
        else:
            m = re.fullmatch(r"layer(\d)_(\d+)", name)
            if not m:
                raise KeyError(f"unknown base_model module {name!r}")
            block = f"{prefix}.layer{m.group(1)}.{m.group(2)}"
            for sub, snode in node.items():
                sb = bnode.get(sub, {})
                if sub in ("conv1", "conv2"):
                    _emit_conv(out, f"{block}.{sub}", snode)
                elif sub in ("bn1", "bn2"):
                    _emit_bn(out, f"{block}.{sub}", snode, sb)
                elif sub == "downsample_conv":
                    _emit_conv(out, f"{block}.downsample.0", snode)
                elif sub == "downsample_bn":
                    _emit_bn(out, f"{block}.downsample.1", snode, sb)
                else:
                    raise KeyError(f"unknown resnet leaf {name}.{sub}")


def _export_estimator(out, params, bstats, prefix):
    for name, node in params.items():
        bnode = bstats.get(name, {})
        if re.fullmatch(r"conv_\d+(_mv|_r)?", name):
            # dense-family conv: Sequential(conv, LeakyReLU) -> .0
            _emit_conv(out, f"{prefix}.{name}.0", node)
        elif name == "predict_flow" and "kernel" in node:
            # dense family: bare conv (reference predict_flow, model.py:118)
            _emit_conv(out, f"{prefix}.predict_flow", node)
        elif name in ("predict_flow", "predict_att"):
            # ContextNetworkAtt heads: Sequential(conv, bn)
            base = (f"{prefix}.{name}" if name == "predict_flow"
                    else f"{prefix}.{name}.0")
            _emit_conv(out, f"{base}.0", node["conv"])
            _emit_bn(out, f"{base}.1", node["bn"], bnode.get("bn", {}))
        elif re.fullmatch(r"stage_\d+", name):
            idx = name.split("_")[1]
            _emit_conv(out, f"{prefix}.conv_context.{idx}.0", node["conv"])
            _emit_bn(out, f"{prefix}.conv_context.{idx}.1", node["bn"],
                     bnode.get("bn", {}))
        else:
            raise KeyError(f"unknown gen_flow_model module {name!r}")


def _export_discriminator(out, params, bstats, prefix):
    # adv_layer flatten reorder needs the final conv's out-channel count
    last_c = None
    for name, node in params.items():
        m = re.fullmatch(r"stage(\d)_(down|deep(\d))", name)
        if m:
            c = int(np.asarray(node["conv"]["kernel"]).shape[-1])
            rank = (int(m.group(1)), -1 if m.group(2) == "down"
                    else int(m.group(3)))
            if last_c is None or rank > last_c[0]:
                last_c = (rank, c)
    for name, node in params.items():
        bnode = bstats.get(name, {})
        if name == "adv_layer":
            w = (_flattened_linear_w(node["kernel"], last_c[1])
                 if last_c else _linear_w(node["kernel"]))
            out[f"{prefix}.adv_layer.weight"] = w
            out[f"{prefix}.adv_layer.bias"] = np.asarray(node["bias"])
            continue
        m = re.fullmatch(r"stage(\d)_(down|deep(\d))", name)
        if not m:
            raise KeyError(f"unknown discriminator module {name!r}")
        stage = int(m.group(1)) + 1
        block = (f"{prefix}.discriminator_block_{stage}"
                 if m.group(2) == "down" else
                 f"{prefix}.discriminator_block_{stage}_"
                 f"{int(m.group(3)) + 1}")
        _emit_conv(out, f"{block}.0", node["conv"])
        if "bn" in node:
            _emit_bn(out, f"{block}.3", node["bn"], bnode.get("bn", {}))


def export_state_dict(params, batch_stats):
    """flax {params, batch_stats} -> reference torch state_dict (numpy
    values, torch key names/layouts).  Inverse of
    import_torch.import_state_dict."""
    out = {}
    exporters = {
        "base_model": _export_resnet,
        "gen_flow_model": _export_estimator,
        "discriminator": _export_discriminator,
    }
    for top, node in params.items():
        fn = exporters.get(top)
        if fn is None:
            raise KeyError(
                f"no reference-format export rule for module {top!r}")
        fn(out, node, batch_stats.get(top, {}), top)
    return out


def save_reference_checkpoint(state, path, epoch=0, arch="resnet18",
                              best_prec1=0.0):
    """Write a reference-loadable `.pth.tar`
    (format: /root/reference/code/dmcnet/train.py:372-377)."""
    import torch

    sd = export_state_dict(
        state.params, state.batch_stats if state.batch_stats else {})
    payload = {
        "epoch": int(epoch),
        "arch": arch,
        "state_dict": {k: torch.from_numpy(
                           np.array(v, copy=True, order="C"))
                       for k, v in sd.items()},
        "best_prec1": float(best_prec1),
    }
    torch.save(payload, path)
    return path
