"""Import Kinetics TF I3D checkpoints into flax variables.

TPU-native equivalent of the reference `load_tf_weights` + helpers
(/root/reference/code/dmcnet_I3D/network/i3d.py:605-763).  The reference
pulls tensors out of a live tf.Session graph; this importer consumes a plain
mapping of TF variable names -> numpy arrays (from `np.load` of an exported
.npz, or from `tf.train.load_checkpoint` where TF is installed), so no
TensorFlow dependency is needed on the TPU host.

TF layout notes (why this importer is *simpler* than the torch one):
  * TF conv3d kernels are (kt, kh, kw, in, out) — exactly flax's NDHWC Conv
    layout, so kernels copy with NO transpose (the reference transposes to
    torch OIthw, i3d.py:719-722, and we'd transpose back);
  * TF batch_norm stores beta + moving_{mean,variance} and no gamma — scale
    is fixed to ones (reference i3d.py:730-736);
  * the released checkpoint names mixed_5b's second Branch_2 conv
    `Conv3d_0a_3x3` (a typo); the reference handles it with `fix_typo`
    (i3d.py:737-746) and so does `_MIXED_TF`;
  * only the backbone through `Logits/Conv3d_0c_1x1` exists in the TF
    checkpoint — the 400->num_classes `classifier` stays at its fresh init.
"""

from __future__ import annotations

import numpy as np

from dmcnet_tpu.models.import_torch import _set, merge_variables

_CONVS = [
    ("conv3d_1a_7x7", "Conv3d_1a_7x7"),
    ("conv3d_2b_1x1", "Conv3d_2b_1x1"),
    ("conv3d_2c_3x3", "Conv3d_2c_3x3"),
]

_MIXED = ["mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
          "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c"]


def _mixed_branches(name):
    """flax branch name -> TF sub-scope for one Mixed block."""
    fix_typo = name == "mixed_5b"  # released-checkpoint typo (i3d.py:744)
    return {
        "branch_0": "Branch_0/Conv3d_0a_1x1",
        "branch_1a": "Branch_1/Conv3d_0a_1x1",
        "branch_1b": "Branch_1/Conv3d_0b_3x3",
        "branch_2a": "Branch_2/Conv3d_0a_1x1",
        "branch_2b": ("Branch_2/Conv3d_0a_3x3" if fix_typo
                      else "Branch_2/Conv3d_0b_3x3"),
        "branch_3b": "Branch_3/Conv3d_0b_1x1",
    }


def _get(tf_vars, name):
    if name in tf_vars:
        return np.asarray(tf_vars[name])
    raise KeyError(f"TF variable {name!r} not in checkpoint "
                   f"({len(tf_vars)} vars)")


def _load_unit(params, batch_stats, path, tf_vars, scope, *, bias=False,
               bn=True, in_channels=None):
    """One Unit3D: conv_3d/w [+ conv_3d/b] [+ batch_norm/{beta,moving_*}]."""
    w = _get(tf_vars, f"{scope}/conv_3d/w")  # (kt, kh, kw, I, O) == flax
    if in_channels and w.shape[3] != in_channels:
        # rgb->flow stem adaptation: channel-mean then broadcast
        # (reference train/model.py:55-58).
        w = np.broadcast_to(w.mean(axis=3, keepdims=True),
                            w.shape[:3] + (in_channels,) + w.shape[4:]).copy()
    _set(params, path + ("conv3d", "kernel"), w)
    if bias:
        _set(params, path + ("conv3d", "bias"),
             _get(tf_vars, f"{scope}/conv_3d/b"))
    if bn:
        beta = _get(tf_vars, f"{scope}/batch_norm/beta").reshape(-1)
        mean = _get(tf_vars, f"{scope}/batch_norm/moving_mean").reshape(-1)
        var = _get(tf_vars, f"{scope}/batch_norm/moving_variance").reshape(-1)
        _set(params, path + ("batch3d", "scale"), np.ones_like(beta))
        _set(params, path + ("batch3d", "bias"), beta)
        _set(batch_stats, path + ("batch3d", "mean"), mean)
        _set(batch_stats, path + ("batch3d", "var"), var)


def import_tf_i3d(tf_vars, modality="rgb", in_channels=None):
    """TF var-name dict -> {'params', 'batch_stats'} flax trees.

    `modality` selects the checkpoint scope prefix ('RGB/inception_i3d' vs
    'Flow/inception_i3d', reference i3d.py:607-611); non-rgb/flow modalities
    use the flow scope with the stem channel-adapted to `in_channels`.
    """
    prefix = ("RGB/inception_i3d" if modality == "rgb"
              else "Flow/inception_i3d")
    params, batch_stats = {}, {}
    for flax_name, tf_name in _CONVS:
        _load_unit(params, batch_stats, (flax_name,), tf_vars,
                   f"{prefix}/{tf_name}",
                   in_channels=(in_channels if flax_name == "conv3d_1a_7x7"
                                else None))
    for name in _MIXED:
        tf_mixed = f"{prefix}/{name[0].upper() + name[1:]}"
        for branch, sub in _mixed_branches(name).items():
            _load_unit(params, batch_stats, (name, branch), tf_vars,
                       f"{tf_mixed}/{sub}")
    _load_unit(params, batch_stats, ("conv3d_0c_1x1",), tf_vars,
               f"{prefix}/Logits/Conv3d_0c_1x1", bias=True, bn=False)
    return {"params": params, "batch_stats": batch_stats}


def load_tf_weights(path_or_vars, params, batch_stats, modality="rgb",
                    in_channels=None):
    """Partial-load TF I3D weights into initialized (params, batch_stats).

    `path_or_vars` is a dict of TF var names -> arrays, or a path to an
    .npz holding them (keys with '/' separators).  Returns
    (params, batch_stats, report) like `load_i3d_pth`.
    """
    if isinstance(path_or_vars, (str, bytes)):
        with np.load(path_or_vars) as z:
            tf_vars = {k: z[k] for k in z.files}
    else:
        tf_vars = dict(path_or_vars)
    imported = import_tf_i3d(tf_vars, modality=modality,
                             in_channels=in_channels)
    merged, missing = merge_variables(
        {"params": params, "batch_stats": batch_stats}, imported,
        strict_shapes=False)
    n = sum(1 for _ in _walk(imported["params"]))
    report = f"tf-imported={n} shape-missed={len(missing)}"
    return merged["params"], merged["batch_stats"], report


def _walk(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v
