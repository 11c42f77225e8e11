"""Checkpoint save/load.

The on-disk layout mirrors the reference's naming scheme
(code/dmcnet/train.py:372-377): `<prefix>_<representation>_checkpoint.pth.tar`
with the best copied to `..._model_best.pth.tar` — but the payload is a
framework-native msgpack of the full TrainState (params, batch_stats, all
optimizer moments) plus metadata {epoch, arch, best_prec1}, so resume is
exact.  Reference torch checkpoints are importable via
`models.import_torch` (the `--weights` partial-init path, train.py:64-68).
"""

from __future__ import annotations

import os
import pickle
import shutil

import jax
import numpy as np
from flax import serialization


def save_checkpoint(state, meta, filename, is_best=False):
    """Write state+meta; copy to *_model_best.* when is_best
    (reference save_checkpoint, train.py:372-377)."""
    payload = {
        "meta": dict(meta),
        "state": serialization.to_bytes(jax.tree.map(np.asarray, state)),
    }
    parent = os.path.dirname(filename)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, filename)
    if is_best:
        best = filename.replace("checkpoint", "model_best")
        shutil.copyfile(filename, best)
    return filename


def load_checkpoint(state_template, filename):
    """Restore (state, meta); `state_template` supplies the pytree structure."""
    with open(filename, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(state_template, payload["state"])
    return state, payload["meta"]


def load_checkpoint_params(state_template, filename):
    """Restore only params/batch_stats from a checkpoint whose optimizer
    states may not match the template (e.g. eval drivers build a TrainState
    with opt_cls=None while training checkpoints carry full moments)."""
    with open(filename, "rb") as f:
        payload = pickle.load(f)
    raw = serialization.msgpack_restore(payload["state"])
    params = serialization.from_state_dict(state_template.params,
                                           raw["params"])
    bstats = serialization.from_state_dict(state_template.batch_stats,
                                           raw["batch_stats"])
    return (state_template.replace(params=params, batch_stats=bstats),
            payload["meta"])


def checkpoint_name(model_prefix, representation, kind="checkpoint"):
    return "_".join((model_prefix, representation.lower(),
                     kind + ".pth.tar"))


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def _committed_steps(path):
    """Sorted committed step numbers under an orbax checkpoint root.  A
    step is committed when orbax's atomic `state/` rename happened AND
    meta.pkl exists (meta is written first, so state/ implies both except
    for a pre-meta crash, which this correctly treats as torn)."""
    steps = []
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.isdigit() and \
                    os.path.isdir(os.path.join(path, name, "state")) and \
                    os.path.exists(os.path.join(path, name, "meta.pkl")):
                steps.append(int(name))
    return sorted(steps)


def _write_meta(step_dir, meta):
    """Atomic meta.pkl (tmp + rename): a torn meta can never be read."""
    os.makedirs(step_dir, exist_ok=True)
    tmp = os.path.join(step_dir, "meta.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(dict(meta), f)
    os.replace(tmp, os.path.join(step_dir, "meta.pkl"))


def save_checkpoint_orbax(state, meta, directory, wait=True, keep=2):
    """Orbax backend: sharding-aware checkpointing for multi-host/production
    runs (the msgpack path above stays the default for single-host parity
    with the reference's file naming).

    The state is handed to orbax AS PLACED — sharded leaves (FSDP/TP, see
    parallel/fsdp.py) are written shard-by-shard with every process
    contributing its addressable shards; no host gather happens.  meta is
    process-0-only (orbax coordinates the array writes itself).

    Each save lands in its own `<directory>/<meta['epoch']>/` step dir
    (meta.pkl first, atomically; then the arrays, committed by orbax's
    atomic `state/` rename) — a crash or preemption at ANY point leaves
    every previously committed step intact, so `--auto-resume` always has
    a good checkpoint.  The newest `keep` committed steps are retained;
    older ones are pruned before the new write starts.

    `wait=False` = async: the device->host snapshot happens before this
    returns (donated train steps may immediately overwrite the state), but
    serialization + disk writes proceed on a background thread while
    training continues — call `wait_for_checkpoints()` before reading the
    directory or exiting the process.  A new save first drains the
    previous in-flight one (orbax serializes saves per checkpointer)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    step = int(meta.get("epoch", 0))
    if jax.process_index() == 0:
        # prune, keeping the newest keep-1 committed steps (+ the new one);
        # never touches anything a torn write could leave half-deleted
        # never prune the newest existing step before the new one commits
        for old in _committed_steps(path)[:-max(keep - 1, 1)]:
            if old != step:
                shutil.rmtree(os.path.join(path, str(old)),
                              ignore_errors=True)
        _write_meta(os.path.join(path, str(step)), meta)
    target = os.path.join(path, str(step), "state")
    if wait:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, state, force=True)
    else:
        _async_checkpointer().save(target, state, force=True)
    return path


def wait_for_checkpoints():
    """Block until every async `save_checkpoint_orbax(..., wait=False)` has
    committed to disk.  No-op when none are in flight."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def orbax_checkpoint_committed(directory):
    """True iff `directory` holds at least one COMMITTED checkpoint: a step
    dir (or the legacy flat layout) with meta.pkl present whose arrays
    orbax finished — orbax writes into a tmp dir and renames it to `state/`
    only on commit, so an interrupted (e.g. preempted mid-async-write) save
    never gains it.  `--auto-resume` uses this to skip torn checkpoints."""
    path = os.path.abspath(directory)
    if _committed_steps(path):
        return True
    return (os.path.isdir(os.path.join(path, "state"))
            and os.path.exists(os.path.join(path, "meta.pkl")))


def _resolve_orbax(directory):
    """(state_path, meta_path) of the newest committed checkpoint under
    `directory`: the highest committed step dir, or the pre-step-layout
    flat `state/` + `meta.pkl` (round-3 compat)."""
    path = os.path.abspath(directory)
    steps = _committed_steps(path)
    if steps:
        step_dir = os.path.join(path, str(steps[-1]))
        return (os.path.join(step_dir, "state"),
                os.path.join(step_dir, "meta.pkl"))
    return os.path.join(path, "state"), os.path.join(path, "meta.pkl")


def load_checkpoint_orbax(state_template, directory):
    """Restore (state, meta) from the newest committed step.  Leaves of
    `state_template` that are placed jax Arrays come back with the SAME
    sharding (each process reads only its shards); host-numpy template
    leaves restore as host numpy."""
    import orbax.checkpoint as ocp

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return np.asarray(x)

    state_path, meta_path = _resolve_orbax(directory)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            state_path, jax.tree.map(abstract, state_template))
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    return state, meta


def load_checkpoint_params_orbax(state_template, directory):
    """Orbax twin of load_checkpoint_params: restore only params and
    batch_stats from a directory checkpoint whose optimizer states may not
    match the template (serving loads with opt_cls=None)."""
    import orbax.checkpoint as ocp

    state_path, meta_path = _resolve_orbax(directory)
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(state_path)
    params = serialization.from_state_dict(state_template.params,
                                           raw["params"])
    bstats = serialization.from_state_dict(state_template.batch_stats,
                                           raw["batch_stats"])
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    return (state_template.replace(params=params, batch_stats=bstats),
            meta)


def load_reference_weights(state, model_variables_template, path):
    """Partial-init from a reference torch checkpoint (--weights semantics:
    prefix-stripped, non-strict; train.py:64-68).  Returns updated
    (params, batch_stats)."""
    from dmcnet_tpu.models.import_torch import (
        import_state_dict, load_pth_tar, merge_variables)

    sd = load_pth_tar(path)
    imported, skipped = import_state_dict(sd)
    merged, missing = merge_variables(
        {"params": state.params, "batch_stats": state.batch_stats}, imported,
        strict_shapes=False)
    return merged["params"], merged["batch_stats"], skipped, missing
