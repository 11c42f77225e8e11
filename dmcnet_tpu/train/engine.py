"""Jitted train/eval steps for the dmcnet (no-GAN) variant.

Reproduces the reference loop semantics (/root/reference/code/dmcnet/train.py):

  * TSN consensus: per-segment logits averaged before cross-entropy
    (train.py:239-241),
  * total loss = loss_cls * lr_cls + loss_mse * lr_mse (train.py:248); the
    generator only ever sees the MSE gradient because the classifier input is
    stop_gradient'ed inside the model (model.py:352),
  * two Adam optimizers over disjoint parameter groups (base_model /
    gen_flow_model) with lr_mult/decay_mult semantics (train.py:121-142),
  * freeze phase (`epoch < epoch_thre`): the classifier optimizer does not
    step at all — parameters AND moments frozen (train.py:260-266,402-404),
  * configurable reconstruction loss: MSELoss | SmoothL1Loss | L1
    (train.py:167-172).

Everything is one `jax.jit`-compiled function per (model, loss) config; the
epoch-dependent learning rate, weight decay, and the freeze flag are traced
scalars so epoch transitions never recompile.  Batches are NHWC.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dmcnet_tpu.models.tsn import segment_consensus
from dmcnet_tpu.train.optimizers import (
    GroupAdam,
    decay_mult_tree,
    lr_mult_tree,
)


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_cls: Any
    opt_gf: Any
    opt_d: Optional[Any] = None
    # Persistent gradient accumulator = torch's param.grad buffers.  Only
    # the I3D GAN trainer populates it: the reference's fit loop never
    # zeroes the generator grads during the D phase (or base/discriminator
    # grads during the G phase), so each optimizer steps with its own
    # phase's gradients PLUS the other phase's carry-over
    # (code/dmcnet_I3D/train/model.py:354-486: zero_grad is per-optimizer
    # and only runs right after that optimizer's step).  None = no carry
    # (dmcnet/GAN trainers, whose loops zero every optimizer each step).
    grad_acc: Optional[Any] = None
    step: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def reconstruction_loss(kind):
    """'MSELoss' | 'SmoothL1Loss' | 'L1' with torch mean reduction."""
    if kind == "MSELoss":
        return lambda pred, tgt: jnp.mean((pred - tgt) ** 2)
    if kind == "SmoothL1Loss":
        return lambda pred, tgt: jnp.mean(optax.huber_loss(pred, tgt, delta=1.0))
    if kind == "L1":
        return lambda pred, tgt: jnp.mean(jnp.abs(pred - tgt))
    raise ValueError(f"unknown reconstruction loss {kind!r}")


def cross_entropy(logits, labels):
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def make_optimizers(model, params, lr_cls_mult, lr_mse_mult, lr_d_mult=None):
    """Build the reference's per-group optimizers over one param tree."""
    decay_mults = decay_mult_tree(params)
    opts = {
        "cls": GroupAdam(params,
                         lr_mult_tree(params, {"base_model": lr_cls_mult}),
                         decay_mults),
        "gf": GroupAdam(params,
                        lr_mult_tree(params, {"gen_flow_model": lr_mse_mult}),
                        decay_mults),
    }
    if lr_d_mult is not None:
        opts["d"] = GroupAdam(
            params, lr_mult_tree(params, {"discriminator": lr_d_mult}),
            decay_mults)
    return opts


def create_train_state(model, rng, sample_batch, lr_cls_mult, lr_mse_mult,
                       lr_d_mult=None):
    """Initialize params/batch_stats and optimizer states."""
    init_args = [sample_batch["mv"], sample_batch["residual"]]
    if getattr(model, "arch_d", None):
        init_args.append(sample_batch["flow"])
    variables = model.init(rng, *init_args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opts = make_optimizers(model, params, lr_cls_mult, lr_mse_mult, lr_d_mult)
    state = TrainState(
        params=params, batch_stats=batch_stats,
        opt_cls=opts["cls"].init(params),
        opt_gf=opts["gf"].init(params),
        opt_d=opts["d"].init(params) if "d" in opts else None)
    return state, opts


def make_train_step(model, opts, *, num_segments, lr_cls_w, lr_mse_w,
                    loss_mse="MSELoss", jit=True):
    """dmcnet train step.  Returns fn(state, batch, rng, lr, wd, train_cls)
    -> (state, metrics); `train_cls` is False during the freeze phase.
    Pass jit=False to get the raw function (for sharded wrappers)."""
    rec_loss = reconstruction_loss(loss_mse)

    def step(state, batch, rng, lr, wd, train_cls):
        flow = batch["flow"].reshape((-1,) + batch["flow"].shape[-3:])
        labels = batch["label"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outs, mutated = model.apply(
                variables, batch["mv"], batch["residual"], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            logits, gen_flow = outs[0], outs[1]
            consensus = segment_consensus(logits, num_segments)
            loss_cls = cross_entropy(consensus, labels)
            loss_rec = rec_loss(gen_flow, flow)
            total = loss_cls * lr_cls_w + loss_rec * lr_mse_w
            aux = {
                "loss": total, "loss_cls": loss_cls, "loss_mse": loss_rec,
                "logits": consensus,
                "batch_stats": mutated.get("batch_stats", state.batch_stats),
            }
            return total, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        params, opt_gf = opts["gf"].update(
            grads, state.opt_gf, state.params, lr, wd)
        params, opt_cls = opts["cls"].masked_update(
            grads, state.opt_cls, params, lr, wd, train_cls)
        new_state = state.replace(
            params=params, batch_stats=aux["batch_stats"], opt_cls=opt_cls,
            opt_gf=opt_gf, step=state.step + 1)
        top1, top5 = topk_correct(aux["logits"], labels, (1, 5))
        metrics = {
            "loss": aux["loss"], "loss_cls": aux["loss_cls"],
            "loss_mse": aux["loss_mse"], "top1": top1, "top5": top5,
        }
        return new_state, metrics

    # Donate the state: params + both optimizers' moments are rewritten every
    # step, so XLA can update them in place instead of allocating a second
    # copy in HBM.  Callers must follow `state, m = step(state, ...)` and not
    # reuse the donated input (all CLIs/benches do).
    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_eval_step(model, *, num_segments, lr_cls_w, lr_mse_w,
                   loss_mse="MSELoss", jit=True):
    """Validation step (reference validate(), train.py:292-369).

    An optional per-sample 0/1 `batch['weight']` masks padded rows: callers
    pad the ragged final batch to a fixed size (one XLA compile total) and
    the returned means are exact over the valid rows only.  Pass jit=False
    for sharded wrappers (parallel.make_sharded_eval_step).
    """
    rec_loss = reconstruction_loss(loss_mse)

    def step(state, batch):
        flow = batch["flow"].reshape((-1,) + batch["flow"].shape[-3:])
        labels = batch["label"]
        w = batch.get("weight")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outs = model.apply(
            variables, batch["mv"], batch["residual"], train=False)
        logits, gen_flow = outs[0], outs[1]
        consensus = segment_consensus(logits, num_segments)
        ce = optax.softmax_cross_entropy_with_integer_labels(consensus,
                                                             labels)
        if getattr(model, "att", 0):
            # attention-weighted reconstruction (reference validate,
            # train.py:332-335)
            att_flow = outs[-1]
            rec = (att_flow * gen_flow, att_flow * flow)
        else:
            rec = (gen_flow, flow)
        if w is None:
            loss_cls = jnp.mean(ce)
            loss_rec = rec_loss(*rec)
            top1, top5 = topk_correct(consensus, labels, (1, 5))
        else:
            w = w.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            loss_cls = (ce * w).sum() / denom
            # per-sample reconstruction loss, masked; `rec` tensors carry
            # segments on the leading axis (B * S)
            per = jax.vmap(rec_loss)(*rec)
            s = per.shape[0] // w.shape[0]
            per_sample = per.reshape(w.shape[0], s).mean(axis=1)
            loss_rec = (per_sample * w).sum() / denom
            top1, top5 = topk_correct(consensus, labels, (1, 5), weights=w)
        return {
            "loss": loss_cls * lr_cls_w + loss_rec * lr_mse_w,
            "loss_cls": loss_cls, "loss_mse": loss_rec,
            "top1": top1, "top5": top5, "logits": consensus,
        }

    return jax.jit(step) if jit else step


def topk_correct(logits, labels, ks=(1, 5), weights=None):
    """Fraction correct @k * 100, like reference accuracy() (train.py:411-424).
    Optional per-sample `weights` mask padded rows out of the mean."""
    ranks = jnp.argsort(-logits, axis=-1)
    out = []
    for k in ks:
        k_eff = min(k, logits.shape[-1])
        hit = (ranks[:, :k_eff] == labels[:, None]).any(axis=-1)
        hit = hit.astype(jnp.float32)
        if weights is None:
            out.append(100.0 * jnp.mean(hit))
        else:
            out.append(100.0 * (hit * weights).sum()
                       / jnp.maximum(weights.sum(), 1.0))
    return out
