"""Jitted alternating D/G train steps for the dmcnet_GAN variant.

Reference: /root/reference/code/dmcnet_GAN/train.py:219-380 —

  even batches (train D): forward WITH the real flow; the discriminator
    scores fake‖real stacked on batch (model.py:553-561); loss =
    loss_cls*lr_cls + CE(validity, [fake(0)‖valid(1)])*lr_adv_d; steps the
    classifier AND discriminator optimizers (generator untouched even though
    gradients flow into it — only the chosen optimizers step);
  odd batches (train G): forward without real flow; loss = loss_cls*lr_cls
    + CE(validity, valid)*lr_adv_g + loss_mse*lr_mse; steps only the
    generator optimizer.

The GAN classifier path is NOT detached (dmcnet_GAN/model.py:560), so
`DMCNet(detach_classifier=False)` must be used.  The freeze phase
(epoch < epoch_thre) is expressed by passing lr=0 to the classifier update
(reference adjust_learning_rate(freeze=True)); torch still updates Adam
moments in that case and so do we (moments are updated, params unchanged).

Two separately compiled step functions selected by host-side batch parity —
the XLA analogue of the reference's `i % 2` branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmcnet_tpu.models.tsn import segment_consensus
from dmcnet_tpu.train.engine import (
    cross_entropy,
    reconstruction_loss,
    topk_correct,
)


def make_gan_train_steps(model, opts, *, num_segments, lr_cls_w, lr_adv_g,
                         lr_adv_d, lr_mse_w, loss_mse="MSELoss", jit=True):
    """Returns (d_step, g_step).

    Each: fn(state, batch, rng, lr, lr_cls, lr_d, wd) -> (state, metrics).
    `lr` drives the generator, `lr_cls` the classifier (0 while frozen),
    `lr_d` the discriminator.
    """
    rec_loss = reconstruction_loss(loss_mse)

    def _forward(params, state, batch, rng, with_flow):
        variables = {"params": params, "batch_stats": state.batch_stats}
        flow = batch["flow"].reshape((-1,) + batch["flow"].shape[-3:])
        args = (batch["mv"], batch["residual"], flow if with_flow else None)
        (logits, gen_flow, validity), mutated = model.apply(
            variables, *args, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        consensus = segment_consensus(logits, num_segments)
        return consensus, gen_flow, validity, flow, mutated["batch_stats"]

    def d_step(state, batch, rng, lr, lr_cls, lr_d, wd):
        labels = batch["label"]
        n_fake = batch["mv"].shape[0] * num_segments
        adv_labels = jnp.concatenate([
            jnp.zeros((n_fake,), jnp.int32),
            jnp.ones((n_fake,), jnp.int32)])

        def loss_fn(params):
            consensus, gen_flow, validity, flow, bs = _forward(
                params, state, batch, rng, with_flow=True)
            loss_cls = cross_entropy(consensus, labels)
            loss_adv = cross_entropy(validity, adv_labels)
            loss = loss_cls * lr_cls_w + loss_adv * lr_adv_d
            return loss, (loss_cls, loss_adv, consensus, validity, bs)

        grads, (loss_cls, loss_adv, consensus, validity, bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_cls = opts["cls"].update(
            grads, state.opt_cls, state.params, lr_cls, wd)
        params, opt_d = opts["d"].update(grads, state.opt_d, params, lr_d, wd)
        new_state = state.replace(params=params, batch_stats=bs,
                                  opt_cls=opt_cls, opt_d=opt_d,
                                  step=state.step + 1)
        top1, top5 = topk_correct(consensus, labels, (1, 5))
        (acc_d,) = topk_correct(validity, adv_labels, (1,))
        return new_state, {
            "loss": loss_cls * lr_cls_w + loss_adv * lr_adv_d,
            "loss_cls": loss_cls, "loss_adv": loss_adv,
            "top1": top1, "top5": top5, "acc_D_adv": acc_d,
        }

    def g_step(state, batch, rng, lr, lr_cls, lr_d, wd):
        del lr_cls, lr_d
        labels = batch["label"]
        n_fake = batch["mv"].shape[0] * num_segments
        valid = jnp.ones((n_fake,), jnp.int32)

        def loss_fn(params):
            consensus, gen_flow, validity, flow, bs = _forward(
                params, state, batch, rng, with_flow=False)
            loss_cls = cross_entropy(consensus, labels)
            loss_adv = cross_entropy(validity, valid)
            loss_rec = rec_loss(gen_flow, flow)
            loss = (loss_cls * lr_cls_w + loss_adv * lr_adv_g
                    + loss_rec * lr_mse_w)
            return loss, (loss_cls, loss_adv, loss_rec, consensus, validity,
                          bs)

        grads, (loss_cls, loss_adv, loss_rec, consensus, validity, bs) = \
            jax.grad(loss_fn, has_aux=True)(state.params)
        params, opt_gf = opts["gf"].update(
            grads, state.opt_gf, state.params, lr, wd)
        new_state = state.replace(params=params, batch_stats=bs,
                                  opt_gf=opt_gf, step=state.step + 1)
        top1, top5 = topk_correct(consensus, labels, (1, 5))
        (acc_g,) = topk_correct(validity, valid, (1,))
        return new_state, {
            "loss": (loss_cls * lr_cls_w + loss_adv * lr_adv_g
                     + loss_rec * lr_mse_w),
            "loss_cls": loss_cls, "loss_adv": loss_adv, "loss_mse": loss_rec,
            "top1": top1, "top5": top5, "acc_G_adv": acc_g,
        }

    if jit:
        # in-place state update on device (see engine.make_train_step)
        return (jax.jit(d_step, donate_argnums=(0,)),
                jax.jit(g_step, donate_argnums=(0,)))
    return d_step, g_step
