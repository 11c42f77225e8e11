"""Optimizers with reference parameter-group semantics.

The reference builds torch Adam(eps=1e-3) optimizers over parameter groups
carrying `lr_mult` / `decay_mult` (biases get decay_mult=0), with effective
lr = base_lr * lr_mult recomputed per epoch by a stepwise schedule
(/root/reference/code/dmcnet/train.py:121-142,398-408).  torch Adam applies
weight decay as L2-in-gradient (grad += wd * param) *before* the moment
updates — NOT decoupled AdamW — so `GroupAdam` reproduces exactly that:

    u = grad + (wd * decay_mult) * param
    m, v Adam moments over u  (eps=1e-3)
    param -= (lr * lr_mult) * m_hat / (sqrt(v_hat) + eps)

`lr` and `wd` are traced scalars (changing them never recompiles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def step_decay_lr(base_lr, epoch, lr_steps, lr_decay):
    """Stepwise decay: lr * decay^(#steps passed) (reference train.py:398-400)."""
    passed = sum(1 for s in lr_steps if epoch >= s)
    return base_lr * (lr_decay ** passed)


def _path_has_bias(path):
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", str(last)))
    return key == "bias"


def decay_mult_tree(params):
    """decay_mult mask: 0.0 for biases, 1.0 otherwise (train.py:126,130).

    Note flax BatchNorm 'scale' (torch BN .weight) keeps decay_mult=1, just
    like the reference.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, _: 0.0 if _path_has_bias(path) else 1.0, params)


def lr_mult_tree(params, group_mults, default=0.0):
    """Per-leaf lr_mult from top-level group name -> mult mapping.

    Reference groups: 'base_model' -> lr_cls_mult, 'gen_flow_model' ->
    lr_mse_mult, 'discriminator' -> lr_d_mult (train.py:124-132,
    dmcnet_GAN/train.py:124-153).  Parameters outside any named group get
    `default` (the reference simply never adds them to an optimizer).
    """
    def mult_for(path):
        top = getattr(path[0], "key", getattr(path[0], "name", str(path[0])))
        return float(group_mults.get(top, default))

    return jax.tree_util.tree_map_with_path(
        lambda path, _: mult_for(path), params)


class GroupSGD:
    """torch-semantics SGD(momentum=0.9, nesterov) with per-leaf lr/decay
    multipliers — the I3D trainer's default optimizer
    (code/dmcnet_I3D/train_model.py:133-146):

        u   = grad + wd * decay_mult * p
        buf = momentum * buf + u
        p  -= lr * lr_mult * (u + momentum * buf)    # nesterov
    """

    def __init__(self, params, lr_mults, decay_mults, momentum=0.9,
                 nesterov=True):
        self.lr_mults = lr_mults
        self.decay_mults = decay_mults
        self.momentum = momentum
        self.nesterov = nesterov

    def init(self, params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(self, grads, opt_state, params, lr, wd):
        m, nest = self.momentum, self.nesterov

        def leaf(g, buf, p, dm):
            u = g + wd * dm * p
            buf = m * buf + u
            step = (u + m * buf) if nest else buf
            return buf, step

        out = jax.tree.map(leaf, grads, opt_state, params, self.decay_mults)
        bufs = jax.tree.map(lambda o: o[0], out,
                            is_leaf=lambda o: isinstance(o, tuple))
        steps = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda o: isinstance(o, tuple))
        new_params = jax.tree.map(
            lambda p, s, lm: p - lr * lm * s, params, steps, self.lr_mults)
        return new_params, bufs


class GroupAdam:
    """Adam(eps=1e-3) with per-leaf lr/decay multipliers, masked to a group.

    `group_mask` is a per-leaf 0/1 tree selecting which params this optimizer
    owns; leaves outside the group are never touched (their moments stay
    zero and updates are zeroed), mirroring the reference's separate
    per-group torch optimizers.
    """

    def __init__(self, params, lr_mults, decay_mults, eps=1e-3,
                 b1=0.9, b2=0.999):
        self.lr_mults = lr_mults
        self.decay_mults = decay_mults
        self._adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init(self, params):
        return self._adam.init(params)

    def update(self, grads, opt_state, params, lr, wd):
        """Returns (new_params, new_opt_state); lr/wd are traced scalars."""
        u = jax.tree.map(
            lambda g, p, dm: g + wd * dm * p,
            grads, params, self.decay_mults)
        u, opt_state = self._adam.update(u, opt_state)
        new_params = jax.tree.map(
            lambda p, upd, lm: p - lr * lm * upd,
            params, u, self.lr_mults)
        return new_params, opt_state

    def masked_update(self, grads, opt_state, params, lr, wd, enabled):
        """Like update, but a traced bool `enabled` gates the whole step
        (params AND moments frozen when disabled) — the freeze-phase
        semantics of reference train.py:260-266."""
        new_params, new_state = self.update(grads, opt_state, params, lr, wd)
        pick = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(enabled, n, o), new, old)
        return pick(new_params, params), pick(new_state, opt_state)
