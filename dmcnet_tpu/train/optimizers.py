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
        # Momentum buffers exist only for owned leaves (lr_mult != 0):
        # unowned leaves carry a shape-() placeholder, so an optimizer that
        # owns one group costs only that group's HBM — like the reference's
        # per-group torch optimizers (train.py:121-142), not full-tree state.
        return jax.tree.map(
            lambda p, lm: jnp.zeros_like(p) if lm != 0.0
            else jnp.zeros((), p.dtype),
            params, self.lr_mults)

    def update(self, grads, opt_state, params, lr, wd):
        m, nest = self.momentum, self.nesterov

        def leaf(g, buf, p, dm, lm):
            if lm == 0.0:  # static: unowned leaf, untouched
                return buf, p
            u = g + wd * dm * p
            buf = m * buf + u
            step = (u + m * buf) if nest else buf
            return buf, p - lr * lm * step

        out = jax.tree.map(leaf, grads, opt_state, params,
                           self.decay_mults, self.lr_mults)
        is_pair = lambda o: isinstance(o, tuple)
        bufs = jax.tree.map(lambda o: o[0], out, is_leaf=is_pair)
        new_params = jax.tree.map(lambda o: o[1], out, is_leaf=is_pair)
        return new_params, bufs


class GroupAdam:
    """Adam(eps=1e-3) with per-leaf lr/decay multipliers, masked to a group.

    Leaves with lr_mult == 0 are unowned: they are never touched and their
    moment slots are shape-() placeholders, so each of the reference's
    per-group torch optimizers (train.py:121-142; I3D's five,
    train_model.py:122-179) costs only its own group's HBM here — not
    full-tree moments per optimizer.  Matches optax.scale_by_adam numerics
    exactly on owned leaves (bias-corrected moments).
    """

    def __init__(self, params, lr_mults, decay_mults, eps=1e-3,
                 b1=0.9, b2=0.999):
        self.lr_mults = lr_mults
        self.decay_mults = decay_mults
        self.eps, self.b1, self.b2 = eps, b1, b2

    def _moments(self, params):
        return jax.tree.map(
            lambda p, lm: jnp.zeros_like(p) if lm != 0.0
            else jnp.zeros((), p.dtype),
            params, self.lr_mults)

    def init(self, params):
        return {"count": jnp.zeros((), jnp.int32),
                "mu": self._moments(params), "nu": self._moments(params)}

    def update(self, grads, opt_state, params, lr, wd):
        """Returns (new_params, new_opt_state); lr/wd are traced scalars."""
        b1, b2, eps = self.b1, self.b2, self.eps
        count = opt_state["count"] + 1
        # Bias corrections 1 - b^count via expm1: the naive f32 form
        # catastrophically cancels for b2=0.999 at small counts (rel err
        # 1.3e-5 at count=1), a real drift vs torch, which computes these
        # in python-float f64 (test ab_train_worker.py pinned it at
        # ~6e-9/step on the params).  expm1 is cancellation-free at any
        # precision; under x64 this matches torch exactly.
        ftype = jnp.result_type(float)
        count_f = count.astype(ftype)
        c1 = -jnp.expm1(count_f * jnp.log(jnp.asarray(b1, ftype)))
        c2 = -jnp.expm1(count_f * jnp.log(jnp.asarray(b2, ftype)))

        def leaf(g, p, dm, lm, mu, nu):
            if lm == 0.0:  # static: unowned leaf, untouched
                return mu, nu, p
            u = g + wd * dm * p
            mu = b1 * mu + (1.0 - b1) * u
            nu = b2 * nu + (1.0 - b2) * (u * u)
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            return mu, nu, p - lr * lm * step

        out = jax.tree.map(leaf, grads, params, self.decay_mults,
                           self.lr_mults, opt_state["mu"], opt_state["nu"])
        is_triple = lambda o: isinstance(o, tuple)
        mu = jax.tree.map(lambda o: o[0], out, is_leaf=is_triple)
        nu = jax.tree.map(lambda o: o[1], out, is_leaf=is_triple)
        new_params = jax.tree.map(lambda o: o[2], out, is_leaf=is_triple)
        return new_params, {"count": count, "mu": mu, "nu": nu}

    def masked_update(self, grads, opt_state, params, lr, wd, enabled):
        """Like update, but a traced bool `enabled` gates the whole step
        (params AND moments frozen when disabled) — the freeze-phase
        semantics of reference train.py:260-266."""
        new_params, new_state = self.update(grads, opt_state, params, lr, wd)
        pick = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(enabled, n, o), new, old)
        return pick(new_params, params), pick(new_state, opt_state)
