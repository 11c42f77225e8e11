"""Optimizer update-rule parity vs real torch optimizers.

Forward parity vs the reference torch modules is covered elsewhere
(test_gen_torch_parity.py, test_import_torch.py); this closes the last
numeric surface: the update rules themselves.  Identical parameter
initializations and identical synthetic gradient sequences are fed to

  (a) the dmcnet two-optimizer step — GroupAdam(eps=1e-3) over the
      base_model / gen_flow_model groups with lr_mult/decay_mult and the
      freeze phase (reference /root/reference/code/dmcnet/train.py:121-142,
      257-266,398-408) — vs torch.optim.Adam param groups driven exactly
      like reference adjust_learning_rate;
  (b) GroupSGD (momentum=0.9, nesterov) with the I3D grouping
      (reference /root/reference/code/dmcnet_I3D/train_model.py:122-146)
      vs torch.optim.SGD, including lr=0 phases where torch's momentum
      buffers keep moving.

Parameter traces must agree leaf-wise over ~50 steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dmcnet_tpu.train.optimizers import step_decay_lr  # noqa: E402


def _leaf_key(entry):
    return getattr(entry, "key", getattr(entry, "name", str(entry)))


def _synthetic_grads(paths_leaves, step):
    """Deterministic per-step gradient tree, identical on both sides."""
    rng = np.random.default_rng(1000 + step)
    return [np.asarray(rng.normal(scale=0.01, size=leaf.shape), np.float32)
            for _, leaf in paths_leaves]


def _torch_params(paths_leaves):
    return [torch.nn.Parameter(torch.from_numpy(np.asarray(leaf).copy()))
            for _, leaf in paths_leaves]


def _set_grads(tparams, grads):
    for p, g in zip(tparams, grads):
        p.grad = torch.from_numpy(g.copy())


def _assert_traces_close(tparams, new_leaves, what):
    for i, (tp, leaf) in enumerate(zip(tparams, new_leaves)):
        np.testing.assert_allclose(
            tp.detach().numpy(), np.asarray(leaf), rtol=5e-4, atol=5e-6,
            err_msg=f"{what}: param leaf {i}")


def test_dmcnet_two_optimizer_adam_parity():
    """(a) GroupAdam cls+gf with freeze phase vs torch Adam(eps=1e-3)
    param groups (reference train.py:121-142,257-266,398-408)."""
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import create_train_state

    lr_cls_mult, lr_mse_mult = 0.01, 1.0
    base_lr, wd = 1e-3, 1e-4
    lr_steps, lr_decay = [3], 0.1  # decay once mid-trace
    epoch_thre = 2  # freeze the cls optimizer for the first 2 "epochs"
    steps_per_epoch, epochs = 10, 5

    model = DMCNet(num_class=5, num_segments=1,
                   arch_estimator="DenseNetTiny")
    rng = np.random.default_rng(0)
    hw = 32
    batch = {
        "mv": jnp.asarray(rng.normal(size=(2, 1, hw, hw, 2)), jnp.float32),
        "residual": jnp.asarray(rng.normal(size=(2, 1, hw, hw, 3)),
                                jnp.float32),
        "flow": jnp.asarray(rng.normal(size=(2, 1, hw, hw, 2)), jnp.float32),
        "label": jnp.asarray([0, 1], jnp.int32),
    }
    state, opts = create_train_state(model, jax.random.key(0), batch,
                                     lr_cls_mult=lr_cls_mult,
                                     lr_mse_mult=lr_mse_mult)
    paths_leaves = jax.tree_util.tree_leaves_with_path(state.params)
    tparams = _torch_params(paths_leaves)

    # torch param groups exactly like the reference builds them
    # (train.py:121-142): per optimizer, (non-bias, decay_mult=1) and
    # (bias, decay_mult=0) groups; adjust_learning_rate then sets
    # group['lr'] = lr * lr_mult and group['weight_decay'] = wd *
    # decay_mult each epoch (train.py:398-408).
    def groups_for(top, lr_mult):
        nonbias, bias = [], []
        for (path, _), tp in zip(paths_leaves, tparams):
            if _leaf_key(path[0]) != top:
                continue
            (bias if _leaf_key(path[-1]) == "bias" else nonbias).append(tp)
        return [
            {"params": nonbias, "lr_mult": lr_mult, "decay_mult": 1.0},
            {"params": bias, "lr_mult": lr_mult, "decay_mult": 0.0},
        ]

    t_cls = torch.optim.Adam(groups_for("base_model", lr_cls_mult),
                             lr=base_lr, eps=1e-3)
    t_gf = torch.optim.Adam(groups_for("gen_flow_model", lr_mse_mult),
                            lr=base_lr, eps=1e-3)

    params = state.params
    opt_cls, opt_gf = state.opt_cls, state.opt_gf
    treedef = jax.tree.structure(params)
    step = 0
    for epoch in range(epochs):
        lr = step_decay_lr(base_lr, epoch, lr_steps, lr_decay)
        freeze = epoch < epoch_thre
        for opt in (t_cls, t_gf):
            for group in opt.param_groups:
                group["lr"] = lr * group["lr_mult"]
                group["weight_decay"] = wd * group["decay_mult"]
        for _ in range(steps_per_epoch):
            flat = _synthetic_grads(paths_leaves, step)
            grads = jax.tree.unflatten(treedef,
                                       [jnp.asarray(g) for g in flat])
            params, opt_gf = opts["gf"].update(grads, opt_gf, params,
                                               jnp.float32(lr),
                                               jnp.float32(wd))
            params, opt_cls = opts["cls"].masked_update(
                grads, opt_cls, params, jnp.float32(lr), jnp.float32(wd),
                jnp.asarray(not freeze))

            _set_grads(tparams, flat)
            # freeze phase: only optimizer_gf steps (train.py:260-266)
            t_gf.step()
            if not freeze:
                t_cls.step()
            t_cls.zero_grad()
            t_gf.zero_grad()
            step += 1
        # spot-check once per epoch so divergence is localized
        _assert_traces_close(tparams, jax.tree.leaves(params),
                             f"adam epoch {epoch}")


def test_i3d_group_sgd_parity():
    """(b) GroupSGD with the I3D grouping vs torch SGD(momentum=0.9,
    nesterov), incl. an lr=0 phase where momentum buffers keep moving
    (reference train_model.py:122-146, stage-1 detach lr=0)."""
    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
    from dmcnet_tpu.train.engine_i3d import make_i3d_optimizers

    base_lr, wd, lr_mul = 5e-3, 1e-4, 0.2
    t, hw = 4, 32
    net = I3D(num_classes=3, modality="flow+mp4",
              arch_estimator="DenseNetTiny")
    x0 = jnp.zeros((1, t, hw, hw, 5), jnp.float32)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    params = variables["params"]
    opts = make_i3d_optimizers(params, optim="sgd", lr_mul=lr_mul,
                               has_gan=False)
    opt_cls = opts["cls"].init(params)
    opt_gf = opts["gf"].init(params)

    paths_leaves = jax.tree_util.tree_leaves_with_path(params)
    tparams = _torch_params(paths_leaves)

    # I3D grouping (train_model.py:69-106): generator -> gf optimizer;
    # new layers (conv3d_0c_1x1, classifier) lr_mult 1; base lr_mult
    # `lr_mul`; no bias decay exemption (torch default wd on every param).
    def group_of(path):
        top = _leaf_key(path[0])
        if top == "gen_flow_model":
            return "gf"
        if top in ("conv3d_0c_1x1", "classifier"):
            return "new"
        return "base"

    by_group = {"gf": [], "new": [], "base": []}
    for (path, _), tp in zip(paths_leaves, tparams):
        by_group[group_of(path)].append(tp)
    t_cls = torch.optim.SGD(
        [{"params": by_group["new"], "lr_mult": 1.0},
         {"params": by_group["base"], "lr_mult": lr_mul}],
        lr=base_lr, momentum=0.9, nesterov=True, weight_decay=wd)
    t_gf = torch.optim.SGD(
        [{"params": by_group["gf"], "lr_mult": 1.0}],
        lr=base_lr, momentum=0.9, nesterov=True, weight_decay=wd)

    treedef = jax.tree.structure(params)
    # 3 phases: lr1=0 (stage-1 detach: base frozen via lr, buffers still
    # move), then normal, then decayed lr
    phases = [(0.0, base_lr), (base_lr, base_lr),
              (base_lr * 0.1, base_lr * 0.1)]
    step = 0
    for lr1, lr in phases:
        for group in t_cls.param_groups:
            group["lr"] = lr1 * group["lr_mult"]
        for group in t_gf.param_groups:
            group["lr"] = lr * group["lr_mult"]
        for _ in range(8):
            flat = _synthetic_grads(paths_leaves, step)
            grads = jax.tree.unflatten(treedef,
                                       [jnp.asarray(g) for g in flat])
            params, opt_cls = opts["cls"].update(grads, opt_cls, params,
                                                 jnp.float32(lr1),
                                                 jnp.float32(wd))
            params, opt_gf = opts["gf"].update(grads, opt_gf, params,
                                               jnp.float32(lr),
                                               jnp.float32(wd))
            _set_grads(tparams, flat)
            t_cls.step()
            t_gf.step()
            t_cls.zero_grad()
            t_gf.zero_grad()
            step += 1
        _assert_traces_close(tparams, jax.tree.leaves(params),
                             f"sgd phase lr1={lr1} lr={lr}")
