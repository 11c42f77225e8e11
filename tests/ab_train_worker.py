"""Composed train-loop A/B: our jitted engines vs the REAL reference torch
code, run as a subprocess so float64 (required for tight multi-step traces)
never leaks into the main test session.

Both sides start from IDENTICAL weights (torch init exported through the
production importer, models/import_torch.py) and consume IDENTICAL synthetic
batches; after every epoch the FULL torch state_dict is re-imported and every
parameter and BatchNorm running-stat leaf must match the jax train state.
This composes what the unit parity tests prove separately (forward:
test_gen_torch_parity.py; update rules: test_optim_torch_parity.py) into
"training matches": real jax.grad through the real model vs torch autograd,
BN running-stat evolution, the freeze->train flip at epoch_thre, and the GAN
even/odd D/G alternation.

Reference loops reproduced exactly:
  dmcnet: /root/reference/code/dmcnet/train.py:205-288 (train), :121-142
    (two Adam(eps=1e-3) groups), :398-408 (adjust_learning_rate + freeze)
  gan:    /root/reference/code/dmcnet_GAN/train.py:219-380 (D/G alternation),
    :122-153 (three optimizers), :190-192 (no freeze: the freeze arg is
    commented out in the GAN main loop)

Dropout note (gan): discriminator blocks carry Dropout2d(0.25)
(dmcnet_GAN/model.py:254-279).  Framework RNGs cannot be made bit-equal, so
the A/B disables dropout on BOTH sides (torch: .eval() on the Dropout2d
modules only; flax: Dropout patched to identity) — every other layer runs in
train mode.  Dropout correctness itself is covered by
tests/test_gen_torch_parity.py statistics-free forward checks.

Usage: ab_train_worker.py {dmcnet|gan|i3d} <out.npz>
Exit 0 and writes per-epoch max-abs-diff summaries on success.
AB_REPORT_ALL=1 reports every out-of-tolerance leaf instead of asserting
on the first (debugging aid).
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

_HERE = __file__.rsplit("/", 1)[0]
sys.path.insert(0, _HERE.rsplit("/", 1)[0])  # repo root (dmcnet_tpu pkg)
sys.path.insert(0, _HERE)
from _torch_ref import load_ref_module, torch_state_to_flax  # noqa: E402

# --- shared config (tiny shapes: 1-core CPU, f64) -------------------------
NUM_CLASS, SEGMENTS, B, HW = 5, 3, 2, 32
BASE_LR, WD = 1e-3, 1e-4
LR_STEPS, LR_DECAY = [3], 0.1
EPOCHS, STEPS_PER_EPOCH, EPOCH_THRE = 4, 5, 2
LR_CLS_MULT, LR_MSE_MULT, LR_D_MULT = 0.1, 1.0, 0.5
LR_CLS_W, LR_MSE_W = 1.0, 5.0
LR_ADV_G, LR_ADV_D = 1.0, 1.0
RTOL, ATOL = 1e-6, 1e-9


def batches(n):
    """Deterministic (mv, residual, flow, label) batches, NHWC f64."""
    out = []
    for i in range(n):
        rng = np.random.default_rng(7000 + i)
        out.append({
            "mv": rng.normal(size=(B, SEGMENTS, HW, HW, 2)),
            "residual": rng.normal(size=(B, SEGMENTS, HW, HW, 3)),
            "flow": rng.normal(size=(B, SEGMENTS, HW, HW, 2)),
            "label": rng.integers(0, NUM_CLASS, size=(B,)),
        })
    return out


def to_torch(batch):
    """NHWC numpy -> NCHW f64 torch tensors (+ int64 labels)."""
    t = {k: torch.from_numpy(np.transpose(v, (0, 1, 4, 2, 3)).copy())
         for k, v in batch.items() if k != "label"}
    t["label"] = torch.from_numpy(batch["label"].astype(np.int64))
    return t


def adjust_lr(optimizer, epoch, freeze=False):
    """Reference adjust_learning_rate (code/dmcnet/train.py:398-408)."""
    decay = LR_DECAY ** sum(epoch >= s for s in LR_STEPS)
    lr, wd = BASE_LR * decay, WD
    if freeze and epoch < EPOCH_THRE:
        lr, wd = 0.0, 0.0
    for g in optimizer.param_groups:
        g["lr"] = lr * g["lr_mult"]
        g["weight_decay"] = wd * g["decay_mult"]
    return lr


def ref_adam_groups(tmodel, prefix, lr_mult):
    """Per-parameter groups exactly like reference train.py:121-142."""
    groups = []
    for key, value in dict(tmodel.named_parameters()).items():
        if prefix in key:
            groups.append({"params": [value], "lr": BASE_LR,
                           "lr_mult": lr_mult,
                           "decay_mult": 0.0 if "bias" in key else 1.0})
    return torch.optim.Adam(groups, weight_decay=WD, eps=0.001)


def jax_state_from_torch(model, tmodel, sample_batch, with_d=False):
    """init our model for structure, overlay the torch weights in f64, and
    build GroupAdam optimizers over the result."""
    from dmcnet_tpu.models.import_torch import merge_variables
    from dmcnet_tpu.train.engine import TrainState, make_optimizers

    init_args = [jnp.asarray(sample_batch["mv"]),
                 jnp.asarray(sample_batch["residual"])]
    if with_d:
        init_args.append(jnp.asarray(sample_batch["flow"]))
    variables = model.init(jax.random.key(0), *init_args, train=False)
    variables = jax.tree.map(lambda x: np.asarray(x, np.float64), variables)
    merged, missing = merge_variables(variables, torch_state_to_flax(tmodel))
    assert not missing, missing
    params, bstats = merged["params"], merged.get("batch_stats", {})
    opts = make_optimizers(model, params, LR_CLS_MULT, LR_MSE_MULT,
                           LR_D_MULT if with_d else None)
    state = TrainState(
        params=params, batch_stats=bstats,
        opt_cls=opts["cls"].init(params), opt_gf=opts["gf"].init(params),
        opt_d=opts["d"].init(params) if with_d else None)
    return state, opts


def compare_states(tmodel, state, tag, to_flax=None, template=None,
                   rtol=RTOL, atol=ATOL):
    """Re-import the live torch state_dict and leaf-wise compare against the
    jax train state (params + BN running stats).  `to_flax(template)` swaps
    in a model-specific importer (the I3D mode)."""
    import os
    report_all = bool(os.environ.get("AB_REPORT_ALL"))
    want = to_flax(template) if to_flax else torch_state_to_flax(tmodel)
    got = {"params": state.params, "batch_stats": state.batch_stats}
    diffs = {}
    bad = []
    for coll in ("params", "batch_stats"):
        w = jax.tree_util.tree_leaves_with_path(want[coll])
        g = dict(jax.tree_util.tree_flatten_with_path(got[coll])[0])
        assert w, f"{tag}: empty {coll} on torch side"
        for path, leaf in w:
            ours = g.get(path)
            assert ours is not None, f"{tag}: {coll} {path} missing in jax"
            if report_all:
                a, b = np.asarray(ours), np.asarray(leaf)
                err = np.abs(a - b) - (atol + rtol * np.abs(b))
                if (err > 0).any():
                    bad.append((coll, jax.tree_util.keystr(path),
                                float(np.abs(a - b).max()),
                                float(np.abs(a).max()),
                                float(np.abs(b).max())))
            else:
                np.testing.assert_allclose(
                    np.asarray(ours), np.asarray(leaf), rtol=rtol, atol=atol,
                    err_msg=f"{tag}: {coll} {jax.tree_util.keystr(path)}")
            d = float(np.max(np.abs(np.asarray(ours) - np.asarray(leaf))))
            diffs[coll] = max(diffs.get(coll, 0.0), d)
    if bad:
        print(f"[{tag}] {len(bad)} mismatched leaves:", flush=True)
        for coll, pth, d, amax, bmax in bad:
            print(f"  {coll} {pth}: |diff|={d:.3e} ours_max={amax:.3e} "
                  f"torch_max={bmax:.3e}", flush=True)
    print(f"[{tag}] max|diff| params={diffs['params']:.3e} "
          f"batch_stats={diffs.get('batch_stats', 0.0):.3e}", flush=True)
    return diffs


def run_dmcnet():
    """dmcnet two-optimizer loop incl. BN stats and the freeze->train flip
    (reference code/dmcnet/train.py:205-288)."""
    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine import make_train_step
    from dmcnet_tpu.train.optimizers import step_decay_lr

    ref = load_ref_module("dmcnet")
    torch.manual_seed(0)
    tmodel = ref.Model(NUM_CLASS, SEGMENTS, "mv", base_model="resnet18",
                       arch_estimator="DenseNetTiny", use_databn=0).double()
    tmodel.train()
    t_cls = ref_adam_groups(tmodel, "base_model", LR_CLS_MULT)
    t_gf = ref_adam_groups(tmodel, "gen_flow_model", LR_MSE_MULT)

    model = DMCNet(num_class=NUM_CLASS, num_segments=SEGMENTS,
                   arch_estimator="DenseNetTiny", detach_classifier=True)
    data = batches(EPOCHS * STEPS_PER_EPOCH)
    state, opts = jax_state_from_torch(model, tmodel, data[0])
    step_fn = make_train_step(model, opts, num_segments=SEGMENTS,
                              lr_cls_w=LR_CLS_W, lr_mse_w=LR_MSE_W)

    epoch_diffs = []
    it = iter(data)
    for epoch in range(EPOCHS):
        freeze = epoch < EPOCH_THRE
        adjust_lr(t_cls, epoch, freeze=True)
        adjust_lr(t_gf, epoch)
        lr = step_decay_lr(BASE_LR, epoch, LR_STEPS, LR_DECAY)
        for _ in range(STEPS_PER_EPOCH):
            batch = next(it)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, jb, jax.random.key(0),
                                     jnp.float64(lr), jnp.float64(WD),
                                     jnp.asarray(not freeze))

            tb = to_torch(batch)
            mv = tb["mv"]
            res = tb["residual"]
            flow = tb["flow"].view((-1,) + mv.shape[-3:][-3:])
            flow = tb["flow"].view((-1, 2) + tb["flow"].shape[-2:])
            out, gen_flow = tmodel(mv, res)
            out = out.view((-1, SEGMENTS) + out.shape[1:]).mean(dim=1)
            loss_cls = F.cross_entropy(out, tb["label"])
            loss_mse = F.mse_loss(gen_flow, flow)
            loss = loss_cls * LR_CLS_W + loss_mse * LR_MSE_W
            t_cls.zero_grad()
            t_gf.zero_grad()
            if freeze:  # train.py:260-266
                (loss_mse * LR_MSE_W).backward()
            else:
                loss.backward()
                t_cls.step()
            t_gf.step()

            np.testing.assert_allclose(
                float(metrics["loss_cls"]), float(loss_cls),
                rtol=1e-6, err_msg="loss_cls")
            np.testing.assert_allclose(
                float(metrics["loss_mse"]), float(loss_mse),
                rtol=1e-6, err_msg="loss_mse")
        epoch_diffs.append(compare_states(tmodel, state,
                                          f"dmcnet epoch {epoch}"))
    return epoch_diffs


def run_gan():
    """GAN even-D/odd-G alternation, three optimizers, no freeze
    (reference code/dmcnet_GAN/train.py:190-192,219-380)."""
    import flax.linen as fnn

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.engine_gan import make_gan_train_steps
    from dmcnet_tpu.train.optimizers import step_decay_lr

    # dropout off on both sides (see module docstring)
    fnn.Dropout.__call__ = lambda self, x, **kw: x
    ref = load_ref_module("dmcnet_GAN")
    torch.manual_seed(0)
    tmodel = ref.Model(NUM_CLASS, SEGMENTS, "mv", base_model="resnet18",
                       arch_estimator="DenseNetTiny", arch_d="Discriminator4",
                       use_databn=0)
    # The reference head hardcodes 224x224 input (Linear(32*28*28, 2),
    # model.py:376); resize it for the 32x32 A/B input — the forward logic
    # is size-generic, only this constant bakes in the input size.
    torch.manual_seed(1)
    tmodel.discriminator.adv_layer = torch.nn.Linear(32 * 4 * 4, 2)
    tmodel = tmodel.double()
    tmodel.train()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.eval()
    t_cls = ref_adam_groups(tmodel, "base_model", LR_CLS_MULT)
    t_gf = ref_adam_groups(tmodel, "gen_flow_model", LR_MSE_MULT)
    t_d = ref_adam_groups(tmodel, "discriminator", LR_D_MULT)

    model = DMCNet(num_class=NUM_CLASS, num_segments=SEGMENTS,
                   arch_estimator="DenseNetTiny", arch_d="Discriminator4",
                   detach_classifier=False)
    data = batches(EPOCHS * STEPS_PER_EPOCH)
    state, opts = jax_state_from_torch(model, tmodel, data[0], with_d=True)
    d_step, g_step = make_gan_train_steps(
        model, opts, num_segments=SEGMENTS, lr_cls_w=LR_CLS_W,
        lr_adv_g=LR_ADV_G, lr_adv_d=LR_ADV_D, lr_mse_w=LR_MSE_W)

    epoch_diffs = []
    i_batch = 0
    it = iter(data)
    for epoch in range(EPOCHS):
        for opt in (t_cls, t_gf, t_d):  # GAN: no freeze (train.py:190-192)
            adjust_lr(opt, epoch)
        lr = step_decay_lr(BASE_LR, epoch, LR_STEPS, LR_DECAY)
        for _ in range(STEPS_PER_EPOCH):
            batch = next(it)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            fn = d_step if i_batch % 2 == 0 else g_step
            state, metrics = fn(state, jb, jax.random.key(0),
                                jnp.float64(lr), jnp.float64(lr),
                                jnp.float64(lr), jnp.float64(WD))

            tb = to_torch(batch)
            flow = tb["flow"].view((-1, 2) + tb["flow"].shape[-2:])
            label = tb["label"]
            valid = torch.cat([label.clone().fill_(1)] * SEGMENTS, 0)
            fake = torch.cat([label.clone().fill_(0)] * SEGMENTS, 0)
            t_cls.zero_grad()
            t_gf.zero_grad()
            t_d.zero_grad()
            if i_batch % 2 == 0:  # D phase (train.py:261-302)
                out, validity, gen_flow = tmodel(tb["mv"], tb["residual"],
                                                 flow)
                out = out.view((-1, SEGMENTS) + out.shape[1:]).mean(dim=1)
                loss_cls = F.cross_entropy(out, label)
                loss_adv = F.cross_entropy(validity,
                                           torch.cat((fake, valid), 0))
                loss = loss_cls * LR_CLS_W + loss_adv * LR_ADV_D
                loss.backward()
                t_cls.step()
                t_d.step()
            else:  # G phase (train.py:331-371)
                out, validity, gen_flow = tmodel(tb["mv"], tb["residual"])
                out = out.view((-1, SEGMENTS) + out.shape[1:]).mean(dim=1)
                loss_cls = F.cross_entropy(out, label)
                loss_adv = F.cross_entropy(validity, valid)
                loss_mse = F.mse_loss(gen_flow, flow)
                loss = (loss_cls * LR_CLS_W + loss_adv * LR_ADV_G
                        + loss_mse * LR_MSE_W)
                loss.backward()
                t_gf.step()
                np.testing.assert_allclose(
                    float(metrics["loss_mse"]), float(loss_mse), rtol=1e-6,
                    err_msg="gan loss_mse")
            np.testing.assert_allclose(
                float(metrics["loss_cls"]), float(loss_cls), rtol=1e-6,
                err_msg="gan loss_cls")
            np.testing.assert_allclose(
                float(metrics["loss_adv"]), float(loss_adv), rtol=1e-6,
                err_msg="gan loss_adv")
            i_batch += 1
        epoch_diffs.append(compare_states(tmodel, state,
                                          f"gan epoch {epoch}"))
    return epoch_diffs


def run_i3d():
    """I3D iter-size-accumulated D/G alternation with the stage-2 optimizer
    swap at epoch_thre, the stale-lr scheduler quirks, the stage-1 base
    freeze, AND the torch .grad cross-phase carry-over (generator grads from
    the D phase pollute the G step; base/discriminator grads from the G
    phase pollute the next D step) — reference
    code/dmcnet_I3D/train/model.py:267-285 (adjust_learning_rate freeze),
    :342-491 (fit loop), train_model.py:122-179 (optimizers: SGD-nesterov
    base/gen + Adam(eps=1e-3) D).

    Size adaptations for the 96x96 / T=8 A/B input (the forward logic is
    size-generic; only these constants bake in 224): avg_pool (2,7,7) ->
    (1,3,3) [i3d.py:549; our flax I3D clips the window to the feature shape
    the same way] and Discriminator4's adv_layer 32*28*28 -> 32*12*12
    [i3d.py:235].  Discriminator dropout is disabled on both sides (see
    module docstring).

    96 spatial is the MINIMUM for this A/B, not a convenience: at 64 the
    mixed_5c feature map is 2x2 and the pool branch's SAME (3,3,3)/s1
    window covers the whole map, making the branch_3b conv output constant
    per channel -> batch variance EXACTLY 0 -> bn_out == bias == 0 ->
    ReLU sits on its non-differentiable point, where +-1-ulp conv noise
    decides (differently per framework) whether gradient flows.  At 96 the
    map is 3x3, windows differ per position, and the degeneracy vanishes
    (diagnosed with /tmp-style grad microscopes in round 4)."""
    import flax.linen as fnn

    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables
    from dmcnet_tpu.models.import_torch import merge_variables
    from dmcnet_tpu.models.import_torch_i3d import import_i3d_state_dict
    from dmcnet_tpu.train.engine import TrainState
    from dmcnet_tpu.train.engine_i3d import (make_i3d_optimizers,
                                             make_i3d_steps)
    from dmcnet_tpu.train.lr_scheduler import I3DLRDriver, MultiFactorScheduler

    fnn.Dropout.__call__ = lambda self, x, **kw: x  # both sides (docstring)
    sys.path.insert(0, "/root/reference/code/dmcnet_I3D/network")
    sys.path.insert(0, "/root/reference/code/dmcnet_I3D/train")
    try:
        import i3d as ref_i3d
        import lr_scheduler as ref_sched
    finally:
        sys.path.pop(0)
        sys.path.pop(0)

    T, HW = 8, 96
    ITER, EPOCHS_I3D, THRE = 2, 2, 1
    MICRO_PER_EPOCH = 8  # 2 D macro + 2 G macro steps per epoch
    LR1, LR2, LRD, WD_I3D, ADV = 1e-3, 2e-3, 5e-4, 1e-4, 0.1
    STEPS = [6]  # per-microbatch decay boundary, inside the run

    torch.manual_seed(0)
    tnet = ref_i3d.I3D(num_classes=NUM_CLASS, modality="flow+mp4",
                       dropout_prob=0.0, arch_estimator="DenseNetTiny",
                       arch_d="Discriminator4")
    tnet.avg_pool = torch.nn.AvgPool3d((1, 3, 3), (1, 1, 1))
    torch.manual_seed(1)
    tnet.discriminator.adv_layer = torch.nn.Linear(32 * 12 * 12, 2)
    tnet = tnet.double()
    tnet.train()
    for m in tnet.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.eval()

    # --- torch optimizers exactly like train_model.py:69-179 (optim=sgd) --
    param_base, param_new, params_gf, params_d = [], [], [], []
    for name, param in tnet.named_parameters():
        if name.startswith("gen_flow_model"):
            params_gf.append(param)
        elif name.startswith("discriminator"):
            params_d.append(param)
        elif name.startswith(("conv3d_0c_1x1", "classifier")):
            param_new.append(param)
        else:
            param_base.append(param)
    lr_mul = 0.5  # flow+mp4, not fine_tune (train_model.py:100-104)
    sgd = lambda groups, lr: torch.optim.SGD(
        groups, lr=lr, momentum=0.9, weight_decay=WD_I3D, nesterov=True)
    t_opt = sgd([{"params": param_base, "lr_mult": lr_mul},
                 {"params": param_new, "lr_mult": 1.0}], LR1)
    t_opt2 = sgd([{"params": param_base, "lr_mult": lr_mul},
                  {"params": param_new, "lr_mult": 1.0}], LR2)
    t_mse = sgd([{"params": params_gf}], LR1)
    t_mse2 = sgd([{"params": params_gf}], LR2)
    t_d = torch.optim.Adam(params_d, lr=LR1, weight_decay=WD_I3D, eps=1e-3)

    def t_adjust(optimizer, lr, epoch=0, epoch_thre=0):
        """adjust_learning_rate, model.py:267-281."""
        for g in optimizer.param_groups:
            lr_mult = g.get("lr_mult", 1.0)
            if lr_mult in (0.2, 0.5):
                if epoch_thre > 0 and epoch + 1 <= epoch_thre:
                    lr_mult = 0.0
                elif lr_mult == 0.5:
                    lr_mult = 1.0
            g["lr"] = lr * lr_mult

    t_s1 = ref_sched.MultiFactorScheduler(steps=STEPS, base_lr=LR1)
    t_s2 = ref_sched.MultiFactorScheduler(steps=STEPS, base_lr=LR2)
    t_s3 = ref_sched.MultiFactorScheduler(steps=STEPS, base_lr=LRD)

    # --- jax side: same weights through the production importer ----------
    net = I3D(num_classes=NUM_CLASS, modality="flow+mp4", dropout_prob=0.0,
              arch_estimator="DenseNetTiny", arch_d="Discriminator4")
    variables = jax.eval_shape(
        lambda: init_i3d_variables(net, jax.random.key(0),
                                   jnp.zeros((1, T, HW, HW, 5))))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float64), variables)

    def sync_from_torch(template):
        sd = {k: v.detach().cpu().numpy() for k, v in
              tnet.state_dict().items()}
        imported, skipped = import_i3d_state_dict(sd, in_channels=2)
        assert not skipped, skipped
        merged, missing = merge_variables(template, imported,
                                          strict_shapes=True)
        assert not missing, missing
        return merged

    merged = sync_from_torch(zeros)
    params = jax.tree.map(jnp.asarray, merged["params"])
    bstats = jax.tree.map(jnp.asarray, merged["batch_stats"])

    def fresh(params, bstats, stage2, grad_acc=None, opt_d_state=None):
        """cli/train_i3d.py fresh_state: stage-1 freeze + detach skip; the
        D optimizer's Adam state survives the stage-2 swap (the reference
        replaces only optimizer/optimizer_mse, model.py:349-350)."""
        opts = make_i3d_optimizers(params, optim="sgd", lr_mul=lr_mul,
                                   has_gan=True, stage2=stage2,
                                   freeze_base=not stage2)
        if grad_acc is None:
            grad_acc = jax.tree.map(jnp.zeros_like, params)
        state = TrainState(
            params=params, batch_stats=bstats,
            opt_cls=opts["cls"].init(params),
            opt_gf=opts["gf"].init(params),
            opt_d=(opts["d"].init(params) if opt_d_state is None
                   else opt_d_state),
            grad_acc=grad_acc)
        d_step, g_step = make_i3d_steps(net, opts, adv=ADV, detach=True,
                                        train_backbone=stage2)
        return state, d_step, g_step

    state, d_step, g_step = fresh(params, bstats, stage2=False)
    driver = I3DLRDriver(MultiFactorScheduler(STEPS, LR1),
                         MultiFactorScheduler(STEPS, LR2),
                         MultiFactorScheduler(STEPS, LRD),
                         epoch_thre=THRE, detach=True, has_gan=True)

    def micro_batches(n):
        out = []
        for i in range(n):
            g = np.random.default_rng(9000 + i)
            out.append({
                "mv": g.normal(size=(1, T, HW, HW, 2)),
                "residual": g.normal(size=(1, T, HW, HW, 3)),
                "flow": g.normal(size=(1, T, HW, HW, 2)),
                "label": g.integers(0, NUM_CLASS, size=(1,)),
            })
        return out

    def to_torch_i3d(mb):
        """7-channel NCTHW data tensor: [mv(2), residual(3) | flow(2)] —
        the gen input is data[:, :5], the MSE/adv target data[:, 5:7]
        (model.py:147,157-158; intended-semantics channel order, see
        models/i3d.py docstring)."""
        x = np.concatenate([mb["mv"], mb["residual"], mb["flow"]], axis=-1)
        data = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())
        return data, torch.from_numpy(mb["label"].astype(np.int64))

    data = micro_batches(EPOCHS_I3D * MICRO_PER_EPOCH)
    epoch_diffs = []
    note, i_acc = True, 0
    t_lr = t_lr_d = None
    mi = 0
    for i_epoch in range(EPOCHS_I3D):
        # ---- jax epoch: macro steps of ITER stacked microbatches --------
        if i_epoch == THRE:
            state, d_step, g_step = fresh(state.params, state.batch_stats,
                                          stage2=True,
                                          grad_acc=state.grad_acc,
                                          opt_d_state=state.opt_d)
        for macro in range(MICRO_PER_EPOCH // ITER):
            i_batch0 = macro * ITER
            use_d = i_batch0 % (2 * ITER) < ITER
            lr, lr1, lr_d = driver.macro_step(i_epoch, use_d, ITER)
            stack = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *data[mi + i_batch0: mi + i_batch0 + ITER])
            fn = d_step if use_d else g_step
            state, metrics = fn(state, stack, jax.random.key(0),
                                jnp.float64(lr), jnp.float64(lr1),
                                jnp.float64(lr_d), jnp.float64(WD_I3D),
                                jnp.asarray(i_epoch < 1))

        # ---- torch epoch: reference fit loop verbatim (model.py:342-491) -
        t_opt_cur, t_mse_cur = (t_opt, t_mse) if note or i_epoch < THRE \
            else (t_opt2, t_mse2)
        for i_batch in range(MICRO_PER_EPOCH):
            if i_epoch == THRE and note:
                t_opt_cur, t_mse_cur = t_opt2, t_mse2
                note = False
            dat, target = to_torch_i3d(data[mi + i_batch])
            phase_d = i_batch % (2 * ITER) < ITER
            # fit() never forwards --detach into the net (model.py:355,414
            # vs :135): the stop-gradient branch is dead during training
            out, flow_gen = tnet(dat[:, :5], node="flow+logit", detach=False)
            flow_true = dat[:, 5:7]
            b, _, t = flow_gen.shape[:3]
            valid = torch.cat([target.clone().fill_(1)] * t, 0)
            fake = torch.cat([target.clone().fill_(0)] * t, 0)
            d_in = torch.cat(
                (torch.reshape(torch.transpose(flow_gen, 1, 2),
                               (-1, 2, HW, HW)),
                 torch.reshape(torch.transpose(flow_true, 1, 2),
                               (-1, 2, HW, HW))), 0)
            validity = tnet(d_in, node="D")
            loss_adv = F.cross_entropy(validity, torch.cat((fake, valid), 0))
            loss_cls = F.cross_entropy(out, target)
            loss_mse = F.mse_loss(flow_gen, flow_true)
            stage1 = i_epoch + 1 <= THRE
            if phase_d:  # model.py:354-408
                (loss_cls + ADV * loss_adv).backward()
                if stage1:
                    t_lr = t_s1.update()
                    t_s2.update()
                    t_lr_d = t_s3.update()
                    lr1_t = 0.0  # detach
                else:
                    t_lr = t_s2.update()
                    lr1_t = t_lr
                t_adjust(t_opt_cur, lr1_t, i_epoch, THRE)
                t_adjust(t_d, t_lr_d)
                i_acc += 1
                if i_acc % ITER == 0:
                    for opt in (t_opt_cur, t_d):
                        for g in opt.param_groups:
                            for p in g["params"]:
                                p.grad /= ITER
                    t_opt_cur.step()
                    t_opt_cur.zero_grad()
                    t_d.step()
                    t_d.zero_grad()
                    i_acc = 0
            else:  # model.py:411-486
                if i_epoch < 1:
                    (0.0 * loss_cls + loss_mse + ADV * loss_adv).backward()
                else:
                    (loss_cls + loss_mse + ADV * loss_adv).backward()
                if stage1:
                    t_s2.update()
                else:
                    t_lr = t_s2.update()
                t_adjust(t_mse_cur, t_lr)
                i_acc += 1
                if i_acc % ITER == 0:
                    for g in t_mse_cur.param_groups:
                        for p in g["params"]:
                            p.grad /= ITER
                    t_mse_cur.step()
                    t_mse_cur.zero_grad()
                    i_acc = 0
        mi += MICRO_PER_EPOCH
        # atol 1e-7 (vs the dmcnet/gan 1e-9): even at 96px a handful of
        # borderline-ReLU elements in the 5c pool branch flip on ~ulp conv
        # noise (see the size note above); the resulting f64 trace drift
        # stays under 1e-8 over 2 epochs — far below any behavioral scale,
        # and two orders tighter than anything f32 could resolve.
        epoch_diffs.append(compare_states(tnet, state, f"i3d epoch {i_epoch}",
                                          to_flax=sync_from_torch,
                                          template=zeros, atol=1e-7))
    return epoch_diffs


def main():
    mode, out_path = sys.argv[1], sys.argv[2]
    diffs = {"dmcnet": run_dmcnet, "gan": run_gan, "i3d": run_i3d}[mode]()
    np.savez(out_path,
             params=[d["params"] for d in diffs],
             batch_stats=[d.get("batch_stats", 0.0) for d in diffs])
    print("OK", flush=True)


if __name__ == "__main__":
    main()
