"""Jitted train steps for the I3D variant, with iter-size accumulation.

Mirrors the reference MFNet-derived trainer
(/root/reference/code/dmcnet_I3D/train/model.py:286-491):

  * gradient accumulation over `iter_size` microbatches with grads divided
    by iter_size (model.py:389-405) — expressed as a `lax.scan` over a
    stacked microbatch axis inside ONE jitted step (no host round-trips);
  * D phase on `i_batch % (2*iter_size) < iter_size`: loss = cls + adv*adv,
    steps the base (cls) and discriminator optimizers (model.py:354-408);
  * G phase: loss = cls + mse + adv*adv, with the cls term dropped in epoch
    0 (`0.*losses[0]`, model.py:430-434), steps the generator optimizer
    (and the base optimizer only when no GAN) (model.py:411-491);
  * both phases score validity on fake‖real with labels (fake=0, valid=1)
    (model.py:155-159) — including the G phase, which the reference also
    trains against the D-style labels (a deliberate-fidelity quirk: the I3D
    trainer's G loss uses the same loss_adv it computed for D);
  * detach: lr of the base optimizer forced to 0 during stage 1
    (model.py:372-379);
  * torch .grad carry-over (state.grad_acc != None): the reference zeroes
    each optimizer's grads only right after ITS step, so the generator's
    D-phase gradients pollute the next G step and the base/discriminator's
    G-phase gradients pollute the next D step (model.py:401-404,483-485);
    reproduced with a persistent per-param accumulator in the train state
    (engine.TrainState.grad_acc; A/B'd against the real torch loop in
    tests/test_train_torch_parity.py);
  * stage-2 switch at epoch_thre swaps to freshly initialized optimizers
    (model.py:347-351) — host code resets opt states and rebuilds the step
    with the stage-2 transforms.

Input batches are NDHWC clip stacks: mv (I, B, T, H, W, 2), residual
(I, B, T, H, W, 3), flow (I, B, T, H, W, 2), label (I, B) with I=iter_size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmcnet_tpu.train.engine import cross_entropy, topk_correct
from dmcnet_tpu.train.optimizers import GroupAdam, GroupSGD, lr_mult_tree


def make_i3d_optimizers(params, optim="adam", lr_mul=0.2, has_gan=False,
                        stage2=False, freeze_base=False):
    """Reference parameter grouping (train_model.py:69-106): generator,
    discriminator, new layers (conv3d_0c_1x1, classifier) at lr_mult 1,
    base I3D at lr_mult `lr_mul`.  No bias decay exemption (torch wd on
    every param).  Returns {'cls', 'gf'[, 'd']}.

    `freeze_base` reproduces the reference adjust_learning_rate's stage-1
    rule (model.py:273-277): during flow+mp4 stage 1 the base layers' lr is
    forced to 0 REGARDLESS of --detach (only the new layers follow lr1).
    `stage2` additionally promotes lr_mul 0.5 -> 1.0 (model.py:278-281) and
    selects the stage-2 generator Adam eps=1e-3 (train_model.py:162-166)."""
    ones = jax.tree.map(lambda _: 1.0, params)
    if freeze_base:
        base_mult = 0.0
    elif stage2 and lr_mul == 0.5:
        base_mult = 1.0  # model.py:278-281: 0.5 means "1.0 after stage 1"
    else:
        base_mult = lr_mul
    cls_mults = {}
    for top in params:
        if top in ("gen_flow_model", "discriminator"):
            continue
        cls_mults[top] = 1.0 if top in ("conv3d_0c_1x1", "classifier") \
            else base_mult
    make = (lambda lm, eps=1e-8: GroupAdam(params, lm, ones, eps=eps)) \
        if optim == "adam" else (lambda lm, eps=None: GroupSGD(params, lm, ones))
    opts = {
        "cls": make(lr_mult_tree(params, cls_mults)),
        "gf": make(lr_mult_tree(params, {"gen_flow_model": 1.0}),
                   eps=(1e-3 if (optim == "adam" and stage2) else 1e-8)),
    }
    if has_gan:
        # D optimizer is always Adam(eps=1e-3) (train_model.py:146-152).
        opts["d"] = GroupAdam(params,
                              lr_mult_tree(params, {"discriminator": 1.0}),
                              ones, eps=1e-3)
    return opts


def _forward_gan(model, params, batch_stats, mv_res, flow, rng, with_adv,
                 stop_gradient=False):
    """One microbatch forward: logits, gen flow, adv loss pieces.

    By default the generator output is NOT stop-gradiented before the
    stem: the reference's fit loop never forwards its `detach` flag into
    the net (model.py:355,414 call self.forward without `detach`, whose
    default False reaches i3d.py:573) — the network's stop-gradient branch
    is dead code during training, and `--detach` only forces the base lr
    to 0 in stage 1 (model.py:372-379).  Keeping the path live matters:
    the classifier loss back-propagates through the (frozen) backbone INTO
    the generator in both the D and G phases, which feeds the generator
    update (directly in the G step, via the torch .grad carry from the D
    step).

    `stop_gradient=True` is an explicit NON-reference performance mode
    (cuts the stem's input-gradient chain, ~25% of the G step at the
    224^2 training shape) — the cls->generator coupling above is lost."""
    variables = {"params": params, "batch_stats": batch_stats}
    (logits, gen), mutated = model.apply(
        variables, mv_res, "flow+logit", stop_gradient, True,
        mutable=["batch_stats"], rngs={"dropout": rng})
    adv_logits = None
    if with_adv:
        b, t = gen.shape[0], gen.shape[1]
        fake = gen.reshape((b * t,) + gen.shape[2:])
        real = flow.reshape((b * t,) + flow.shape[2:])
        d_in = jnp.concatenate([fake, real], axis=0)
        adv_logits, mutated2 = model.apply(
            {"params": params, "batch_stats": mutated["batch_stats"]},
            d_in, "D", False, True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        mutated = mutated2
    return logits, gen, adv_logits, mutated["batch_stats"]


def _scan_micros(params, bstats, batch, rng, loss_builder, live_keys=None):
    """Scan the stacked microbatch axis (axis 0 of every batch leaf):
    SUMMED grads + final batch_stats + threaded rng + per-metric SUMS.

    `live_keys`: top-level param groups to differentiate (None = all);
    grads of the rest are zeros (dead — XLA removes them).  Callers divide
    the sums by the TOTAL microbatch count — which may span several
    chained calls (make_i3d_chunked_steps), so the division cannot happen
    here."""

    def micro(carry, xs):
        bs, rng = carry
        mb, rng = jax.random.split(rng)

        if live_keys is None:
            def loss_fn(p):
                return loss_builder(p, bs, xs, mb)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        else:
            live = {k: v for k, v in params.items() if k in live_keys}

            def loss_fn(live):
                merged = dict(params)
                merged.update(live)
                return loss_builder(merged, bs, xs, mb)

            (loss, aux), g_live = jax.value_and_grad(
                loss_fn, has_aux=True)(live)
            grads = {k: (g_live[k] if k in g_live
                         else jax.tree.map(jnp.zeros_like, v))
                     for k, v in params.items()}
        return (aux.pop("batch_stats"), rng), (grads, aux)

    (bs, rng), (grads, auxes) = jax.lax.scan(micro, (bstats, rng), batch)
    sum_grads = jax.tree.map(lambda g: g.sum(axis=0), grads)
    msums = {k: v.sum(axis=0) for k, v in auxes.items()}
    return sum_grads, bs, rng, msums


def make_i3d_steps(model, opts, *, adv=0.0, jit=True, detach=False,
                   train_backbone=True, stop_gradient=False):
    """Returns (d_step, g_step).  Each:
    fn(state, batch, rng, lr, lr1, lr_d, wd, drop_cls) -> (state, metrics);
    `lr1` is the base-optimizer lr (0 when detached/frozen), `drop_cls`
    zeroes the cls term (epoch 0 G loss).  `detach` = the reference
    `--detach` flag; it is lr-gating ONLY (model.py:372-379) — the
    network's stop-gradient branch is never reached by the reference
    trainer (see _forward_gan) — and is accepted here just to document the
    caller's intent; it does not change the computation.

    `train_backbone=False` is the static stage-1-with-detach realization:
    the reference runs those epochs with the base optimizer's lr forced to 0
    (model.py:372-379), i.e. every backbone update is exactly zero and the
    base Adam moments it accumulates are discarded at the epoch_thre switch
    to freshly-initialized stage-2 optimizers (model.py:347-351).  Skipping
    the backbone PARAMETER gradients (differentiating only the
    generator/discriminator sub-trees — activation gradients still flow
    THROUGH the backbone for the cls->generator path) therefore produces
    identical parameters at lower step cost; the caller rebuilds steps at
    the stage switch anyway.

    `stop_gradient=True` opts into the non-reference fast mode (see
    _forward_gan)."""
    del detach  # documented no-op (reference model.py:355,414 vs :135)
    has_gan = "d" in opts

    def accumulate(state, batch, rng, loss_builder, live_keys=None):
        sums, bs, _, msums = _scan_micros(
            state.params, state.batch_stats, batch, rng, loss_builder,
            live_keys)
        n = batch["label"].shape[0]
        return sums, bs, {k: v / n for k, v in msums.items()}

    def carry_in(state, sums):
        """torch .grad semantics: new backward sums ADD onto whatever the
        last phase left unzeroed (model.py:365,436 — backward accumulates;
        zero_grad is per-optimizer, right after its step)."""
        if state.grad_acc is None:
            return sums
        return jax.tree.map(jnp.add, state.grad_acc, sums)

    def carry_out(state, acc, keep_tops):
        """zero_grad for every optimizer that just stepped: only the
        `keep_tops` groups' (un-divided) sums survive into the next phase.
        D step zeroes base+new (optimizer) and discriminator (optimizer_3),
        leaving the generator's D-phase grads to pollute the next G step
        (model.py:401-404); the G step zeroes only the generator
        (optimizer_mse, model.py:483-485)."""
        if state.grad_acc is None:
            return None
        return {k: (v if k in keep_tops
                    else jax.tree.map(jnp.zeros_like, v))
                for k, v in acc.items()}

    def d_loss(drop_cls):
        del drop_cls  # the D phase always keeps the cls term (model.py:389)

        def loss_builder(params, bstats, xs, mb):
            mv_res = jnp.concatenate([xs["mv"], xs["residual"]], axis=-1)
            logits, gen, adv_logits, bs = _forward_gan(
                model, params, bstats, mv_res, xs["flow"], mb, True,
                stop_gradient=stop_gradient)
            loss_cls = cross_entropy(logits, xs["label"])
            n = adv_logits.shape[0] // 2
            adv_labels = jnp.concatenate(
                [jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)])
            loss_adv = cross_entropy(adv_logits, adv_labels)
            loss = loss_cls + adv * loss_adv
            top1, top5 = topk_correct(logits, xs["label"], (1, 5))
            (acc_d,) = topk_correct(adv_logits, adv_labels, (1,))
            return loss, {"batch_stats": bs, "loss": loss,
                          "loss_cls": loss_cls, "loss_adv": loss_adv,
                          "top1": top1, "top5": top5, "acc_D_adv": acc_d}

        return loss_builder

    def g_loss(drop_cls):
        def loss_builder(params, bstats, xs, mb):
            mv_res = jnp.concatenate([xs["mv"], xs["residual"]], axis=-1)
            logits, gen, adv_logits, bs = _forward_gan(
                model, params, bstats, mv_res, xs["flow"], mb, has_gan,
                stop_gradient=stop_gradient)
            loss_cls = cross_entropy(logits, xs["label"])
            loss_mse = jnp.mean((gen - xs["flow"]) ** 2)
            cls_w = jnp.where(drop_cls, 0.0, 1.0) if has_gan else 1.0
            loss = cls_w * loss_cls + loss_mse
            metrics = {"loss_cls": loss_cls, "loss_mse": loss_mse}
            if has_gan:
                n = adv_logits.shape[0] // 2
                adv_labels = jnp.concatenate(
                    [jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)])
                loss_adv = cross_entropy(adv_logits, adv_labels)
                loss = loss + adv * loss_adv
                metrics["loss_adv"] = loss_adv
            top1, top5 = topk_correct(logits, xs["label"], (1, 5))
            metrics.update({"batch_stats": bs, "loss": loss, "top1": top1,
                            "top5": top5})
            return loss, metrics

        return loss_builder

    def d_live(has_carry):
        if train_backbone:
            return None
        # frozen backbone still needs the generator's adv-path grads
        # when the torch carry is on: they survive this step's zero_grad
        # and feed the next G step (model.py:401-404)
        return (("discriminator", "gen_flow_model") if has_carry
                else ("discriminator",))

    def g_live(has_carry):
        # G phase only steps the generator optimizer; gradients still flow
        # THROUGH the (constant) discriminator for the adv term.  With the
        # torch carry on, the adv term's discriminator grads survive this
        # step's zero_grad and feed the next D step
        if train_backbone:
            return None
        return (("gen_flow_model", "discriminator") if has_carry
                else ("gen_flow_model",))

    def d_apply(state, sums, bstats, metrics, iter_size, lr, lr1, lr_d, wd):
        acc = carry_in(state, sums)
        upd = jax.tree.map(lambda g: g / iter_size, acc)
        if train_backbone:
            params, opt_cls = opts["cls"].update(
                upd, state.opt_cls, state.params, lr1, wd)
        else:
            params, opt_cls = state.params, state.opt_cls
        params, opt_d = opts["d"].update(upd, state.opt_d, params, lr_d, wd)
        return state.replace(params=params, batch_stats=bstats,
                             opt_cls=opt_cls, opt_d=opt_d,
                             grad_acc=carry_out(state, acc,
                                                ("gen_flow_model",)),
                             step=state.step + 1), metrics

    def g_apply(state, sums, bstats, metrics, iter_size, lr, lr1, lr_d, wd):
        acc = carry_in(state, sums)
        upd = jax.tree.map(lambda g: g / iter_size, acc)
        new = {"batch_stats": bstats, "step": state.step + 1}
        params = state.params
        if not has_gan and train_backbone:
            params, new["opt_cls"] = opts["cls"].update(
                upd, state.opt_cls, params, lr1, wd)
        params, new["opt_gf"] = opts["gf"].update(
            upd, state.opt_gf, params, lr, wd)
        new["params"] = params
        if state.grad_acc is not None:
            new["grad_acc"] = carry_out(
                state, acc, tuple(k for k in acc if k != "gen_flow_model"))
        return state.replace(**new), metrics

    def d_step(state, batch, rng, lr, lr1, lr_d, wd, drop_cls):
        sums, bstats, metrics = accumulate(
            state, batch, rng, d_loss(drop_cls),
            live_keys=d_live(state.grad_acc is not None))
        return d_apply(state, sums, bstats, metrics,
                       batch["label"].shape[0], lr, lr1, lr_d, wd)

    def g_step(state, batch, rng, lr, lr1, lr_d, wd, drop_cls):
        sums, bstats, metrics = accumulate(
            state, batch, rng, g_loss(drop_cls),
            live_keys=g_live(state.grad_acc is not None))
        return g_apply(state, sums, bstats, metrics,
                       batch["label"].shape[0], lr, lr1, lr_d, wd)

    if not jit:
        d_step.parts = (d_loss, d_live, d_apply)  # for the chunked factory
        g_step.parts = (g_loss, g_live, g_apply)
        return d_step, g_step
    # in-place state update on device (see engine.make_train_step)
    return (jax.jit(d_step, donate_argnums=(0,)),
            jax.jit(g_step, donate_argnums=(0,)))


def make_i3d_chunked_steps(model, opts, *, adv=0.0, jit=True, detach=False,
                           train_backbone=True, stop_gradient=False,
                           donate_chunk=False):
    """Host-chunked gradient accumulation for the full reference recipe.

    The monolithic in-step scan (make_i3d_steps) holds the entire
    (iter_size, B, ...) clip stack resident in HBM — at the reference
    train.sh shape (clip 64 x batch 3 x iter-size 32,
    /root/reference/code/dmcnet_I3D/train.sh) that is ~8.6 GB of f32 input
    before activations, past one v5e chip alongside the step's working
    set.  These steps instead chain the SAME scan over host-fed chunks of
    the microbatch stack, carrying (grad sums, batch_stats, rng, metric
    sums) across calls; residency drops to one chunk.  The chaining is
    numerically equivalent to the single scan — identical rng split chain,
    identical batch_stats threading, grad/metric sums reassociated only at
    chunk boundaries (tests/test_i3d_chunked.py asserts == monolithic,
    including the torch .grad carry across alternating D/G macro steps).

    Returns (d_accum, d_apply, g_accum, g_apply):
      accum(state, chunk, rng, carry, drop_cls) -> carry
        `chunk`: (C, B, ...) stacked microbatches (C may vary per call —
        each distinct C compiles once).  `carry=None` opens a macro step
        and consumes `rng`; subsequent calls thread carry["rng"] (the
        `rng` argument is ignored then).  `state` is read, not donated.
      apply(state, carry, lr, lr1, lr_d, wd, drop_cls) -> (state, metrics)
        closes the macro step: torch-carry merge, grad division by the
        TOTAL microbatch count, optimizer updates — byte-for-byte the
        monolithic steps' tail.  Donates state and carry.

    `donate_chunk=True` additionally donates the chunk input buffers to
    accum (frees each chunk's HBM as soon as its grads are folded) — off
    by default so callers may re-feed a resident chunk (bench_i3d.py)."""
    raw_d, raw_g = make_i3d_steps(
        model, opts, adv=adv, jit=False, detach=detach,
        train_backbone=train_backbone, stop_gradient=stop_gradient)

    def make_accum(loss_of, live_of):
        def accum(state, chunk, rng, carry, drop_cls):
            has_carry = state.grad_acc is not None
            bstats = state.batch_stats if carry is None else carry["bstats"]
            if carry is not None:
                rng = carry["rng"]
            sums, bstats, rng, msums = _scan_micros(
                state.params, bstats, chunk, rng, loss_of(drop_cls),
                live_of(has_carry))
            n = jnp.int32(chunk["label"].shape[0])
            if carry is not None:
                sums = jax.tree.map(jnp.add, carry["sums"], sums)
                msums = {k: carry["msums"][k] + v for k, v in msums.items()}
                n = carry["n"] + n
            return {"sums": sums, "bstats": bstats, "rng": rng,
                    "msums": msums, "n": n}

        return accum

    def make_apply(apply_fn):
        def apply(state, carry, lr, lr1, lr_d, wd, drop_cls):
            del drop_cls  # consumed at accumulation time (it shapes grads)
            metrics = {k: v / carry["n"] for k, v in carry["msums"].items()}
            return apply_fn(state, carry["sums"], carry["bstats"], metrics,
                            carry["n"], lr, lr1, lr_d, wd)

        return apply

    d_accum = make_accum(raw_d.parts[0], raw_d.parts[1])
    g_accum = make_accum(raw_g.parts[0], raw_g.parts[1])
    d_apply = make_apply(raw_d.parts[2])
    g_apply = make_apply(raw_g.parts[2])
    if not jit:
        return d_accum, d_apply, g_accum, g_apply
    donate = (1, 3) if donate_chunk else (3,)
    return (jax.jit(d_accum, donate_argnums=donate),
            jax.jit(d_apply, donate_argnums=(0, 1)),
            jax.jit(g_accum, donate_argnums=donate),
            jax.jit(g_apply, donate_argnums=(0, 1)))


def make_i3d_eval_step(model, jit=True):
    def step(state, batch):
        mv_res = jnp.concatenate([batch["mv"], batch["residual"]], axis=-1)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = model.apply(variables, mv_res, "flow+logit", False, False)
        logits, gen = out
        top1, top5 = topk_correct(logits, batch["label"], (1, 5))
        # label is echoed so a replicate_out sharded wrapper hands every
        # process the full (logits, label) rows for the score dump
        return {"logits": logits, "label": batch["label"],
                "top1": top1, "top5": top5}

    return jax.jit(step) if jit else step
