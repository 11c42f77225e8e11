"""Training driver — flag-compatible with reference code/dmcnet/train.py
(and, with --gan, code/dmcnet_GAN/train.py).

Orchestration mirrors the reference `main()` (train.py:31-201): build model,
optionally partial-init from --weights, per-epoch stepwise lr with freeze
phase, train + periodic validation, best-checkpoint tracking.  The compute
runs as jitted steps over a data-parallel mesh (see parallel/mesh.py).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import jax.profiler
import numpy as np

from dmcnet_tpu.cli.train_options import build_parser, num_classes_for
from dmcnet_tpu.data.dmc_dataset import (
    BatchAssembler,
    CoviarDataset,
    augment_eval_batch,
    augment_train_batch,
)
from dmcnet_tpu.data.loader import PrefetchLoader
from dmcnet_tpu.models import DMCNet
from dmcnet_tpu.train.checkpoints import (
    checkpoint_name,
    load_checkpoint,
    load_reference_weights,
    save_checkpoint,
)
from dmcnet_tpu.train.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from dmcnet_tpu.train.engine_gan import make_gan_train_steps
from dmcnet_tpu.train.metrics import AverageMeter
from dmcnet_tpu.train.optimizers import step_decay_lr

SAVE_FREQ = 40
PRINT_FREQ = 20


def flush_pending(pending, meters):
    """Materialize deferred device metrics into the meters (exact values;
    the deferral only moves the device sync off the per-step path)."""
    for m_i, b_i in pending:
        for k in ("loss", "loss_cls", "loss_mse", "loss_adv",
                  "top1", "top5", "acc_D_adv", "acc_G_adv"):
            if k in m_i:
                meters[k].update(float(m_i[k]), b_i)
    pending.clear()


def build_model(args, num_class, gan):
    dtype = jnp.bfloat16 if getattr(args, "bf16", 0) else None
    return DMCNet(
        dtype=dtype,
        num_class=num_class,
        num_segments=args.num_segments,
        representation=args.representation,
        arch=args.arch,
        new_length=args.new_length,
        gen_flow_or_delta=args.gen_flow_or_delta,
        gen_flow_ds_factor=args.gen_flow_ds_factor,
        arch_estimator=args.arch_estimator,
        arch_d=getattr(args, "arch_d", None) if gan else None,
        att=args.att,
        detach_classifier=not gan,
        packed_gen=getattr(args, "packed_gen", 0))


def make_datasets(args):
    common = dict(
        data_root=args.data_root, flow_root=args.flow_root,
        representation=args.representation, num_segments=args.num_segments,
        accumulate=(not args.no_accumulation), gop=args.gop,
        flow_ds_factor=args.flow_ds_factor,
        upsample_interp=args.upsample_interp,
        mv_minmaxnorm=args.mv_minmaxnorm, flow_folder=args.data_flow,
        new_length=args.new_length,
        gop_cache_mb=getattr(args, "gop_cache_mb", 128),
        reader_cache=getattr(args, "reader_cache", 32))
    train_ds = CoviarDataset(video_list=args.train_list, is_train=True,
                             **common)
    val_ds = CoviarDataset(video_list=args.test_list, is_train=False,
                           **common)
    return train_ds, val_ds


def main(argv=None, gan=False, input_size=224):
    """`input_size` defaults to the reference's fixed 224 (model.py:306);
    overridable programmatically for small-scale tests."""
    parser = build_parser(gan=gan)
    args = parser.parse_args(argv)
    print("Training arguments:")
    for k, v in sorted(vars(args).items()):
        print(f"\t{k}: {v}")

    # Multi-host: one jitted program spans all hosts' devices; each host
    # feeds its local shard (replaces the reference's vestigial DDP path,
    # train_model.py:117-118).  No-op single-process.
    from dmcnet_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_distributed,
        local_shard_indices,
    )
    initialize_distributed(args.dist_coordinator, args.dist_num_processes,
                           args.dist_process_id)
    multi_host = jax.process_count() > 1

    num_class = num_classes_for(args.data_name)
    model = build_model(args, num_class, gan)
    train_ds, val_ds = make_datasets(args)
    scale_size = input_size * 256 // 224
    train_asm = BatchAssembler(train_ds, input_size=input_size,
                               scale_size=scale_size)
    val_asm = BatchAssembler(val_ds, input_size=input_size,
                             scale_size=scale_size, test_crops=1)

    aug_kwargs = dict(representation=args.representation,
                      flow_ds_factor=args.flow_ds_factor,
                      upsample_interp=args.upsample_interp,
                      input_size=input_size)

    # Init state from one sample batch.
    sample = augment_train_batch(train_asm.train_batch(
        range(min(2, len(train_ds)))), **aug_kwargs)
    state, opts = create_train_state(
        model, jax.random.key(0), sample,
        lr_cls_mult=args.lr_cls_mult, lr_mse_mult=args.lr_mse_mult,
        lr_d_mult=getattr(args, "lr_d_mult", None) if gan else None)

    start_epoch, best_prec1 = 0, 0.0
    if args.weights:
        params, batch_stats, skipped, missing = load_reference_weights(
            state, None, args.weights)
        state = state.replace(params=params, batch_stats=batch_stats)
        print(f"loaded --weights {args.weights} "
              f"(skipped {len(skipped)}, missing {len(missing)})")
    if getattr(args, "auto_resume", 0) and not args.resume:
        # preemption-safe restart: pick up the run's own checkpoint if one
        # exists (the reference requires a manual --resume, train.py:145)
        import os
        cand = checkpoint_name(args.model_prefix, args.representation)
        if args.ckpt_backend.startswith("orbax"):
            from dmcnet_tpu.train.checkpoints import (
                orbax_checkpoint_committed,
            )
            cand += ".orbax"
            ok = orbax_checkpoint_committed(cand)  # skip torn async writes
        else:
            ok = os.path.exists(cand)
        if multi_host:
            # per-host filesystems can disagree after a partial preemption;
            # resume only if EVERY process sees the checkpoint, or the mesh
            # programs desynchronize
            from jax.experimental import multihost_utils
            ok = bool(multihost_utils.process_allgather(
                jnp.int32(ok)).min())
        if ok:
            args.resume = cand
            print(f"--auto-resume: found {cand}")
    if args.resume:
        if args.ckpt_backend.startswith("orbax"):
            from dmcnet_tpu.train.checkpoints import load_checkpoint_orbax
            state, meta = load_checkpoint_orbax(state, args.resume)
        else:
            state, meta = load_checkpoint(state, args.resume)
        start_epoch = meta["epoch"]
        best_prec1 = meta.get("best_prec1", 0.0)
        print(f"=> loaded checkpoint '{args.resume}' (epoch {start_epoch})")

    # Data-parallel mesh over all visible devices: batch sharded on the
    # 'data' axis, state replicated, gradient all-reduce emitted by XLA
    # (replaces reference DataParallel, train.py:117).
    n_dev = jax.device_count()
    tp = getattr(args, "tp", 0) or 0
    if tp > 1 and n_dev % tp != 0:
        raise SystemExit(f"--tp {tp} must divide the device count ({n_dev})")
    data_dev = n_dev // tp if tp > 1 else n_dev
    use_mesh = n_dev > 1 and data_dev > 0 and args.batch_size % data_dev == 0
    if tp > 1 and not use_mesh:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the data "
            f"axis ({data_dev} = {n_dev} devices / tp {tp})")
    if multi_host and not use_mesh:
        # refusing is better than silently training unsynchronized per-host
        # replicas (no mesh = no gradient all-reduce)
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"global device count ({n_dev}) for multi-host training")
    if use_mesh:
        from dmcnet_tpu.parallel import (
            make_mesh, make_sharded_train_step, replicate_state, shard_batch)
        if tp > 1:
            # 2-D (data, model) mesh: batch on 'data', every conv/dense
            # kernel column-sharded over 'model' (parallel/tensor.py);
            # --fsdp additionally ZeRO-3-shards the second kernel dim.
            from dmcnet_tpu.parallel import (
                make_fsdp_train_step, make_mesh_2d, shard_state_tp)
            if multi_host and not args.ckpt_backend.startswith("orbax"):
                raise SystemExit(
                    "--tp with multi-host requires --ckpt-backend orbax "
                    "(msgpack checkpoints gather the full state, which is "
                    "not addressable from one process)")
            mesh = make_mesh_2d(model=tp)
            state, fsdp_specs = shard_state_tp(
                state, mesh, with_fsdp=bool(getattr(args, "fsdp", 0)))
            wrap = lambda fn: make_fsdp_train_step(fn, mesh, fsdp_specs)
        elif getattr(args, "fsdp", 0):
            # ZeRO-3: params/moments live sharded over the same axis as the
            # batch; GSPMD all-gathers weights on use and reduce-scatters
            # grads (parallel/fsdp.py).
            from dmcnet_tpu.parallel import (
                make_fsdp_train_step, shard_state_fsdp)
            mesh = make_mesh()
            if multi_host and not args.ckpt_backend.startswith("orbax"):
                raise SystemExit(
                    "--fsdp with multi-host requires --ckpt-backend orbax "
                    "(msgpack checkpoints gather the full state, which is "
                    "not addressable from one process)")
            state, fsdp_specs = shard_state_fsdp(state, mesh)
            wrap = lambda fn: make_fsdp_train_step(fn, mesh, fsdp_specs)
        else:
            fsdp_specs = None
            mesh = make_mesh()
            state = replicate_state(state, mesh)
            wrap = lambda fn: make_sharded_train_step(fn, mesh)
        if multi_host:
            # each host contributes batch_size/process_count samples
            place = lambda b: global_batch_from_local(
                jax.tree.map(np.asarray, b), mesh)
        else:
            place = lambda b: shard_batch(b, mesh)
    else:
        # donate the state: params/optimizer moments update in place
        wrap = lambda fn: jax.jit(fn, donate_argnums=(0,))
        place = lambda b: b

    if gan:
        d_step, g_step = make_gan_train_steps(
            model, opts, num_segments=args.num_segments,
            lr_cls_w=args.lr_cls, lr_adv_g=args.lr_adv_g,
            lr_adv_d=args.lr_adv_d, lr_mse_w=args.lr_mse,
            loss_mse=args.loss_mse, jit=False)
        d_step, g_step = wrap(d_step), wrap(g_step)
    else:
        train_step = wrap(make_train_step(
            model, opts, num_segments=args.num_segments,
            lr_cls_w=args.lr_cls, lr_mse_w=args.lr_mse,
            loss_mse=args.loss_mse, jit=False))
    raw_eval = make_eval_step(model, num_segments=args.num_segments,
                              lr_cls_w=args.lr_cls, lr_mse_w=args.lr_mse,
                              loss_mse=args.loss_mse, jit=not use_mesh)
    if use_mesh:
        from dmcnet_tpu.parallel import make_sharded_eval_step
        if fsdp_specs is not None:
            from dmcnet_tpu.parallel import make_fsdp_eval_step
            eval_step = make_fsdp_eval_step(raw_eval, mesh, fsdp_specs)
        else:
            eval_step = make_sharded_eval_step(raw_eval, mesh)
        # multi-host: each process assembles only its rows of each padded
        # eval batch and contributes them via global_batch_from_local
        eval_place = place if multi_host else None
    else:
        eval_step = raw_eval
        eval_place = None

    batches_per_epoch = max(1, len(train_ds) // args.batch_size)
    rng = jax.random.key(1)
    from dmcnet_tpu.utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(getattr(args, "metrics_jsonl", None))

    for epoch in range(start_epoch, args.epochs):
        lr = step_decay_lr(args.lr, epoch, args.lr_steps, args.lr_decay)
        freeze = epoch < args.epoch_thre
        print(f"current epoch freeze?: {freeze}")

        def make_batch(i):
            start = i * args.batch_size
            if multi_host:
                # this host assembles only its shard of the global batch
                idx = [start + j
                       for j in local_shard_indices(args.batch_size)]
            else:
                idx = range(start, start + args.batch_size)
            return train_asm.train_batch(idx)

        loader = PrefetchLoader(make_batch, batches_per_epoch,
                                workers=args.workers)
        meters = {k: AverageMeter() for k in
                  ("batch_time", "data_time", "loss", "loss_cls",
                   "loss_mse", "loss_adv", "top1", "top5",
                   "acc_D_adv", "acc_G_adv")}
        pending = []
        profiling = False
        end = time.time()
        for i, raw in enumerate(loader):
            if args.profile_dir and epoch == start_epoch:
                # steps 2-7: past compile, short enough to view in xprof
                # (epochs shorter than 3 batches trace from step 0)
                if i == min(2, batches_per_epoch - 1):
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                elif i == 8 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"XLA trace written to {args.profile_dir}")
            meters["data_time"].update(time.time() - end)
            batch = place(augment_train_batch(raw, **aug_kwargs))
            rng, step_rng = jax.random.split(rng)
            if gan:
                fn = d_step if i % 2 == 0 else g_step
                lr_cls_eff = 0.0 if freeze else lr
                state, metrics = fn(state, batch, step_rng,
                                    jnp.float32(lr), jnp.float32(lr_cls_eff),
                                    jnp.float32(lr), jnp.float32(args.weight_decay))
            else:
                state, metrics = train_step(
                    state, batch, step_rng, jnp.float32(lr),
                    jnp.float32(args.weight_decay),
                    jnp.asarray(not freeze))
            bsz = batch["label"].shape[0]
            # Defer metric materialization: float(metrics[...]) would force
            # a device sync every step and serialize host batch assembly
            # against device compute.  Values are flushed (exactly) at print
            # time, keeping the dispatch pipeline full in between.
            pending.append((metrics, bsz))
            meters["batch_time"].update(time.time() - end)
            end = time.time()
            if i % PRINT_FREQ == 0:
                flush_pending(pending, meters)
                line = (f"Epoch: [{epoch}][{i}/{batches_per_epoch}], "
                        f"lr_gf: {lr:.7f}\t"
                        f"Time {meters['batch_time'].val:.3f} "
                        f"({meters['batch_time'].avg:.3f})\t"
                        f"Data {meters['data_time'].val:.3f} "
                        f"({meters['data_time'].avg:.3f})\t"
                        f"Loss {meters['loss'].val:.4f} "
                        f"({meters['loss'].avg:.4f})\t"
                        f"Prec@1 {meters['top1'].val:.3f} "
                        f"({meters['top1'].avg:.3f})\t"
                        f"Prec@5 {meters['top5'].val:.3f} "
                        f"({meters['top5'].avg:.3f})")
                if gan:
                    line = (("D " if i % 2 == 0 else "G ") + line
                            + f"\tLoss_adv {meters['loss_adv'].avg:.4f}"
                            f"\tacc_D_adv {meters['acc_D_adv'].avg:.3f}"
                            f"\tacc_G_adv {meters['acc_G_adv'].avg:.3f}")
                print(line)
                mlog.log("train", epoch=epoch, step=i, lr=lr,
                         loss=meters["loss"].avg, top1=meters["top1"].avg,
                         top5=meters["top5"].avg,
                         batch_time=meters["batch_time"].avg,
                         data_time=meters["data_time"].avg,
                         **({"loss_adv": meters["loss_adv"].avg}
                            if gan else {}))
        flush_pending(pending, meters)  # tail batches past the last print
        if profiling:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            print(f"XLA trace written to {args.profile_dir}")

        if epoch % args.eval_freq == 0 or epoch == args.epochs - 1:
            prec1 = validate(val_ds, val_asm, eval_step, state, args,
                             aug_kwargs, place=eval_place)
            mlog.log("eval", epoch=epoch, prec1=prec1)
            is_best = prec1 > best_prec1
            best_prec1 = max(prec1, best_prec1)
            if is_best or epoch % SAVE_FREQ == 0:
                name = checkpoint_name(args.model_prefix, args.representation)
                meta = {"epoch": epoch + 1, "arch": args.arch,
                        "best_prec1": best_prec1}
                if args.ckpt_backend.startswith("orbax"):
                    from dmcnet_tpu.train.checkpoints import (
                        save_checkpoint_orbax,
                    )
                    wait = args.ckpt_backend != "orbax-async"
                    save_checkpoint_orbax(state, meta, name + ".orbax",
                                          wait=wait)
                    if is_best:  # keep a best-model artifact (train.py:375)
                        save_checkpoint_orbax(
                            state, meta,
                            name.replace("checkpoint", "model_best")
                            + ".orbax", wait=wait)
                else:
                    save_checkpoint(state, meta, name, is_best)
                if getattr(args, "save_reference_ckpt", 0):
                    from dmcnet_tpu.models.export_torch import (
                        save_reference_checkpoint,
                    )
                    host_state = jax.tree.map(np.asarray, state)
                    ref = name.replace(".orbax", "") + ".ref.pth.tar"
                    save_reference_checkpoint(
                        host_state, ref, epoch=epoch + 1, arch=args.arch,
                        best_prec1=best_prec1)
                    print(f"reference-format checkpoint: {ref}")
    mlog.close()
    if args.ckpt_backend == "orbax-async":
        # drain in-flight background writes before the process exits
        from dmcnet_tpu.train.checkpoints import wait_for_checkpoints
        wait_for_checkpoints()
    return best_prec1


def validate(val_ds, val_asm, eval_step, state, args, aug_kwargs,
             place=None):
    """Reference validate() (train.py:292-369); the ragged final batch is
    padded to the fixed batch size with a 0/1 weight mask (one XLA compile
    total, exact masked means).  `place` (multi-host): assembles this
    process's rows of each batch into the global sharded array."""
    top1 = AverageMeter()
    losses = AverageMeter()
    n = len(val_ds)
    bs = args.batch_size
    from dmcnet_tpu.data.loader import pad_indices
    if place is not None:
        from dmcnet_tpu.parallel.multihost import local_shard_indices
        rows = list(local_shard_indices(bs))
    for start in range(0, n, bs):
        idx, n_valid = pad_indices(start, min(start + bs, n), bs)
        weight = (np.arange(bs) < n_valid).astype(np.float32)
        if place is not None:
            local_idx = [idx[j] for j in rows]
            batch = augment_eval_batch(val_asm.eval_batch(local_idx),
                                       **aug_kwargs)
            batch = {k: np.asarray(v) for k, v in batch.items()}
            batch["weight"] = weight[rows]
            batch = place(batch)
        else:
            batch = augment_eval_batch(val_asm.eval_batch(idx), **aug_kwargs)
            batch["weight"] = jnp.asarray(weight)
        m = eval_step(state, batch)
        top1.update(float(m["top1"]), n_valid)
        losses.update(float(m["loss"]), n_valid)
    print(f"Testing Results: Prec@1 {top1.avg:.3f} Loss {losses.avg:.5f}")
    return top1.avg


if __name__ == "__main__":
    main(sys.argv[1:])
