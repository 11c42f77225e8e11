"""I3D training driver — reference code/dmcnet_I3D/train_{hmdb51,ucf101}.py
+ train_model.py orchestration.

Differences forced by honesty, not convenience: the reference hardcodes
cluster paths (iterator_factory.py:61,84,143,167); here --video-prefix /
--flow-prefix are explicit flags.  Everything else mirrors the reference:
per-iteration MultiFactorScheduler with lr steps divided by batch size x
world size (train_model.py:217-241), stage switch with freshly initialized
optimizers at --epoch-thre, alternating D/G phases by
i_batch % (2*iter_size), detach gating the base lr, per-epoch eval with
best-top1 score dump {scores (N, C), labels, top1} (train/model.py:541-577).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.data.iterator_factory import creat, dataset_num_classes
from dmcnet_tpu.data.loader import PrefetchLoader
from dmcnet_tpu.data.video_iter import I3DBatchAssembler, i3d_augment_batch
from dmcnet_tpu.models.i3d import get_symbol, init_i3d_variables
from dmcnet_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from dmcnet_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from dmcnet_tpu.train.engine import TrainState
from dmcnet_tpu.train.engine_i3d import (
    make_i3d_eval_step,
    make_i3d_optimizers,
    make_i3d_steps,
)
from dmcnet_tpu.train.lr_scheduler import MultiFactorScheduler
from dmcnet_tpu.train.metrics import AverageMeter


def build_parser(dataset_default="HMDB51"):
    p = argparse.ArgumentParser(description="DMC-Net Parser")
    p.add_argument('--debug-mode', type=bool, default=True)
    p.add_argument('--dataset', default=dataset_default,
                   choices=['UCF101', 'HMDB51'])
    p.add_argument('--split', type=int, default=1)
    p.add_argument('--clip-length', type=int, default=16)
    p.add_argument('--train-frame-interval', type=int, default=2)
    p.add_argument('--val-frame-interval', type=int, default=2)
    p.add_argument('--task-name', type=str, default='')
    p.add_argument('--model-dir', type=str, default="./exps/models")
    p.add_argument('--log-file', type=str, default="")
    p.add_argument('--accumulate', type=int, default=1)
    p.add_argument('--mv-minmaxnorm', type=int, default=0)
    p.add_argument('--mv-loadimg', type=int, default=0)
    p.add_argument('--detach', type=int, default=0)
    p.add_argument('--ds_factor', type=int, default=16)
    p.add_argument('--gpus', type=str, default="0")
    p.add_argument('--network', type=str, default='I3D', choices=['I3D'])
    p.add_argument('--arch-estimator', type=str, default=None,
                   choices=['DenseNet', 'DenseNetSmall', 'DenseNetTiny'])
    p.add_argument('--arch-d', type=str, default=None)
    p.add_argument('--pretrained_2d', type=bool, default=False)
    p.add_argument('--pretrained_3d', type=str, default=None)
    p.add_argument('--new_classifier', type=bool, default=False)
    p.add_argument('--new-classifier-weights', type=str,
                   default='./network/pretrained/model_flow.pth',
                   help="classifier re-init source (the reference hardcodes "
                        "this path, train_model.py:193)")
    p.add_argument('--resume-epoch', type=int, default=-1)
    p.add_argument('--metrics-jsonl', type=str, default=None,
                   help='append one JSON object per train/eval log event '
                        '(machine-readable twin of the stdout lines; '
                        'process 0 only).')
    p.add_argument('--auto-resume', type=int, default=0,
                   help="preemption-safe restart: resume from this run's "
                        'newest per-epoch checkpoint if any exists '
                        '(--resume-epoch takes precedence).')
    p.add_argument('--modality', type=str, default='rgb',
                   choices=['rgb', 'flow', 'mv', 'res', 'flow+mp4', 'I'])
    p.add_argument('--drop-out', type=float, default=0.5)
    p.add_argument('--adv', type=float, default=0.)
    p.add_argument('--epoch-thre', type=int, default=1)
    p.add_argument('--optimizer', type=str, default='sgd',
                   choices=['sgd', 'adam'])
    p.add_argument('--fine_tune', type=int, default=1)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--iter-size', type=int, default=1)
    p.add_argument('--lr-base', type=float, default=0.005)
    p.add_argument('--lr-base2', type=float, default=0.002)
    p.add_argument('--lr-d', type=float, default=None)
    p.add_argument('--lr-steps', type=float, nargs="+",
                   default=[int(1e4 * x) for x in
                            [3.5, 6, 8.5, 11, 13.5, 16]])
    p.add_argument('--lr-factor', type=float, default=0.1)
    p.add_argument('--save-frequency', type=float, default=1)
    p.add_argument('--end-epoch', type=int, default=50)
    p.add_argument('--random-seed', type=int, default=1)
    # path flags replacing the reference's hardcoded prefixes
    p.add_argument('--data-root', type=str, default=None,
                   help="dataset dir containing raw/list_cvt lists")
    p.add_argument('--video-prefix', type=str, required=False)
    p.add_argument('--flow-prefix', type=str, default=None)
    p.add_argument('--remat', type=str, default="0",
                   choices=["0", "1", "dots"],
                   help="rematerialize Mixed blocks (activation ckpt; the "
                        "reference imports checkpoint_sequential unused, "
                        "i3d.py:19)")
    p.add_argument('--ckpt-backend', type=str, default='msgpack',
                   choices=['msgpack', 'orbax', 'orbax-async'])
    p.add_argument('--bf16', type=int, default=0,
                   help='mixed-precision training (convs in bfloat16; '
                        'params/BN stats/losses stay float32)')
    p.add_argument('--packed-gen', type=int, default=0,
                   help='space-to-depth factor (e.g. 2) for the dense DMC '
                        'estimators: exact packed reparameterization, same '
                        'parameter tree/checkpoints; 0 = faithful layout')
    p.add_argument('--workers', type=int, default=8,
                   help='host loader threads (the reference hardcodes '
                        'DataLoader num_workers=8, iterator_factory.py:184)')
    p.add_argument('--accum-chunk', type=int, default=0,
                   help='feed iter-size microbatches to the device in '
                        'chunks of this many (0 = the whole stack in one '
                        'jitted scan). Numerically equivalent '
                        '(engine_i3d.make_i3d_chunked_steps); required '
                        'when the full stack does not fit in HBM — the '
                        'reference recipe (clip 64 x batch 3 x iter 32, '
                        'train.sh) is ~8.6 GB of resident input '
                        'monolithically.')
    # Multi-host (the reference's DDP vestige lives precisely in this
    # trainer: train_model.py:117-118, rank-seeded iterators :38-40,
    # hostname-suffixed checkpoints train/model.py:67-74).  When set, each
    # process feeds its local shard of the global --batch-size.
    p.add_argument('--tp', type=int, default=0,
                   help='tensor (model) parallelism degree: 2-D (data, '
                        'model) mesh, conv/dense kernels column-sharded '
                        'over the model axis (parallel/tensor.py); '
                        'combines with --fsdp. 0/1 = off.')
    p.add_argument('--fsdp', type=int, default=0,
                   help='shard params + optimizer moments over the data '
                        'mesh axis (ZeRO-3; parallel/fsdp.py) instead of '
                        'replicating them — per-chip state HBM drops by '
                        '~the device count. No reference analogue '
                        '(DataParallel replicates, train_model.py:117).')
    p.add_argument('--dist-coordinator', type=str, default=None,
                   help='jax.distributed coordinator address (host:port); '
                        'unset = single-process.')
    p.add_argument('--dist-num-processes', type=int, default=None)
    p.add_argument('--dist-process-id', type=int, default=None)
    return p


def autofill(args):
    if not args.task_name:
        args.task_name = os.path.basename(os.getcwd())
    args.model_prefix = os.path.join(args.model_dir, args.task_name)
    args.score_dir = ('./exps/score/{}_{}/'.format(args.dataset, args.split)
                      + args.task_name)
    if args.data_root is None:
        args.data_root = f"./dataset/{args.dataset}"
    return args


def init_pretrained(args, params, bstats):
    """Pretrained init (skipped when resuming — reference
    train_model.py:181-206): a .npz holds an exported Kinetics TF
    checkpoint (load_tf_weights, i3d.py:605-763); --pretrained_2d flags a
    2D torch checkpoint needing temporal inflation (initializer.py:62-143);
    otherwise a reference 3D .pth.  --new_classifier then overlays
    model_flow.pth non-strict (train_model.py:193-200)."""
    if args.resume_epoch >= 0 or not args.pretrained_3d \
            or not os.path.exists(args.pretrained_3d):
        return params, bstats
    in_ch = 2 if args.modality in ("flow", "mv", "flow+mp4") else 3
    if args.pretrained_3d.endswith(".npz"):
        from dmcnet_tpu.models.import_tf_i3d import load_tf_weights
        params, bstats, report = load_tf_weights(
            args.pretrained_3d, params, bstats,
            modality=("rgb" if args.modality == "rgb" else "flow"),
            in_channels=in_ch)
    elif args.pretrained_2d:
        from dmcnet_tpu.models.import_torch_i3d import load_i3d_pth_2d
        params, bstats, report = load_i3d_pth_2d(
            args.pretrained_3d, params, bstats, modality=args.modality,
            rng=args.random_seed)
    else:
        from dmcnet_tpu.models.import_torch_i3d import load_i3d_pth
        params, bstats, report = load_i3d_pth(
            args.pretrained_3d, params, bstats, modality=args.modality)
    print(f"pretrained_3d: {report}")
    if args.new_classifier and os.path.exists(args.new_classifier_weights):
        from dmcnet_tpu.models.import_torch_i3d import load_i3d_pth
        params, bstats, report = load_i3d_pth(
            args.new_classifier_weights, params, bstats,
            modality=args.modality)
        print(f"new_classifier: {report}")
    return params, bstats


def main(argv=None, dataset_default="HMDB51", input_size=224):
    args = autofill(build_parser(dataset_default).parse_args(argv))
    if args.adv > 0 and args.modality != "flow+mp4":
        # the reference only instantiates the discriminator + optimizer_3
        # (and thus the even/odd D/G alternation) for the flow+mp4 symbol;
        # with any other modality the D batch inputs (mv/res/flow) don't
        # exist and our non-GAN LR driver never advances a D scheduler —
        # refuse rather than silently run every D step at lr_d=0
        # (model.py:354-358, lr_scheduler.I3DLRDriver docstring).
        raise SystemExit(
            f"--adv {args.adv} requires --modality flow+mp4 "
            f"(got {args.modality}): the adversarial branch trains the "
            "DMC generator, which only exists in the flow+mp4 symbol")

    # Multi-host: one jitted program spans all hosts' devices; each host
    # feeds its local shard (the reference's vestigial DDP path,
    # train_model.py:117-118).  Must run before any jax.devices() call.
    from dmcnet_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_distributed,
        local_shard_indices,
        process_seed,
    )
    initialize_distributed(args.dist_coordinator, args.dist_num_processes,
                           args.dist_process_id)
    multi_host = jax.process_count() > 1

    # Rank-offset seeding so hosts draw different augmentations
    # (reference seeds iterators by torch.distributed rank,
    # train_model.py:38-40).
    np.random.seed(process_seed(args.random_seed))
    num_classes = dataset_num_classes(args.dataset)
    net, input_conf = get_symbol(
        args.network, modality=args.modality, num_classes=num_classes,
        arch_estimator=args.arch_estimator, arch_d=args.arch_d,
        dropout_prob=args.drop_out,
        remat=("dots" if args.remat == "dots" else bool(int(args.remat))),
        dtype=jnp.bfloat16 if args.bf16 else None,
        packed_gen=args.packed_gen)

    # Data-parallel mesh: the TPU-native DataParallel
    # (reference train_model.py:117-120).  Use the largest device count that
    # divides the global batch so shards stay equal.
    n_dev = len(jax.devices())
    if multi_host:
        # refusing is better than silently training unsynchronized
        # per-host replicas (no mesh = no gradient all-reduce); shrinking
        # the mesh is not an option either — every process's devices must
        # participate.
        if args.batch_size % n_dev or args.batch_size % jax.process_count():
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"global device count ({n_dev}) and process count "
                f"({jax.process_count()}) for multi-host training")
    elif not (args.tp and args.tp > 1):
        while args.batch_size % n_dev:
            n_dev -= 1
    if args.tp and args.tp > 1:
        # 2-D (data, model) mesh: batch on 'data', kernels column-sharded
        # over 'model' (parallel/tensor.py)
        from dmcnet_tpu.parallel import make_mesh_2d
        if n_dev % args.tp:
            raise SystemExit(
                f"--tp {args.tp} must divide the device count ({n_dev})")
        if args.batch_size % (n_dev // args.tp):
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"data axis ({n_dev // args.tp} = {n_dev} devices / "
                f"tp {args.tp})")
        mesh = make_mesh_2d(model=args.tp, devices=jax.devices()[:n_dev])
        print(f"tensor-parallel {n_dev // args.tp}x{args.tp} mesh "
              f"(batch {args.batch_size} -> "
              f"{args.batch_size // (n_dev // args.tp)}/data-row)")
    else:
        mesh = make_mesh(jax.devices()[:n_dev])
        if n_dev > 1:
            print(f"data-parallel over {n_dev} devices (batch "
                  f"{args.batch_size} -> {args.batch_size // n_dev}/chip)")

    train_ds, val_ds = creat(
        args.dataset, args.data_root, args.video_prefix, args.flow_prefix,
        split=args.split, clip_length=args.clip_length,
        train_interval=args.train_frame_interval,
        val_interval=args.val_frame_interval, modality=args.modality,
        accumulate=bool(args.accumulate), ds_factor=args.ds_factor,
        mv_minmaxnorm=bool(args.mv_minmaxnorm),
        seed=process_seed(args.random_seed))
    train_asm = I3DBatchAssembler(train_ds, input_size=input_size,
                                  is_train=True,
                                  seed=process_seed(args.random_seed))
    val_asm = I3DBatchAssembler(val_ds, input_size=input_size,
                                is_train=False)

    aug = dict(modality=args.modality, ds_factor=args.ds_factor,
               upsample_interp=False, input_size=input_size,
               mean=input_conf["mean"][0], std=input_conf["std"][0])

    # In multi-host runs each process assembles only its rows of every
    # microbatch (reference: rank-partitioned DistributedSampler semantics);
    # global_batch_from_local then builds the single global sharded array.
    local_rows = (list(local_shard_indices(args.batch_size)) if multi_host
                  else list(range(args.batch_size)))

    def host_micro(asm, ds, start, iter_size, bs, rows=None):
        """Host-side work only (decode + assemble): safe in loader threads."""
        rows = range(bs) if rows is None else rows
        return [asm.batch([(start + k * bs + j) % len(ds)
                           for j in rows])
                for k in range(iter_size)]

    def stack_micro(micros):
        """Device-side: augment each microbatch and stack (jitted kernels)."""
        aug_micros = [i3d_augment_batch(m, **aug) for m in micros]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *aug_micros)

    def place_train(stacked):
        """(iter_size, B_local, ...) host stacks -> global sharded arrays."""
        if multi_host:
            return global_batch_from_local(
                jax.tree.map(np.asarray, stacked), mesh, batch_axis=1)
        return shard_batch(stacked, mesh, batch_axis=1)

    def stacked_batch(asm, ds, start, iter_size, bs):
        return stack_micro(host_micro(asm, ds, start, iter_size, bs))

    sample = stacked_batch(train_asm, train_ds, 0, 1, 1)
    x0 = jnp.concatenate([sample["mv"][0], sample["residual"][0]], axis=-1)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    params, bstats = init_pretrained(args, params, bstats)

    def fresh_state(params, bstats, stage2, grad_acc=None, opt_d_state=None):
        # Stage-1 flow+mp4 freezes the base I3D regardless of --detach:
        # adjust_learning_rate forces lr_mult 0.2/0.5 -> 0 while
        # epoch+1 <= epoch_thre (model.py:273-277); only the new layers
        # (conv3d_0c_1x1, classifier) follow lr1.  The frozen base group's
        # torch Adam moments do move during stage 1, but the stage-2 swap
        # discards that optimizer wholesale (model.py:347-351), so a static
        # freeze here is faithful.
        freeze_base = (args.modality == "flow+mp4" and args.epoch_thre > 0
                       and not stage2)
        opts = make_i3d_optimizers(
            params, optim=args.optimizer,
            lr_mul=(0.2 if args.fine_tune or args.modality != "flow+mp4"
                    else 0.5),
            has_gan=args.adv > 0, stage2=stage2, freeze_base=freeze_base)
        if args.adv > 0 and grad_acc is None:
            # torch .grad carry-over between D and G phases
            # (engine.TrainState.grad_acc); preserved across the stage-2
            # swap — zero_grad was per-optimizer, .grad lives on the param
            grad_acc = jax.tree.map(jnp.zeros_like, params)
        if args.adv > 0 and opt_d_state is None:
            opt_d_state = opts["d"].init(params)
        state = TrainState(
            params=params, batch_stats=bstats,
            opt_cls=opts["cls"].init(params),
            opt_gf=opts["gf"].init(params),
            # the stage-2 swap replaces ONLY optimizer/optimizer_mse
            # (model.py:349-350); optimizer_3 keeps its Adam moments and
            # step count, so the caller threads opt_d_state through
            opt_d=opt_d_state if args.adv > 0 else None,
            grad_acc=grad_acc)
        # Raw (unjitted) steps wrapped with explicit mesh shardings: batch
        # sharded on B (axis 1 of the stacked (iter_size, B, ...) layout),
        # state replicated; XLA inserts the gradient all-reduce over ICI.
        # Stage 1 with --detach runs the base optimizer at lr 0 and its
        # moments die at the stage switch, so those steps statically skip
        # the backbone PARAMETER backward (engine_i3d.make_i3d_steps
        # docstring).  Only valid when epoch_thre <= 1: at epoch 0 the G
        # loss drops the cls term, so the base-grad carry into the first
        # stage-2 D step is exactly zero; with epoch_thre > 1 the stage-1
        # epochs >= 1 accumulate REAL base grads whose carry crosses the
        # stage switch (torch .grad lives on the param, not the swapped
        # optimizer), so those runs take the full backward.
        frozen_backbone = (not stage2 and bool(args.detach)
                           and args.epoch_thre <= 1
                           and args.modality == "flow+mp4")
        d_step, g_step = make_i3d_steps(net, opts, adv=args.adv, jit=False,
                                        detach=bool(args.detach),
                                        train_backbone=not frozen_backbone)
        if args.accum_chunk and args.accum_chunk < args.iter_size:
            # host-chunked accumulation (engine_i3d.make_i3d_chunked_steps):
            # the loop feeds --accum-chunk microbatches per dispatch and
            # carries (grad sums, batch_stats, rng, metric sums); required
            # when the monolithic (iter_size, B, ...) stack does not fit in
            # HBM (the reference recipe clip 64 x batch 3 x iter 32 is
            # ~8.6 GB of resident input).  Numerically equivalent
            # (tests/test_i3d_chunked.py).
            if (args.tp and args.tp > 1) or args.fsdp:
                raise SystemExit(
                    "--accum-chunk composes with plain data parallelism "
                    "only; --fsdp/--tp already cut per-chip residency by "
                    "sharding state and batch over the mesh")
            from dmcnet_tpu.parallel import make_sharded_chunked_steps
            from dmcnet_tpu.train.engine_i3d import make_i3d_chunked_steps

            raw = make_i3d_chunked_steps(
                net, opts, adv=args.adv, jit=False,
                detach=bool(args.detach),
                train_backbone=not frozen_backbone)
            wrapped = make_sharded_chunked_steps(raw, mesh, batch_axis=1)
            d_step = (wrapped[0], wrapped[1])
            g_step = (wrapped[2], wrapped[3])
            return replicate_state(state, mesh), d_step, g_step, None
        if args.tp and args.tp > 1:
            # column-sharded kernels over 'model'; --fsdp additionally
            # ZeRO-3-shards the second kernel dim over 'data'
            from dmcnet_tpu.parallel import (
                make_fsdp_train_step, shard_state_tp)
            state, specs = shard_state_tp(state, mesh,
                                          with_fsdp=bool(args.fsdp))
            d_step = make_fsdp_train_step(d_step, mesh, specs, batch_axis=1)
            g_step = make_fsdp_train_step(g_step, mesh, specs, batch_axis=1)
            return state, d_step, g_step, specs
        if args.fsdp:
            # ZeRO-3: state sharded over the same axis as the batch; GSPMD
            # all-gathers weights on use, reduce-scatters grads
            # (parallel/fsdp.py).  I3D is where this matters — SGD+GAN
            # carries 3 moment sets of a 12M-param model.
            from dmcnet_tpu.parallel import (
                make_fsdp_train_step, shard_state_fsdp)
            state, specs = shard_state_fsdp(state, mesh)
            d_step = make_fsdp_train_step(d_step, mesh, specs, batch_axis=1)
            g_step = make_fsdp_train_step(g_step, mesh, specs, batch_axis=1)
            return state, d_step, g_step, specs
        d_step = make_sharded_train_step(d_step, mesh, batch_axis=1)
        g_step = make_sharded_train_step(g_step, mesh, batch_axis=1)
        return replicate_state(state, mesh), d_step, g_step, None

    def ckpt_path(epoch):
        """Hostname-suffixed checkpoint names in msgpack multi-host runs so
        hosts never collide on a shared filesystem (reference
        get_checkpoint_path, train/model.py:67-74).  Orbax checkpoints are
        NOT suffixed: a sharded (--fsdp/--tp) save is a collective write
        into ONE directory, every process contributing its shards."""
        import socket
        msgpack = not args.ckpt_backend.startswith("orbax")
        suffix = f"_{socket.gethostname()}" if multi_host and msgpack else ""
        return f"{args.model_prefix}_ep-{epoch:04d}{suffix}.pth"

    if getattr(args, "auto_resume", 0) and args.resume_epoch < 0:
        # preemption-safe restart: resume from the newest of this run's own
        # per-epoch checkpoints (the reference requires a manual
        # --resume-epoch, train_model.py:209-215)
        from dmcnet_tpu.train.checkpoints import orbax_checkpoint_committed

        orbax = args.ckpt_backend.startswith("orbax")
        newest = -1
        for e in range(args.end_epoch, 0, -1):
            # the orbax probe skips torn (interrupted mid-write) saves
            found = (orbax_checkpoint_committed(ckpt_path(e) + ".orbax")
                     if orbax else os.path.exists(ckpt_path(e)))
            if found:
                newest = e
                break
        if multi_host:
            # hosts may have been preempted at different points (msgpack
            # checkpoints are per-host files): agree on the OLDEST epoch
            # every process has, or the mesh programs desynchronize
            from jax.experimental import multihost_utils
            newest = int(multihost_utils.process_allgather(
                jnp.int32(newest)).min())
        if newest >= 0:
            args.resume_epoch = newest
            print(f"--auto-resume: epoch {newest}")

    # Resuming at/after epoch_thre: build the stage-2 optimizers FIRST so
    # the checkpoint's moments restore into them — rebuilding after the
    # load would silently zero the restored optimizer state.
    resume_stage2 = (args.modality == "flow+mp4" and args.resume_epoch >= 0
                     and args.resume_epoch >= args.epoch_thre)
    if ((args.fsdp or args.tp > 1) and multi_host
            and not args.ckpt_backend.startswith("orbax")):
        raise SystemExit(
            "--fsdp/--tp with multi-host requires --ckpt-backend orbax "
            "(msgpack checkpoints gather the full state, which is not "
            "addressable from one process)")
    state, d_step, g_step, fsdp_specs = fresh_state(
        params, bstats, stage2=resume_stage2)
    if args.resume_epoch >= 0:
        ckpt = ckpt_path(args.resume_epoch)
        if args.ckpt_backend.startswith("orbax"):
            from dmcnet_tpu.train.checkpoints import load_checkpoint_orbax
            state, meta = load_checkpoint_orbax(state, ckpt + ".orbax")
        else:
            state, meta = load_checkpoint(state, ckpt)
        if args.tp and args.tp > 1:
            from dmcnet_tpu.parallel import shard_state_tp
            state, fsdp_specs = shard_state_tp(state, mesh,
                                               with_fsdp=bool(args.fsdp))
        elif args.fsdp:
            from dmcnet_tpu.parallel import shard_state_fsdp
            state, fsdp_specs = shard_state_fsdp(state, mesh)
        else:
            state = replicate_state(state, mesh)
        print(f"resumed from {ckpt} (epoch {meta.get('epoch')})")
    # Mesh-constrained eval: required in multi-host runs, where the
    # replicated state spans every process and a plain local jit would
    # reject it (same construct as cli/train.py's validate path).
    # `replicate_out` all-gathers logits/labels so every process can read
    # the full score rows for the npz dump.
    from dmcnet_tpu.parallel import make_sharded_eval_step

    def make_eval(specs):
        # under --fsdp/--tp the spec tree tracks the CURRENT optimizer
        # structure (it changes at the stage-2 switch), so the eval step is
        # rebuilt alongside the train steps
        if specs is not None:
            from dmcnet_tpu.parallel import make_fsdp_eval_step
            return make_fsdp_eval_step(
                make_i3d_eval_step(net, jit=False), mesh, specs,
                replicate_out=multi_host)
        return make_sharded_eval_step(
            make_i3d_eval_step(net, jit=False), mesh,
            replicate_out=multi_host)

    eval_step = make_eval(fsdp_specs)

    # lr steps divided by effective samples per scheduler tick
    # (train_model.py:217-222 divides the per-process batch by world_size;
    # here --batch-size is already the GLOBAL batch, so it carries the
    # world-size factor itself).
    step_div = max(1, int(args.batch_size))
    sched_steps = sorted({max(1, int(s // step_div)) for s in args.lr_steps})
    sched1 = MultiFactorScheduler(sched_steps, args.lr_base, args.lr_factor)
    sched2 = MultiFactorScheduler(sched_steps, args.lr_base2, args.lr_factor)
    sched3 = MultiFactorScheduler(
        sched_steps, args.lr_d if args.lr_d else args.lr_base,
        args.lr_factor)
    from dmcnet_tpu.train.lr_scheduler import I3DLRDriver
    if args.modality == "flow+mp4":
        lr_driver = I3DLRDriver(sched1, sched2, sched3,
                                epoch_thre=args.epoch_thre,
                                detach=bool(args.detach),
                                has_gan=args.adv > 0)
    else:
        # no optimizer_mse: every microbatch adjusts from sched1, no stage
        # split, no detach gating (model.py:456-458)
        lr_driver = I3DLRDriver(sched1, sched1, None, epoch_thre=0)

    from dmcnet_tpu.utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(getattr(args, "metrics_jsonl", None))
    batches_per_epoch = max(1, len(train_ds) //
                            (args.batch_size * args.iter_size))
    rng = jax.random.key(args.random_seed)
    best_top1 = -1.0
    os.makedirs(args.score_dir, exist_ok=True)
    os.makedirs(args.model_dir, exist_ok=True)
    switched = resume_stage2

    for epoch in range(max(args.resume_epoch, 0), args.end_epoch):
        # >= so a resume landing past epoch_thre still applies the stage-2
        # optimizers (reference recreates them at the threshold,
        # model.py:347-351)
        if args.modality == "flow+mp4" and epoch >= args.epoch_thre \
                and not switched:
            print("stage 2: fresh optimizers (reference model.py:347-351)")
            state, d_step, g_step, fsdp_specs = fresh_state(
                state.params, state.batch_stats, stage2=True,
                grad_acc=state.grad_acc, opt_d_state=state.opt_d)
            if fsdp_specs is not None:
                eval_step = make_eval(fsdp_specs)
            switched = True
        meters = {k: AverageMeter() for k in
                  ("loss", "loss_cls", "loss_mse", "top1", "speed")}
        t_epoch = time.time()
        # loader threads overlap host decode/assembly with device steps
        # (reference DataLoader num_workers=8, iterator_factory.py:184)
        loader = PrefetchLoader(
            lambda i: host_micro(train_asm, train_ds,
                                 i * args.batch_size * args.iter_size,
                                 args.iter_size, args.batch_size,
                                 rows=local_rows),
            batches_per_epoch, workers=args.workers)
        chunked = args.accum_chunk and args.accum_chunk < args.iter_size
        for i_batch, micros in enumerate(loader):
            t0 = time.time()
            rng, srng = jax.random.split(rng)
            use_d = args.adv > 0 and i_batch % 2 == 0
            # Reference-exact scheduler advancement, including the
            # stale-lr quirks (lr_scheduler.I3DLRDriver docstring); one
            # macro step consumes iter_size microbatch advances
            # (train/model.py:367-385,439-455).
            lr, lr1, lr_d = lr_driver.macro_step(epoch, use_d,
                                                 args.iter_size)
            fn = d_step if use_d else g_step
            lrs = (jnp.float32(lr), jnp.float32(lr1),
                   jnp.float32(lr_d or 0.0), jnp.float32(1e-4))
            drop = jnp.asarray(epoch < 1)
            if chunked:
                accum, apply = fn
                carry = None
                for c0 in range(0, args.iter_size, args.accum_chunk):
                    chunk = place_train(stack_micro(
                        micros[c0:c0 + args.accum_chunk]))
                    carry = accum(state, chunk, srng, carry, drop)
                state, metrics = apply(state, carry, *lrs, drop)
            else:
                batch = place_train(stack_micro(micros))
                state, metrics = fn(state, batch, srng, *lrs, drop)
            n = args.batch_size * args.iter_size
            for k in ("loss", "loss_cls", "loss_mse", "top1"):
                if k in metrics:
                    meters[k].update(float(metrics[k]), n)
            meters["speed"].update(n / (time.time() - t0))
            if i_batch % 50 == 0:
                print(f"Epoch[{epoch}] Batch [{i_batch}]  "
                      f"Speed: {meters['speed'].avg:.2f} samples/sec  "
                      f"loss-ce {meters['loss_cls'].avg:.5f}  "
                      f"top-1 {meters['top1'].avg:.5f}")
                mlog.log("train", epoch=epoch, step=i_batch,
                         speed=meters["speed"].avg,
                         loss_cls=meters["loss_cls"].avg,
                         loss_mse=meters["loss_mse"].avg,
                         top1=meters["top1"].avg)

        # per-epoch eval with score accumulation (model.py:531-577).  The
        # ragged final batch is padded to the fixed batch size (one XLA
        # compile total; padded rows masked out host-side).
        scores, labels = [], []
        top1_m = AverageMeter()
        from dmcnet_tpu.data.loader import pad_indices
        for start in range(0, len(val_ds), args.batch_size):
            idx, n_valid = pad_indices(
                start, min(start + args.batch_size, len(val_ds)),
                args.batch_size)
            if multi_host:
                # this process assembles only its rows of the padded batch
                local_idx = [idx[j] for j in local_rows]
                b = i3d_augment_batch(val_asm.batch(local_idx), **aug)
                b = global_batch_from_local(jax.tree.map(np.asarray, b),
                                            mesh)
            else:
                b = i3d_augment_batch(val_asm.batch(idx), **aug)
                b = shard_batch(b, mesh)
            m = eval_step(state, b)
            sc = np.asarray(
                jax.nn.softmax(m["logits"], axis=-1))[:n_valid]
            lab = np.asarray(m["label"])[:n_valid]
            scores.append(sc)
            labels.append(lab)
            top1_m.update(
                100.0 * float((sc.argmax(-1) == lab).mean()), n_valid)
        top1 = top1_m.avg
        print(f"Epoch[{epoch}] eval top-1: {top1:.3f} "
              f"({time.time() - t_epoch:.1f}s)")
        mlog.log("eval", epoch=epoch, top1=top1,
                 epoch_s=round(time.time() - t_epoch, 1))
        if top1 > best_top1:
            best_top1 = top1
            # multi-host: scores are replicated; write once (process 0)
            if jax.process_index() == 0:
                np.savez(os.path.join(args.score_dir, "score_best.npz"),
                         scores=np.concatenate(scores),
                         labels=np.concatenate(labels), top1=top1)
        if epoch == 0 or (epoch + 1) % max(int(args.save_frequency), 1) == 0:
            # checkpoint ep-N = "state ready to train epoch N": saved at the
            # end of epoch N-1, so --resume-epoch N continues exactly where
            # the save left off (reference epoch_end_callback saves
            # epoch=i_epoch+1, train/model.py:253-260)
            ckpt = ckpt_path(epoch + 1)
            meta = {"epoch": epoch + 1, "top1": top1}
            if args.ckpt_backend.startswith("orbax"):
                from dmcnet_tpu.train.checkpoints import save_checkpoint_orbax
                save_checkpoint_orbax(state, meta, ckpt + ".orbax",
                                      wait=args.ckpt_backend != "orbax-async")
            else:
                save_checkpoint(state, meta, ckpt)
    mlog.close()
    if args.ckpt_backend == "orbax-async":
        # drain in-flight background writes before the process exits
        from dmcnet_tpu.train.checkpoints import wait_for_checkpoints
        wait_for_checkpoints()
    return best_top1


if __name__ == "__main__":
    main(sys.argv[1:])
