"""Video-level testing driver — reference code/dmcnet/test.py.

25-segment x {1,10}-crop evaluation with per-video score averaging and a
bit-compatible `.npz` score dump: `scores` is an object array of
(score (1, C) float array, label) pairs REORDERED by sorted video name
(reference test.py:183-198), plus `labels` and `names`, so the reference
combine.py / run_combine.sh consume it unchanged.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.cli.train_options import num_classes_for
from dmcnet_tpu.data.dmc_dataset import (
    BatchAssembler,
    CoviarDataset,
    augment_eval_batch,
)
from dmcnet_tpu.models import DMCNet, segment_consensus
from dmcnet_tpu.train.checkpoints import load_checkpoint
from dmcnet_tpu.train.engine import create_train_state


def build_parser():
    parser = argparse.ArgumentParser(
        description="Standard video-level testing")
    parser.add_argument('--data-name', type=str,
                        choices=['ucf101', 'hmdb51', 'kinetics400'])
    parser.add_argument('--representation', type=str,
                        choices=['iframe', 'residual', 'mv', 'flow'])
    parser.add_argument('--no-accumulation', action='store_true')
    parser.add_argument('--new_length', type=int, default=1)
    parser.add_argument('--use_databn', type=int, default=1)
    parser.add_argument('--flow_ds_factor', type=int, default=0)
    parser.add_argument('--upsample_interp', type=bool, default=False)
    parser.add_argument('--data-root', type=str)
    parser.add_argument('--flow-root', type=str)
    parser.add_argument('--data-flow', type=str, default='tvl1')
    parser.add_argument('--test-list', type=str)
    parser.add_argument('--weights', type=str)
    parser.add_argument('--batch-size', default=1, type=int)
    parser.add_argument('--arch', type=str)
    parser.add_argument('--arch_estimator', type=str, default="ContextNetwork")
    parser.add_argument('--arch_d', type=str, default=None)
    parser.add_argument('--save-scores', type=str, default=None)
    parser.add_argument('--test_segments', type=int, default=25)
    parser.add_argument('--test-crops', type=int, default=10)
    parser.add_argument('--input_size', type=int, default=224)
    parser.add_argument('-j', '--workers', default=1, type=int)
    parser.add_argument('--gpus', nargs='+', type=int, default=None)
    parser.add_argument('--gop', type=int, default=12)
    parser.add_argument('--viz', type=int, default=0,
                        help='dump a Middlebury color image of the '
                             'generated DMC per video (reference threads '
                             'viz into the dataset, test.py:55,117); '
                             'int, not type=bool: bool("0") is True')
    parser.add_argument('--viz-dir', type=str, default='./viz')
    parser.add_argument('--gen_flow_or_delta', type=int, default=0)
    parser.add_argument('--gen_flow_ds_factor', type=int, default=0)
    parser.add_argument('--att', type=int, default=0)
    parser.add_argument('--mv_minmaxnorm', type=int, default=0)
    parser.add_argument('--pp', type=int, default=0,
                        help='pipeline-parallel stages for the ResNet-18 '
                             'backbone (2 or 4): the scoring forward runs '
                             'stage-pipelined over the first N devices, '
                             'params stage-sharded (parallel/pp_resnet.py)')
    parser.add_argument('--packed-gen', type=int, default=0,
                        help='space-to-depth factor for the dense DMC '
                             'estimators (exact reparameterization; same '
                             'checkpoints as the unpacked layout)')
    parser.add_argument('--plain', type=int, default=0,
                        help='plain CoViAR scoring: the backbone '
                             'classifies the modality input directly (no '
                             'DMC generator) — loads CoViAR-trained TSN '
                             '.pth.tar checkpoints (3-channel iframe / '
                             '2-channel mv / 3-channel residual conv1), '
                             'which the reference test.py cannot '
                             '(models/tsn.py PlainTSN)')
    return parser


def save_scores_npz(path, outputs, labels, name_list):
    """Bit-compatible with reference test.py:183-198: reorder everything by
    sorted(video name) and savez object arrays."""
    order_dict = {e: i for i, e in enumerate(sorted(name_list))}
    n = len(outputs)
    reorder_output = [None] * n
    reorder_label = [None] * n
    reorder_name = [None] * n
    for i in range(n):
        idx = order_dict[name_list[i]]
        reorder_output[idx] = outputs[i]
        reorder_label[idx] = labels[i]
        reorder_name[idx] = name_list[i]
    scores = np.empty(n, dtype=object)
    scores[:] = reorder_output
    np.savez(path, scores=scores, labels=reorder_label, names=reorder_name)


def main(argv=None):
    args = build_parser().parse_args(argv)
    num_class = num_classes_for(args.data_name)

    if args.plain:
        from dmcnet_tpu.models import PlainTSN
        if args.arch_d or args.att or args.viz:
            raise SystemExit("--plain scores the bare TSN backbone (no "
                             "generator / discriminator / --viz)")
        net = PlainTSN(num_class=num_class, arch=args.arch)
    else:
        net = DMCNet(
            num_class=num_class, num_segments=args.test_segments,
            representation=args.representation, arch=args.arch,
            new_length=args.new_length,
            gen_flow_or_delta=args.gen_flow_or_delta,
            gen_flow_ds_factor=args.gen_flow_ds_factor,
            arch_estimator=args.arch_estimator, arch_d=args.arch_d,
            att=args.att, detach_classifier=args.arch_d is None,
            packed_gen=args.packed_gen)

    ds = CoviarDataset(
        data_root=args.data_root, flow_root=args.flow_root,
        video_list=args.test_list, representation=args.representation,
        num_segments=args.test_segments, is_train=False,
        accumulate=(not args.no_accumulation), gop=args.gop,
        flow_ds_factor=args.flow_ds_factor,
        upsample_interp=args.upsample_interp,
        mv_minmaxnorm=args.mv_minmaxnorm, flow_folder=args.data_flow)
    asm = BatchAssembler(ds, input_size=args.input_size,
                         scale_size=args.input_size * 256 // 224,
                         test_crops=args.test_crops)

    sample = augment_eval_batch(asm.eval_batch([0]),
                                representation=args.representation,
                                flow_ds_factor=args.flow_ds_factor,
                                upsample_interp=args.upsample_interp,
                                input_size=args.input_size)
    # normalize_group slot carrying the modality: iframe rides in 'mv'
    # (the reference reuses the variable, dataset.py:204-211)
    plain_key = "residual" if args.representation == "residual" else "mv"
    if args.plain:
        from dmcnet_tpu.train.engine import TrainState
        variables = net.init(jax.random.key(0), sample[plain_key],
                             train=False)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_cls=None, opt_gf=None)
    else:
        state, _ = create_train_state(
            net, jax.random.key(0), sample, lr_cls_mult=0.01,
            lr_mse_mult=0.01, lr_d_mult=0.01 if args.arch_d else None)
    if args.weights:
        import os
        if os.path.isdir(args.weights):
            # orbax directory (--ckpt-backend orbax[-async] training runs);
            # params-only: the template's optimizer slots need not match
            # the training run's (e.g. a GAN checkpoint carries opt_d)
            from dmcnet_tpu.train.checkpoints import (
                load_checkpoint_params_orbax,
            )
            state, meta = load_checkpoint_params_orbax(state, args.weights)
            print(f"model epoch {meta.get('epoch')} best prec@1: "
                  f"{meta.get('best_prec1')}")
        else:
            try:  # framework-native checkpoint first …
                state, meta = load_checkpoint(state, args.weights)
                print(f"model epoch {meta.get('epoch')} best prec@1: "
                      f"{meta.get('best_prec1')}")
            except Exception:  # … else a reference torch .pth.tar
                from dmcnet_tpu.train.checkpoints import (
                    load_reference_weights,
                )
                params, batch_stats, skipped, _ = load_reference_weights(
                    state, None, args.weights)
                state = state.replace(params=params,
                                      batch_stats=batch_stats)
                print(f"loaded reference torch weights {args.weights} "
                      f"(skipped {len(skipped)})")

    total_seg = args.test_segments * args.test_crops

    if args.pp and args.pp > 1:
        # Pipeline-parallel backbone: generator runs replicated (tiny),
        # the ResNet-18 stages stream the total_seg-clip eval batch
        # through a GPipe schedule with stage-sharded weights.
        from dmcnet_tpu.parallel import (
            make_pp_resnet18_apply,
            make_stage_mesh,
        )
        if args.arch != "resnet18":
            raise SystemExit("--pp currently supports --arch resnet18")
        if args.viz or args.arch_d or args.att:
            raise SystemExit("--pp composes with the plain scoring path "
                             "only (no --viz / --arch_d / --att)")
        mesh_pp = make_stage_mesh(jax.devices()[:args.pp])
        pp_classify = make_pp_resnet18_apply(
            {"params": state.params["base_model"],
             "batch_stats": state.batch_stats["base_model"]},
            num_class, mesh_pp, n_microbatches=args.pp)

        if args.plain:
            # no generator: the pipeline's input IS the modality clip
            def gen_flow_fn(batch):
                x = batch[plain_key]
                return x.reshape((-1,) + x.shape[-3:])
        else:
            @jax.jit
            def gen_flow_fn(batch):
                return net.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    batch["mv"], batch["residual"], False,
                    method="generate")

        def forward_video(batch):
            gen = gen_flow_fn(batch)
            n = gen.shape[0]
            pad = (-n) % args.pp
            if pad:  # microbatch count must divide the clip batch; wrap
                # indices so even n < pad (tiny --test_segments) pads fully
                gen = jnp.take(gen, jnp.arange(n + pad) % n, axis=0)
            logits = pp_classify(gen)[:n]
            return segment_consensus(logits, total_seg), None, None
    elif args.plain:
        @jax.jit
        def forward_video(batch):
            logits = net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch[plain_key], train=False)
            return segment_consensus(logits, total_seg), None, None
    else:
        @jax.jit
        def forward_video(batch):
            outs = net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["mv"], batch["residual"], train=False)
            consensus = segment_consensus(outs[0], total_seg)
            validity = outs[2] if args.arch_d else None
            # first crop's generated DMC only (visualization; keeps the
            # D2H transfer to one (H, W, 2) map per video)
            gen0 = outs[1][0] if args.viz else None
            return consensus, validity, gen0

    if args.viz:
        import os

        from dmcnet_tpu.utils.viz import viz_flow
        os.makedirs(args.viz_dir, exist_ok=True)

    def dump_viz(gen0, index):
        """PNG of the generated DMC (reference renders flow visualizations
        when --viz is set, test.py:117 + utils.viz_flow)."""
        from PIL import Image

        g = np.asarray(gen0)
        img = (viz_flow(g[..., 0], g[..., 1]) * 255).astype(np.uint8)
        import os
        name = os.path.splitext(os.path.basename(ds.items[index].path))[0]
        Image.fromarray(img).save(
            f"{args.viz_dir}/{index:05d}_{name}_gen_flow.png")

    output, video_labels = [], []
    g_adv_correct, g_adv_total = 0, 0
    proc_start_time = time.time()
    for i in range(len(ds)):
        batch = augment_eval_batch(
            asm.eval_batch([i]), representation=args.representation,
            flow_ds_factor=args.flow_ds_factor,
            upsample_interp=args.upsample_interp,
            input_size=args.input_size)
        scores, validity, gen0 = forward_video(batch)
        scores = np.asarray(scores)  # (1, C)
        if gen0 is not None:
            dump_viz(gen0, i)
        if validity is not None:
            # adversarial "G accuracy": fraction of generated cues the
            # discriminator rates real (reference GAN test.py:158,184-192)
            v = np.asarray(validity)
            g_adv_correct += int((v.argmax(-1) == 1).sum())
            g_adv_total += len(v)
        label = int(batch["label"][0])
        output.append((scores, label))
        video_labels.append(label)
        if (i + 1) % 100 == 0:
            cnt_time = time.time() - proc_start_time
            print(f"video {i} done, total {i + 1}/{len(ds)}, "
                  f"average {cnt_time / (i + 1)} sec/video")

    video_pred = [np.argmax(x[0]) for x in output]
    acc = float(np.mean(np.asarray(video_pred) == np.asarray(video_labels)))
    print(f"Accuracy {acc * 100:.02f}% ({len(video_pred)})")
    if g_adv_total:
        print(f"G adversarial accuracy "
              f"{100.0 * g_adv_correct / g_adv_total:.02f}%")

    if args.save_scores is not None:
        name_list = [x.strip().split()[0] for x in open(args.test_list)]
        save_scores_npz(args.save_scores, output, video_labels, name_list)
    return acc


if __name__ == "__main__":
    main(sys.argv[1:])
