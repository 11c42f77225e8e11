"""Whole-video I3D evaluation driver.

Reference: code/dmcnet_I3D/test/evaluate_video_{hmdb,ucf101}_i3d.py:98-253 —
RandomSampling clips, `num_sample` rounds per video with per-video score
averaging, npz dump {scores (N, C), labels}, samples/sec report.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

from dmcnet_tpu.data.iterator_factory import (
    _items_from_list,
    dataset_num_classes,
)
from dmcnet_tpu.data.sampling import RandomSampling
from dmcnet_tpu.data.video_iter import (
    I3DBatchAssembler,
    VideoClipDataset,
    i3d_augment_batch,
)
from dmcnet_tpu.models.i3d import get_symbol, init_i3d_variables
from dmcnet_tpu.train.engine import TrainState
from dmcnet_tpu.train.engine_i3d import make_i3d_eval_step
from dmcnet_tpu.train.checkpoints import load_checkpoint_params
from dmcnet_tpu.train.metrics import topk_accuracy


def build_parser():
    p = argparse.ArgumentParser(description="I3D video-level evaluation")
    p.add_argument('--dataset', default='HMDB51',
                   choices=['UCF101', 'HMDB51'])
    p.add_argument('--split', type=int, default=1)
    p.add_argument('--clip-length', type=int, default=250)
    p.add_argument('--frame-interval', type=int, default=1)
    p.add_argument('--modality', type=str, default='flow+mp4')
    p.add_argument('--arch-estimator', type=str, default='DenseNetTiny')
    p.add_argument('--arch-d', type=str, default=None)
    p.add_argument('--accumulate', type=int, default=1)
    p.add_argument('--mv-minmaxnorm', type=int, default=0)
    p.add_argument('--ds_factor', type=int, default=16)
    p.add_argument('--num-sample', type=int, default=1,
                   help='sampling rounds per video')
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--load-weights', type=str, required=True)
    p.add_argument('--score-file', type=str, default=None)
    p.add_argument('--data-root', type=str, required=True)
    p.add_argument('--video-prefix', type=str, required=True)
    p.add_argument('--flow-prefix', type=str, default=None)
    p.add_argument('--input-size', type=int, default=224)
    p.add_argument('--shard-time', type=int, default=0,
                   help='shard the clip T axis over all devices (sequence '
                        'parallelism for long clips; XLA inserts the halo '
                        'exchanges — parallel/temporal.py)')
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    num_classes = dataset_num_classes(args.dataset)
    net, input_conf = get_symbol(
        "I3D", modality=args.modality, num_classes=num_classes,
        arch_estimator=args.arch_estimator, arch_d=args.arch_d)

    from dmcnet_tpu.codec.coviar_compat import get_num_frames
    lists = os.path.join(args.data_root, "raw", "list_cvt")
    test_list = os.path.join(
        lists, f"{args.dataset.lower()}_split{args.split}_test.txt")
    items = _items_from_list(test_list, args.video_prefix, args.flow_prefix,
                             get_num_frames)
    ds = VideoClipDataset(
        items, RandomSampling(num=args.clip_length,
                              interval=args.frame_interval, seed=0),
        modality=args.modality, accumulate=bool(args.accumulate),
        mv_minmaxnorm=bool(args.mv_minmaxnorm))
    asm = I3DBatchAssembler(ds, input_size=args.input_size, is_train=False)
    aug = dict(modality=args.modality, ds_factor=args.ds_factor,
               input_size=args.input_size, mean=input_conf["mean"][0],
               std=input_conf["std"][0])

    sample = i3d_augment_batch(asm.batch([0]), **aug)
    import jax.numpy as jnp
    x0 = jnp.concatenate([sample["mv"], sample["residual"]], axis=-1)
    variables = init_i3d_variables(net, jax.random.key(0), x0)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_cls=None, opt_gf=None)
    if os.path.isdir(args.load_weights):
        # orbax directory from --ckpt-backend orbax[-async] training
        from dmcnet_tpu.train.checkpoints import load_checkpoint_params_orbax
        state, meta = load_checkpoint_params_orbax(state, args.load_weights)
    else:
        state, meta = load_checkpoint_params(state, args.load_weights)
    if args.shard_time:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dmcnet_tpu.parallel import make_time_mesh
        from dmcnet_tpu.parallel.temporal import make_time_sharded_apply
        from dmcnet_tpu.train.engine import topk_correct

        # T must divide the mesh: use the largest device count that does
        # (e.g. the reference's 250-frame eval clips shard over 5 chips of
        # an 8-chip host)
        n_dev = len(jax.devices())
        while args.clip_length % n_dev:
            n_dev -= 1
        mesh = make_time_mesh(jax.devices()[:n_dev])
        print(f"sequence parallelism: clip T={args.clip_length} over "
              f"{n_dev} devices")
        apply_t = make_time_sharded_apply(
            lambda v, x: net.apply(v, x, "flow+logit", False, False), mesh)
        # replicate the parameters onto the mesh ONCE, not per batch
        placed_vars = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats},
            NamedSharding(mesh, P()))
        t_sharding = NamedSharding(mesh, P(None, "time"))

        def eval_step(state, batch):
            mv_res = jnp.concatenate([batch["mv"], batch["residual"]],
                                     axis=-1)
            mv_res = jax.device_put(np.asarray(mv_res), t_sharding)
            logits, _ = apply_t(placed_vars, mv_res)
            top1, top5 = topk_correct(logits, batch["label"], (1, 5))
            return {"logits": logits, "top1": top1, "top5": top5}
    else:
        eval_step = make_i3d_eval_step(net)

    # per-video averaged scores over num_sample rounds (reference :205-218)
    avg_scores = np.zeros((len(ds), num_classes), np.float64)
    labels = np.zeros((len(ds),), np.int64)
    t0 = time.time()
    done = 0
    from dmcnet_tpu.data.loader import pad_indices
    for round_i in range(args.num_sample):
        for start in range(0, len(ds), args.batch_size):
            # pad the ragged final batch to a fixed shape (single compile)
            padded, n_valid = pad_indices(
                start, min(start + args.batch_size, len(ds)),
                args.batch_size)
            idx = padded[:n_valid]
            b = i3d_augment_batch(asm.batch(padded), **aug)
            m = eval_step(state, b)
            avg_scores[idx] += np.asarray(m["logits"])[:n_valid]
            labels[idx] = np.asarray(b["label"])[:n_valid]
            done += n_valid
            if done % 100 == 0:
                print(f"{done} clips, {done / (time.time() - t0):.2f} "
                      f"samples/sec")
    avg_scores /= args.num_sample
    top1, top5 = topk_accuracy(avg_scores, labels, ks=(1, 5))
    print(f"Final top-1: {top1:.2f}%  top-5: {top5:.2f}% "
          f"({len(ds)} videos, "
          f"{len(ds) * args.num_sample / (time.time() - t0):.2f} "
          f"samples/sec)")
    if args.score_file:
        np.savez(args.score_file, scores=avg_scores, labels=labels,
                 top1=top1)
    return top1


if __name__ == "__main__":
    main(sys.argv[1:])
