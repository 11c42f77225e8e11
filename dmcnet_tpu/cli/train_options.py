"""Training options — flag-compatible with the reference CLIs.

Mirrors /root/reference/code/dmcnet/train_options.py:12-91 (base) and the
dmcnet_GAN additions (train_options.py:37-38,74-77,88) so the reference
exp_my/*/run.sh scripts drive this implementation unchanged.
"""

import argparse


def build_parser(gan=False):
    parser = argparse.ArgumentParser(description="CoViAR")

    # Data.
    parser.add_argument('--data-name', type=str,
                        choices=['ucf101', 'hmdb51', 'kinetics400'],
                        help='dataset name.')
    parser.add_argument('--data-root', type=str,
                        help='root of data directory.')
    parser.add_argument('--flow-root', type=str,
                        help='directory of pre-extracted optical flow images.')
    parser.add_argument('--data-flow', type=str, default='tvl1',
                        help='flow folder flavour (tvl1 | PWC*).')
    parser.add_argument('--train-list', type=str,
                        help='training example list.')
    parser.add_argument('--test-list', type=str,
                        help='testing example list.')
    parser.add_argument('--gop', type=int, default=12, help='size of GOP.')

    # Model.
    parser.add_argument('--representation', type=str,
                        choices=['iframe', 'mv', 'residual', 'flow'],
                        help='data representation.')
    parser.add_argument('--arch', type=str, default="resnet152",
                        help='base architecture.')
    parser.add_argument('--arch_estimator', type=str, default="ContextNetwork",
                        help='estimator architecture.')
    if gan:
        parser.add_argument('--arch_d', type=str, default="Discriminator",
                            help='discriminator architecture.')
    parser.add_argument('--num_segments', type=int, default=3,
                        help='number of TSN segments.')
    parser.add_argument('--no-accumulation', action='store_true',
                        help='disable accumulation of motion vectors.')
    parser.add_argument('--new_length', type=int, default=1,
                        help='number of MV/OF stacked together.')
    parser.add_argument('--flow_ds_factor', type=int, default=0,
                        help='flow downsample factor.')
    parser.add_argument('--gen_flow_ds_factor', type=int, default=0,
                        help='downsample factor for generated flow.')
    parser.add_argument('--upsample_interp', type=bool, default=False,
                        help='upsample via interpolation or not.')
    parser.add_argument('--use_databn', type=int, default=1,
                        help='add data batchnorm (kept for flag parity).')
    parser.add_argument('--gen_flow_or_delta', type=int, default=0,
                        help='0: generate flow; 1: generate flow delta.')
    parser.add_argument('--att', type=int, default=0,
                        help='0: no attention; 1: pixel-level attention.')
    parser.add_argument('--mv_minmaxnorm', type=int, default=1 if gan else 0,
                        help='min-max normalize mv values.')

    # Training.
    parser.add_argument('--weights', default=None, type=str)
    parser.add_argument('--resume', default=None, type=str)
    parser.add_argument('--epochs', default=500, type=int,
                        help='number of training epochs.')
    parser.add_argument('--epoch-thre', default=500, type=int,
                        help='freeze-phase threshold epoch.')
    parser.add_argument('--batch-size', default=40, type=int,
                        help='batch size.')
    parser.add_argument('--lr', default=0.001, type=float,
                        help='base learning rate.')
    parser.add_argument('--lr-cls', default=1, type=float,
                        help='cls loss weight.')
    parser.add_argument('--loss-mse', default='MSELoss', type=str)
    parser.add_argument('--lr-mse', default=0.1, type=float,
                        help='mse loss weight.')
    if gan:
        parser.add_argument('--lr-adv-g', default=1, type=float,
                            help='adversarial G loss weight.')
        parser.add_argument('--lr-adv-d', default=1, type=float,
                            help='adversarial D loss weight.')
        parser.add_argument('--lr_d_mult', default=0.01, type=float,
                            help='discriminator lr multiplier.')
    parser.add_argument('--lr_cls_mult', default=0.01, type=float,
                        help='cls learning multiplier.')
    parser.add_argument('--lr_mse_mult', default=0.01, type=float,
                        help='mse learning multiplier.')
    parser.add_argument('--lr-steps', default=[200, 300, 400], type=float,
                        nargs="+", help='epochs to decay learning rate.')
    parser.add_argument('--lr-decay', default=0.1, type=float,
                        help='lr decay factor.')
    parser.add_argument('--weight-decay', '--wd', default=1e-4, type=float,
                        help='weight decay.')

    # Log.
    parser.add_argument('--eval-freq', default=5, type=int,
                        help='evaluation frequency (epochs).')
    parser.add_argument('--workers', default=8, type=int,
                        help='number of data loader workers.')
    parser.add_argument('--model-prefix', type=str, default="model",
                        help="prefix of model name.")
    parser.add_argument('--gpus', nargs='+', type=int, default=None,
                        help='device ids (accepted for script parity; the '
                             'mesh uses all visible devices).')
    # Multi-host (replaces the reference's vestigial DDP path,
    # dmcnet_I3D/train_model.py:117-118): when set, each process feeds its
    # local shard of the global --batch-size.
    parser.add_argument('--dist-coordinator', type=str, default=None,
                        help='jax.distributed coordinator address '
                             '(host:port); unset = single-process.')
    parser.add_argument('--dist-num-processes', type=int, default=None)
    parser.add_argument('--dist-process-id', type=int, default=None)
    parser.add_argument('--metrics-jsonl', type=str, default=None,
                        help='append one JSON object per train/eval log '
                             'event (machine-readable twin of the stdout '
                             'lines; process 0 only).')
    parser.add_argument('--auto-resume', type=int, default=0,
                        help='preemption-safe restart: resume from this '
                             "run's own checkpoint if it exists (no-op on "
                             'a fresh run; --resume takes precedence).')
    parser.add_argument('--ckpt-backend', type=str, default='msgpack',
                        choices=['msgpack', 'orbax', 'orbax-async'],
                        help='msgpack keeps the reference .pth.tar naming; '
                             'orbax is sharding-aware for multi-host runs; '
                             'orbax-async overlaps the disk write with '
                             'training (drained at epoch end / exit).')
    parser.add_argument('--bf16', type=int, default=0,
                        help='mixed-precision training: convs compute in '
                             'bfloat16 on the MXU, params/BN stats/losses '
                             'stay float32 (TPU-native; the reference is '
                             'f32-only).')
    parser.add_argument('--packed-gen', type=int, default=0,
                        help='space-to-depth factor (e.g. 2) for the dense '
                             'DMC estimators: EXACT packed reparameterization '
                             'that lifts MXU lane utilization of the tiny-'
                             'channel generator convs; checkpoints stay '
                             'interchangeable with the unpacked layout. '
                             '0 = faithful layout.  Measured: helps I3D '
                             'training (s=4 best) and serving; neutral-to-'
                             'slower for the ResNet-18 TSN train step, '
                             'whose cost XLA already fuses well — leave 0 '
                             'there.')
    parser.add_argument('--fsdp', type=int, default=0,
                        help='shard params + optimizer moments over the '
                             'data mesh axis (ZeRO-3; parallel/fsdp.py) '
                             'instead of replicating them — per-chip state '
                             'HBM drops by ~the device count. No reference '
                             'analogue (DataParallel replicates, '
                             'train.py:117). Requires >1 device.')
    parser.add_argument('--tp', type=int, default=0,
                        help='tensor (model) parallelism degree: a 2-D '
                             '(data, model) mesh with every conv/dense '
                             'kernel column-sharded over the model axis '
                             '(parallel/tensor.py); combines with --fsdp '
                             '(ZeRO-3 over the data axis within each model '
                             'shard). No reference analogue. 0/1 = off.')
    parser.add_argument('--profile-dir', type=str, default=None,
                        help='capture an XLA trace of training steps 2-7 '
                             'of the first epoch (TensorBoard/xprof).')
    parser.add_argument('--gop-cache-mb', type=int, default=128,
                        help='host GOP-decode LRU cache budget in MB '
                             '(per dataset); size to the host, not the '
                             'chip — larger caches cut repeat decodes on '
                             'big datasets.')
    parser.add_argument('--reader-cache', type=int, default=32,
                        help='max simultaneously open video readers '
                             '(LRU).')
    parser.add_argument('--save-reference-ckpt', type=int, default=0,
                        help='additionally write each saved checkpoint as a '
                             'reference-loadable torch .pth.tar '
                             '({epoch, arch, state_dict, best_prec1}, '
                             'torch key names/layouts; reference '
                             'train.py:372-377) so the reference stack can '
                             'load models trained here.')
    return parser


def num_classes_for(data_name):
    table = {"ucf101": 101, "hmdb51": 51, "kinetics400": 400}
    if data_name not in table:
        raise ValueError("Unknown dataset " + str(data_name))
    return table[data_name]
