"""UCF-101 I3D entry point (reference code/dmcnet_I3D/train_ucf101.py —
identical to the HMDB-51 driver except dataset/lr defaults)."""

import sys

from dmcnet_tpu.cli.train_i3d import main as _i3d_main


def main(argv=None, **kwargs):
    kwargs.setdefault("dataset_default", "UCF101")
    return _i3d_main(argv, **kwargs)


if __name__ == "__main__":
    main(sys.argv[1:])
