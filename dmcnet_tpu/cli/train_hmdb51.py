"""HMDB-51 I3D entry point (reference code/dmcnet_I3D/train_hmdb51.py)."""

import sys

from dmcnet_tpu.cli.train_i3d import main

if __name__ == "__main__":
    main(sys.argv[1:], dataset_default="HMDB51")
