"""GAN training driver (reference code/dmcnet_GAN/train.py)."""

import sys

from dmcnet_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:], gan=True)
