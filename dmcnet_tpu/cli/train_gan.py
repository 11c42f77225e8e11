"""GAN training driver (reference code/dmcnet_GAN/train.py)."""

import sys

from dmcnet_tpu.cli.train import main as _train_main


def main(argv=None, **kwargs):
    kwargs.setdefault("gan", True)
    return _train_main(argv, **kwargs)


if __name__ == "__main__":
    main(sys.argv[1:])
