#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: train on the Synthetic dataset (reference: train_synthetic.py).

Usage: python scripts/train_synthetic.py --name exp --root_synthetic <dir>
Field names match the reference config flags 1:1.
"""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.config import SYNTHETIC_VARIABLES, Config  # noqa: E402
from idee_tpu.train.driver import train_synthetic  # noqa: E402


def main():
    defaults = Config(variables=list(SYNTHETIC_VARIABLES), in_channels=1,
                      encoder="CNN_3D")
    cfg = config_file.read_arguments(train=True, defaults=defaults)
    train_synthetic(cfg)


if __name__ == "__main__":
    main()
