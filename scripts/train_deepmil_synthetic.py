#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: train the DEEPMIL MIL baseline on the Synthetic dataset
(reference: Baselines_MIL/train_deepmil_synthetic.py).

Usage: python scripts/train_deepmil_synthetic.py --name exp --root_synthetic <dir>
Field names match the reference baseline config flags 1:1.
"""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.baselines.config import mil_config  # noqa: E402
from idee_tpu.baselines.mil.driver import train_mil_synthetic  # noqa: E402


def main():
    cfg = config_file.read_arguments(train=True, defaults=mil_config())
    train_mil_synthetic(cfg, "deepmil")


if __name__ == "__main__":
    main()
