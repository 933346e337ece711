#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: train the STEAL reconstruction baseline on the Synthetic dataset
(reference: Baselines_Reconstruction/train_steal_synthetic.py).

Usage: python scripts/train_steal_synthetic.py --name exp --root_synthetic <dir>
Field names match the reference baseline config flags 1:1.
"""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.baselines.config import recon_config  # noqa: E402
from idee_tpu.baselines.recon.driver import train_recon_synthetic  # noqa: E402


def main():
    cfg = config_file.read_arguments(train=True, defaults=recon_config())
    train_recon_synthetic(cfg, "steal")


if __name__ == "__main__":
    main()
