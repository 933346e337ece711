#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: evaluate on the Synthetic test split (reference: test_synthetic.py)."""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.config import SYNTHETIC_VARIABLES, Config  # noqa: E402
from idee_tpu.train.evaluate import test_synthetic  # noqa: E402


def main():
    defaults = Config(variables=list(SYNTHETIC_VARIABLES), in_channels=1,
                      encoder="CNN_3D")
    cfg = config_file.read_arguments(train=False, defaults=defaults)
    test_synthetic(cfg)


if __name__ == "__main__":
    main()
