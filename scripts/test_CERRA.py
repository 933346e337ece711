#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: test on the CERRA dataset (reference: test_CERRA.py)."""
# ------------------------------------------------------------------

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.config import Config  # noqa: E402
from idee_tpu.train.driver_real import test_real  # noqa: E402


def main():
    defaults = Config(in_channels=2)
    cfg = config_file.read_arguments(train=False, defaults=defaults)
    test_real(cfg, "CERRA")


if __name__ == "__main__":
    main()
