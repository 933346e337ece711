#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: test a trained MIL baseline on the Synthetic dataset (select via MIL_VARIANT env var)
(reference: Baselines_MIL/test_mil_synthetic.py).

Usage: python scripts/test_mil_synthetic.py --name exp --root_synthetic <dir>
Field names match the reference baseline config flags 1:1.
"""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.baselines.config import mil_config  # noqa: E402
from idee_tpu.baselines.mil.driver import test_mil_synthetic  # noqa: E402


def main():
    variant = os.environ.get("MIL_VARIANT", "deepmil")
    cfg = config_file.read_arguments(train=False, defaults=mil_config())
    test_mil_synthetic(cfg, variant)


if __name__ == "__main__":
    main()
