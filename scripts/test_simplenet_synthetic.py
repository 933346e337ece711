#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: test the SimpleNet one-class baseline on the Synthetic dataset
(reference: Baselines_OneClass/test_simplenet_synthetic.py).

Usage: python scripts/test_simplenet_synthetic.py --name exp --root_synthetic <dir>
Field names match the reference baseline config flags 1:1.
"""
# ------------------------------------------------------------------

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.baselines.config import oneclass_config  # noqa: E402
from idee_tpu.baselines.oneclass.driver import test_simplenet_synthetic  # noqa: E402


def main():
    cfg = config_file.read_arguments(train=False, defaults=oneclass_config())
    test_simplenet_synthetic(cfg)


if __name__ == "__main__":
    main()
