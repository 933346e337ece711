#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: train on the CERRA dataset (reference: train_CERRA.py)."""
# ------------------------------------------------------------------

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from idee_tpu import config as config_file  # noqa: E402
from idee_tpu.config import Config  # noqa: E402
from idee_tpu.train.driver_real import train_real  # noqa: E402


def main():
    defaults = Config(in_channels=2)
    cfg = config_file.read_arguments(train=True, defaults=defaults)
    hist = train_real(cfg, "CERRA")
    # persist the per-epoch trajectory next to the checkpoints so harvest
    # scripts can read best-F1 / steps-per-sec without parsing the log
    import json

    hist.pop("state", None)
    with open(os.path.join(cfg.log_dir, "history.json"), "w") as fh:
        json.dump(hist, fh, indent=1)


if __name__ == "__main__":
    main()
