# ------------------------------------------------------------------
"""Logging / seeding / timing utilities
(reference: utils/utils_train.py:29-66)."""
# ------------------------------------------------------------------

import logging
import os
import random
import time
from typing import Optional

import numpy as np


def get_logger(config) -> logging.Logger:
    """File+stdout logger under log/<name>/log_file.txt
    (reference: utils/utils_train.py:45-66)."""
    dir_log = os.path.join(config.dir_log, config.name)
    os.makedirs(dir_log, exist_ok=True)
    if getattr(config, "phase", "train") == "train":
        os.makedirs(os.path.join(dir_log, "model_checkpoints"), exist_ok=True)

    logger = logging.getLogger("Trainer")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # log_string already mirrors to stdout
    logger.handlers = []
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(os.path.join(dir_log, "log_file.txt"))
    fh.setLevel(logging.INFO)
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


def log_string(logger: Optional[logging.Logger], s: str):
    if logger is not None:
        logger.info(s)
    print(s)


def fix_seed(seed: int):
    """Seed host RNGs (device RNG is explicit PRNG keys in JAX)."""
    random.seed(seed)
    np.random.seed(seed)


class SummaryWriter:
    """TensorBoard writer (reference: train_synthetic.py:37,310-319 uses
    torch.utils.tensorboard). Wraps torch's writer when available and
    degrades to a no-op otherwise, so training never depends on it."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._w = TBWriter(log_dir=log_dir)
        except Exception:  # tensorboard optional
            pass

    def add_scalars(self, tag: str, scalars: dict, step: int):
        if self._w is not None:
            self._w.add_scalars(tag, scalars, step)

    def add_images(self, tag: str, images, step: int,
                   dataformats: str = "HWC"):
        if self._w is not None:
            self._w.add_images(tag, images, step, dataformats=dataformats)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()


class StepTimer:
    """Steps/sec tracker -- the BASELINE.json north-star metric."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self._t0 = None

    def tick(self):
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self.count <= self.warmup:
            return float("nan")
        return (self.count - self.warmup) / (time.perf_counter() - self._t0)
