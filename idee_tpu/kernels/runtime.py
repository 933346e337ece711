# ------------------------------------------------------------------
"""Kernel dispatch control.

Pallas kernels compile only for TPU; every kernel in this package
dispatches through use_pallas(), which is True when the default backend is
TPU and Pallas has not been explicitly disabled. Programs that place
computation on non-default devices (e.g. the multichip dry-run, which
builds a CPU mesh while a TPU is the default backend) must disable Pallas
for that program -- placement is invisible at trace time.
"""
# ------------------------------------------------------------------

from contextlib import contextmanager

import jax

_FORCE_XLA = False


def use_pallas() -> bool:
    return not _FORCE_XLA and jax.default_backend() == "tpu"


def set_force_xla(value: bool) -> None:
    global _FORCE_XLA
    _FORCE_XLA = bool(value)


@contextmanager
def force_xla():
    """Temporarily route all kernels to their XLA fallbacks."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev
