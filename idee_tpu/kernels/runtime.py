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
_FORCE_PALLAS = False  # tests: exercise kernels off-TPU via interpret mode


def use_pallas() -> bool:
    if _FORCE_XLA:
        return False
    return _FORCE_PALLAS or jax.default_backend() == "tpu"


def set_force_pallas(value: bool) -> None:
    """Route kernels to their Pallas implementations even off-TPU (they run
    in interpret mode there) -- for correctness tests on CPU."""
    global _FORCE_PALLAS
    _FORCE_PALLAS = bool(value)


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
