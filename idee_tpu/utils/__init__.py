"""Utilities: logging, seeding, profiling, visualization."""

from idee_tpu.utils.logging import fix_seed, get_logger, log_string  # noqa: F401
