"""Composite models + string-keyed registries.

The reference selects encoder/classifier/codebook classes by reflection on
config strings (reference: models/build.py:17-20); here the same mechanism
is an explicit registry.
"""

from idee_tpu.models.vq_model import VQModel, VQOutput, build_model  # noqa: F401
