"""IDEE-TPU: a TPU-native framework for identifying spatio-temporal drivers of
extreme events.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of HakamShams/IDEE
(NeurIPS 2024): multi-variable video backbones (Swin-3D, Mamba, 3D-CNN), a
binary vector-quantization anomaly bottleneck, extreme-event classifiers, and
the MIL / One-Class / Reconstruction baseline families -- designed TPU-first:

* per-variable towers are a single ``vmap`` over stacked parameters
  (reference loops over variables in Python: models/encoder/Swin_3D.py:626),
* data parallelism is a ``jax.sharding.Mesh`` + GSPMD sharding instead of
  ``torch.nn.DataParallel`` (reference train_synthetic.py:134),
* metrics accumulate on-device and sync per epoch instead of per step
  (reference train_synthetic.py:209-215),
* hot kernels (fused window attention, selective scan) are Pallas.
"""

__version__ = "0.1.0"

from idee_tpu.config import Config  # noqa: F401
