"""Pallas TPU kernels for the hot ops.

The reference's only native-code dependencies are CUDA kernels arriving via
pip (mamba-ssm selective-scan, cuDNN/cuBLAS through torch -- SURVEY.md 2.9).
Here the TPU equivalents are Pallas kernels with XLA fallbacks:

* selective_scan.linear_scan -- fused first-order linear recurrence (the
  mamba-ssm selective-scan core, reference models/encoder/Mamba.py:23,159);
* window_attention -- fused windowed attention (softmax(QK^T + bias + mask)V
  with multiple tiny windows packed into one MXU tile, reference
  models/encoder/Swin_3D.py:145-178).

Every kernel dispatches to a pure-XLA fallback off-TPU (CPU tests, debug).
"""

from idee_tpu.kernels.selective_scan import linear_scan  # noqa: F401
