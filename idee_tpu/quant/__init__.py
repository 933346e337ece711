"""Quantization bottlenecks (codebooks).

The codebook index per (variable, time, pixel) IS the anomaly/driver mask:
with codebook_size=2 the LFQ index in {0,1} is the anomaly bit
(reference: models/codebook/LFQ.py:98-100,234).

All quantizers compute in float32 regardless of the backbone compute dtype
(the reference forces fp32 via @autocast(enabled=False),
models/codebook/LFQ.py:183).
"""

from idee_tpu.quant.lfq import LFQ  # noqa: F401

QUANTIZERS = {"LFQ": LFQ}


def get_quantizer(name: str):
    """String-keyed registry mirroring the reference's reflection-based
    module selection (reference: models/build.py:17-20)."""
    if name not in QUANTIZERS:
        for mod in ("fsq", "latent_quantize", "vq", "random_vq"):
            try:
                __import__(f"idee_tpu.quant.{mod}")
            except ImportError:
                pass
    if name not in QUANTIZERS:
        raise NotImplementedError(
            f"codebook {name!r} not implemented; available: {sorted(QUANTIZERS)}"
        )
    return QUANTIZERS[name]
