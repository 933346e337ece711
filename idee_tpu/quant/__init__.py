"""Quantization bottlenecks (codebooks).

The codebook index per (variable, time, pixel) IS the anomaly/driver mask:
with codebook_size=2 the LFQ index in {0,1} is the anomaly bit
(reference: models/codebook/LFQ.py:98-100,234).

All quantizers share one interface -- forward(x [B,N,dim], train) ->
(quantized [B,N,dim], indices [B,N], aux_loss scalar) plus
indices_to_codes(indices) -- and compute in float32 regardless of the
backbone compute dtype (the reference forces fp32 via
@autocast(enabled=False), models/codebook/LFQ.py:183, FSQ.py:147, VQ.py:476).

Five variants, mirroring the reference zoo (models/codebook/):
LFQ (the default wired into the composite model, build.py:87-91), VQ
(learnable or EMA codebook with psum mesh sync), FSQ, LatentQuantize,
Random_VQ.
"""

from idee_tpu.quant.lfq import LFQ, LFQReturn  # noqa: F401


def get_quantizer(name: str):
    """String-keyed registry mirroring the reference's reflection-based
    module selection (reference: models/build.py:17-20)."""
    if name not in QUANTIZERS:
        raise NotImplementedError(
            f"codebook {name!r} not implemented; available: {sorted(QUANTIZERS)}"
        )
    return QUANTIZERS[name]


def _lazy(modname, clsname):
    def load():
        import importlib

        mod = importlib.import_module(f"idee_tpu.quant.{modname}")
        return getattr(mod, clsname)

    return load


class _Registry(dict):
    """dict that resolves lazy entries on access (keeps cold start fast)."""

    def __getitem__(self, key):
        val = dict.__getitem__(self, key)
        if callable(val) and not isinstance(val, type):
            val = val()
            dict.__setitem__(self, key, val)
        return val


QUANTIZERS = _Registry({
    "LFQ": LFQ,
    "VQ": _lazy("vq", "VQ"),
    "FSQ": _lazy("fsq", "FSQ"),
    "LatentQuantize": _lazy("latent_quantize", "LatentQuantize"),
    "Random_VQ": _lazy("random_vq", "Random_VQ"),
})
