# ------------------------------------------------------------------
"""Random-projection quantizer (BEST-RQ, https://arxiv.org/abs/2202.01855).

Parity target: reference models/codebook/Random_VQ.py -- frozen Xavier random
projections followed by a frozen (never-updated) VQ codebook
(reference: Random_VQ.py:36-56). Both the projections and the codebook live
in the non-trainable "codebook" variable collection, so the optimizer (and
weight decay) never touches them -- the functional analogue of torch
register_buffer + freeze_codebook=True.

The cross-entropy-on-target-indices path (Random_VQ.py:63-73) is unused by
any reference driver and is not carried over.
"""
# ------------------------------------------------------------------

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from idee_tpu.quant.lfq import LFQReturn
from idee_tpu.quant.vq import VQ


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_normal_ on [H, in, out]: std = sqrt(2/(in+out))."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class Random_VQ(nn.Module):
    """forward: x [B, N, dim] -> (z_q, indices, loss=0)."""

    dim: int = 16
    codebook_size: int = 2
    codebook_dim: int = 16
    num_codebooks: int = 1
    norm: bool = False
    sync_axis: Optional[str] = None

    def setup(self):
        self.rand_projs = self.variable(
            "codebook", "rand_projs",
            lambda: xavier_normal(
                self.make_rng("params"),
                (self.num_codebooks, self.dim, self.codebook_dim)))
        self.vq = VQ(
            dim=self.codebook_dim * self.num_codebooks,
            heads=self.num_codebooks,
            codebook_dim=self.codebook_dim,
            codebook_size=self.codebook_size,
            use_cosine_sim=False,
            learnable_codebook=False,
            separate_codebook_per_head=False,
            freeze_codebook=True,
            sync_axis=self.sync_axis,
        )

    def indices_to_codes(self, indices, project_out: bool = True):
        return self.vq.indices_to_codes(indices, project_out=project_out)

    def __call__(self, x, *, train: bool = False) -> LFQReturn:
        x = x.astype(jnp.float32)
        if self.norm:
            x = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        projs = jax.lax.stop_gradient(self.rand_projs.value)
        # [B,N,D] x [H,D,E] -> [B,N,H*E] (reference: Random_VQ.py:67-68)
        z = jnp.einsum("bnd,hde->bnhe", x, projs)
        z = z.reshape(x.shape[0], x.shape[1], -1)
        out, indices, _ = self.vq(z, train=train)
        # frozen codebook: no gradient, no aux loss
        return LFQReturn(jax.lax.stop_gradient(out), indices, jnp.float32(0.0))
