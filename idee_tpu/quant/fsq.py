# ------------------------------------------------------------------
"""Finite Scalar Quantization (FSQ, https://arxiv.org/abs/2309.15505).

Parity target: reference models/codebook/FSQ.py (itself a torch port of the
paper's JAX appendix -- this implementation goes back to the native JAX
formulation). Each latent dim is bounded with tanh onto `levels[d]` bins and
rounded with a straight-through estimator; the mixed-radix digit vector is
the code index. No auxiliary loss term (reference returns (out, indices)
only, FSQ.py:148-204); the uniform 3-tuple here carries aux_loss = 0.

Numerics contract: fp32 island (reference forces fp32 via
@autocast(enabled=False), FSQ.py:147).
"""
# ------------------------------------------------------------------

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.quant.lfq import LFQReturn


def round_ste(z):
    """Round with straight-through gradients (reference: FSQ.py:44-47)."""
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQ(nn.Module):
    """Finite scalar quantizer.

    forward: x [B, N, dim] -> (quantized [B, N, dim], indices [B, N], 0.0)
    """

    levels: Sequence[int] = (2,)
    dim: Optional[int] = None
    num_codebooks: int = 1

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def effective_codebook_dim(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    @property
    def out_dim(self) -> int:
        return self.dim if self.dim is not None else self.effective_codebook_dim

    @property
    def has_projections(self) -> bool:
        return self.out_dim != self.effective_codebook_dim

    def setup(self):
        from idee_tpu.nn.layers import reference_init

        self._levels = jnp.asarray(np.asarray(self.levels, np.int32))
        # mixed-radix basis: cumprod([1] + levels[:-1]) (reference: FSQ.py:66)
        self._basis = jnp.asarray(
            np.concatenate([[1], np.cumprod(self.levels)[:-1]]).astype(np.int32)
        )
        if self.has_projections:
            self.project_in = nn.Dense(self.effective_codebook_dim,
                                       dtype=jnp.float32,
                                       kernel_init=reference_init())
            self.project_out = nn.Dense(self.out_dim, dtype=jnp.float32,
                                        kernel_init=reference_init())

    def bound(self, z, eps: float = 1e-3):
        """Bound z into the representable range per dim
        (reference: FSQ.py:96-101)."""
        lv = self._levels.astype(jnp.float32)
        half_l = (lv - 1.0) * (1.0 + eps) / 2.0
        offset = jnp.where(self._levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        """z -> zhat in [-1, 1] per dim (reference: FSQ.py:103-107)."""
        quantized = round_ste(self.bound(z))
        half_width = self._levels // 2
        return quantized / half_width.astype(jnp.float32)

    def _scale_and_shift(self, zhat_normalized):
        half_width = (self._levels // 2).astype(jnp.float32)
        return zhat_normalized * half_width + half_width

    def _scale_and_shift_inverse(self, zhat):
        half_width = (self._levels // 2).astype(jnp.float32)
        return (zhat - half_width) / half_width

    def codes_to_indices(self, zhat):
        """zhat [..., codebook_dim] in [-1,1] -> flat index
        (reference: FSQ.py:117-121)."""
        digits = self._scale_and_shift(zhat)
        return (digits * self._basis.astype(jnp.float32)).sum(-1).astype(jnp.int32)

    def indices_to_codes(self, indices, project_out: bool = True):
        """Inverse of codes_to_indices (reference: FSQ.py:123-145)."""
        indices = jnp.asarray(indices, jnp.int32)[..., None]
        digits = (indices // self._basis) % self._levels
        codes = self._scale_and_shift_inverse(digits.astype(jnp.float32))
        if self.num_codebooks > 1:
            codes = codes.reshape(*codes.shape[:-2], -1)
        if project_out and self.has_projections:
            codes = self.project_out(codes)
        return codes

    def __call__(self, x, *, train: bool = False) -> LFQReturn:
        x = x.astype(jnp.float32)  # fp32 island (reference: FSQ.py:147)
        assert x.shape[-1] == self.out_dim, (
            f"expected dim {self.out_dim}, got {x.shape[-1]}"
        )
        if self.has_projections:
            x = self.project_in(x)

        B, N = x.shape[0], x.shape[1]
        z = x.reshape(B, N, self.num_codebooks, self.codebook_dim)
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)  # [B, N, c]

        out = codes.reshape(B, N, self.effective_codebook_dim)
        if self.has_projections:
            out = self.project_out(out)
        if self.num_codebooks == 1:
            indices = indices[..., 0]
        return LFQReturn(out, indices, jnp.float32(0.0))
