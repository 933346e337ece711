# ------------------------------------------------------------------
"""Latent Quantization (https://arxiv.org/abs/2305.18378).

Parity target: reference models/codebook/LatentQuantize.py. Each latent dim
has `levels[d]` learnable scalar values (init: linspace(-0.5, 0.5, L) for odd
L, arange(L)/L - 0.5 for even L, reference: LatentQuantize.py:115-116);
quantization snaps each dim to its nearest value with a straight-through
estimator (reference: :141-160). Training loss = commitment_weight *
mse(stop_grad(x), out) + quantization_weight * mse(x, stop_grad(out))
(reference: :133-139,286-293).

Design note (intended-semantics deviation): the reference derives indices by
scale-shifting the *learned* values back onto the integer grid and truncating
(:173-177), which degrades once values drift from their init. We use the
argmin level index directly -- identical at init and the intended mixed-radix
semantics throughout training.
"""
# ------------------------------------------------------------------

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.quant.lfq import LFQReturn


def _init_values(levels: Sequence[int]) -> list:
    """Per-dim level values, zero-centered, start at -0.5
    (reference: LatentQuantize.py:115-116)."""
    out = []
    for level in levels:
        if level % 2 == 1:
            out.append(np.linspace(-0.5, 0.5, level, dtype=np.float32))
        else:
            out.append((np.arange(level) / level - 0.5).astype(np.float32))
    return out


class LatentQuantize(nn.Module):
    """Per-dim learnable-level quantizer.

    forward: x [B, N, dim] -> (quantized [B, N, dim], indices [B, N], loss)
    """

    levels: Sequence[int] = (2,)
    dim: Optional[int] = None
    commitment_loss_weight: float = 1.0
    quantization_loss_weight: float = 1.0
    num_codebooks: int = 1
    optimize_values: bool = True

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

        self._basis = jnp.asarray(
            np.concatenate([[1], np.cumprod(self.levels)[:-1]]).astype(np.int32)
        )
        init = _init_values(self.levels)
        equal = len(set(self.levels)) == 1
        if equal:
            stacked = np.stack(init)  # [D, L]
            if self.optimize_values:
                self.values_per_latent = self.param(
                    "values_per_latent", lambda k: jnp.asarray(stacked))
            else:
                self.values_per_latent = jnp.asarray(stacked)
            self._equal_levels = True
        else:
            if self.optimize_values:
                self.values_per_latent = [
                    self.param(f"values_{i}", lambda k, v=v: jnp.asarray(v))
                    for i, v in enumerate(init)
                ]
            else:
                self.values_per_latent = [jnp.asarray(v) for v in init]
            self._equal_levels = False

        if self.has_projections:
            self.project_in = nn.Dense(self.effective_codebook_dim,
                                       dtype=jnp.float32,
                                       kernel_init=reference_init())
            self.project_out = nn.Dense(self.out_dim, dtype=jnp.float32,
                                        kernel_init=reference_init())

    def quantize(self, z):
        """Snap each dim to its nearest learnable value with STE; also return
        the level index per dim (reference: LatentQuantize.py:141-160)."""
        if self._equal_levels:
            vals = self.values_per_latent  # [D, L]
            dist = jnp.abs(z[..., None] - vals)  # [..., D, L]
            index = jnp.argmin(dist, axis=-1)  # [..., D]
            quant = jnp.take_along_axis(
                jnp.broadcast_to(vals, index.shape + (vals.shape[-1],)),
                index[..., None], axis=-1)[..., 0]
        else:
            idxs, quants = [], []
            for i in range(self.codebook_dim):
                vals = self.values_per_latent[i]  # [L_i]
                dist = jnp.abs(z[..., i, None] - vals)
                ind = jnp.argmin(dist, axis=-1)
                idxs.append(ind)
                quants.append(vals[ind])
            index = jnp.stack(idxs, axis=-1)
            quant = jnp.stack(quants, axis=-1)
        quant = z + jax.lax.stop_gradient(quant - z)
        return quant, index

    def digits_to_indices(self, digits):
        """Mixed-radix digit vector -> flat code index."""
        return (digits.astype(jnp.int32) * self._basis).sum(-1)

    def indices_to_codes(self, indices, project_out: bool = True):
        """Flat index -> code vector of learned values
        (reference: LatentQuantize.py:179-200)."""
        indices = jnp.asarray(indices, jnp.int32)[..., None]
        digits = (indices // self._basis) % jnp.asarray(
            np.asarray(self.levels, np.int32))
        if self._equal_levels:
            vals = self.values_per_latent
            codes = jnp.take_along_axis(
                jnp.broadcast_to(vals, digits.shape + (vals.shape[-1],)),
                digits[..., None], axis=-1)[..., 0]
        else:
            codes = jnp.stack(
                [self.values_per_latent[i][digits[..., i]]
                 for i in range(self.codebook_dim)], axis=-1)
        if self.num_codebooks > 1:
            codes = codes.reshape(*codes.shape[:-2], -1)
        if project_out and self.has_projections:
            codes = self.project_out(codes)
        return codes

    def __call__(self, x, *, train: bool = False) -> LFQReturn:
        x = x.astype(jnp.float32)
        assert x.shape[-1] == self.out_dim, (
            f"expected dim {self.out_dim}, got {x.shape[-1]}"
        )
        original_input = x
        if self.has_projections:
            x = self.project_in(x)

        B, N = x.shape[0], x.shape[1]
        z = x.reshape(B, N, self.num_codebooks, self.codebook_dim)
        codes, digits = self.quantize(z)
        indices = self.digits_to_indices(digits)  # [B, N, c]

        out = codes.reshape(B, N, self.effective_codebook_dim)
        if self.has_projections:
            out = self.project_out(out)
        if self.num_codebooks == 1:
            indices = indices[..., 0]

        if train:
            # both against the ORIGINAL (pre-projection) input
            # (reference: LatentQuantize.py:286-293)
            commit = jnp.mean((jax.lax.stop_gradient(original_input) - out) ** 2)
            quant = jnp.mean((original_input - jax.lax.stop_gradient(out)) ** 2)
            loss = (self.commitment_loss_weight * commit
                    + self.quantization_loss_weight * quant)
        else:
            loss = jnp.float32(0.0)
        return LFQReturn(out, indices, loss)
