# ------------------------------------------------------------------
"""Lookup-Free Quantization (LFQ, https://arxiv.org/abs/2310.05737).

Parity target: reference models/codebook/LFQ.py (itself adapted from
lucidrains/vector-quantize-pytorch). Each latent dim is sign-binarized to
+/-1 with a straight-through estimator; the bit-packed sign pattern is the
code index. With the default codebook_size=2 the 16-dim feature is projected
to 1 dim and the index in {0,1} is the anomaly bit.

Numerics contract: the whole quantizer runs in float32 -- an fp32 island
inside a bf16 program (reference forces fp32 via @autocast(enabled=False),
models/codebook/LFQ.py:183-189).

Aux loss (training only, reference: :237-300):
  entropy_weight * per_sample_entropy - diversity_gamma * codebook_entropy
  + commitment_weight * mse(x, stop_grad(quantized))
with probabilities softmax(2 * x . codebook * inv_temperature) over the
implicit codebook.
"""
# ------------------------------------------------------------------

import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LFQReturn(NamedTuple):
    quantized: jnp.ndarray  # [B, N, dim]
    indices: jnp.ndarray    # [B, N] int32
    aux_loss: jnp.ndarray   # scalar


class LFQScalarParts(NamedTuple):
    """Pre-projection result of the 1-bit fast path (codebook_dims == 1).

    s_q carries the straight-through value (exactly +/-codebook_scale) and
    gradient; z_q = s_q[..., None] * w_out + b_out reconstructs the
    projected codes when needed.
    """

    s_q: jnp.ndarray      # [M] float32, +/-scale with STE
    indices: jnp.ndarray  # [M] int32 in {0, 1}
    aux_loss: jnp.ndarray  # scalar


class LossBreakdown(NamedTuple):
    per_sample_entropy: jnp.ndarray
    codebook_entropy: jnp.ndarray
    commitment: jnp.ndarray


def _log(t, eps=1e-5):
    # clamp-then-log (reference: models/codebook/LFQ.py:52-53)
    return jnp.log(jnp.maximum(t, eps))


def _entropy(prob):
    return (-prob * _log(prob)).sum(axis=-1)


class LFQ(nn.Module):
    """Lookup-free quantizer.

    forward: x [B, N, dim] -> (quantized [B, N, dim], indices [B, N], aux_loss)
    (reference: models/codebook/LFQ.py:184-307)
    """

    dim: int = 16
    codebook_size: int = 2
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 1.5
    diversity_gamma: float = 1.0
    num_codebooks: int = 1
    codebook_scale: float = 1.0
    inv_temperature: float = 100.0
    kernel_init: object = None  # None -> reference_init (build.py:96-118)
    # Training-stability option (documented deviation, default OFF =
    # reference behavior): freeze project_out. The anomaly L1
    # (models/losses.py:127-168) is minimized by collapsing project_out's
    # weight to 0 (then z_q == vq_0 regardless of the code bits), which
    # deadlocks training: bits lose every gradient path and the classifier
    # sees a constant input. Freezing the output projection removes that
    # degenerate attractor; the L1 then supervises the code ASSIGNMENT
    # (through the straight-through estimator) instead of the codebook
    # geometry. See BASELINE.md "Training dynamics".
    freeze_project_out: bool = False

    @property
    def codebook_dim(self) -> int:
        cd = int(math.log2(self.codebook_size))
        assert 2 ** cd == self.codebook_size, "codebook_size must be a power of 2"
        return cd

    @property
    def codebook_dims(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def has_projections(self) -> bool:
        return self.dim != self.codebook_dims

    def setup(self):
        # the reference composite model re-initializes every Linear with
        # Normal(0.02, 0.02) after construction (models/build.py:96-118)
        kw = {} if self.kernel_init is None else {
            "kernel_init": self.kernel_init}
        if self.has_projections:
            self.project_in = nn.Dense(self.codebook_dims, dtype=jnp.float32,
                                       **kw)
            self.project_out = nn.Dense(self.dim, dtype=jnp.float32, **kw)
        # bit weights, MSB first (reference: :134)
        self.mask = 2 ** jnp.arange(self.codebook_dim - 1, -1, -1, dtype=jnp.int32)

    def _codebook(self) -> jnp.ndarray:
        """Implicit codebook [codebook_size, codebook_dim] of +/-scale codes
        (reference: :139-146)."""
        all_codes = jnp.arange(self.codebook_size, dtype=jnp.int32)
        bits = ((all_codes[:, None] & self.mask) != 0).astype(jnp.float32)
        return self.bits_to_codes(bits)

    def bits_to_codes(self, bits):
        return bits * self.codebook_scale * 2 - self.codebook_scale

    def indices_to_codes(self, indices, project_out: bool = True):
        """Index -> code vector in feature space (reference: :152-181).
        Used by the anomaly loss to reconstruct the 'normal' code vq_0."""
        indices = jnp.asarray(indices, jnp.int32)
        bits = ((indices[..., None] & self.mask) != 0).astype(jnp.float32)
        codes = self.bits_to_codes(bits)
        if project_out and self.has_projections:
            codes = self.project_out(codes)
        return codes

    def in_proj_params(self):
        """(kernel [dim], bias scalar) of project_in for the 1-bit fast path.

        Extracted through sanctioned module calls (Dense on an identity /
        zero batch), so parameter initialization, naming, and gradient flow
        are identical to calling project_in directly -- but the caller can
        use einsum contractions that never materialize [..., 1]-shaped
        tensors (which the (8, 128) TPU tile pads 128x).
        """
        assert self.codebook_dims == 1 and self.has_projections
        b = self.project_in(jnp.zeros((1, self.dim), jnp.float32))[0, 0]
        k = self.project_in(jnp.eye(self.dim, dtype=jnp.float32))[:, 0] - b
        return k, b

    def out_proj_params(self):
        """(w [dim], b [dim]) such that project_out(s) = s * w + b.

        Derived from project_out(+scale) and project_out(-scale) (two module
        calls), keeping gradients exact. Note project_out(-scale) IS vq_0,
        the 'normal' code vector of the anomaly loss
        (reference: models/codebook/LFQ.py:152-181)."""
        assert self.codebook_dims == 1 and self.has_projections
        scale = self.codebook_scale
        z01 = self.project_out(
            jnp.array([[-scale], [scale]], jnp.float32))
        w = (z01[1] - z01[0]) / (2.0 * scale)
        b = (z01[1] + z01[0]) / 2.0
        if self.freeze_project_out:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        return w, b

    def quantize_flat(self, x, *, train: bool = False) -> LFQScalarParts:
        """1-bit fast path over a flat token batch (codebook_dims == 1).

        x: [M, dim] float32 tokens (any flattening of the caller's layout).
        Returns per-token scalars only -- the full [M, dim] quantized tensor
        is never built here; callers reconstruct packed z_q lazily from
        (s_q, out_proj_params()). All per-token tensors are 1-D [M], the
        TPU-friendly shape (the generic __call__ path's [M, 1] / [M, 2]
        intermediates tile-pad 64-128x).

        NOTE: when the caller's natural layout is packed [..., V*dim]
        (the model's internal layout), prefer quantize_packed -- the
        reshape to [M, dim] here forces an 8x-lane-padded relayout of the
        whole activation on TPU and blocks GSPMD sharding propagation.

        Math parity with __call__ / the reference (models/codebook/LFQ.py:
        184-307): project_in -> sign quantize + STE -> entropy & commitment
        losses with softmax over the 2-code implicit codebook at
        inv_temperature (softmax of 2 logits == sigmoid of their difference).
        """
        assert self.codebook_dims == 1, "fast path requires codebook_size=2"
        x = x.astype(jnp.float32)
        k_in, b_in = self.in_proj_params()
        s = jnp.einsum("mc,c->m", x, k_in) + b_in  # [M] fp32
        return self._scalar_core(s, train)

    def quantize_packed(self, zp, n_vars: int, *,
                        train: bool = False) -> LFQScalarParts:
        """1-bit fast path in the packed [..., V*dim] layout.

        Same math as quantize_flat (each variable's dim-sized block is one
        token), but the projection runs as ONE block-diagonal contraction
        [..., V*dim] @ [V*dim, V], so the activation never leaves its
        native wide-lane layout. The flat form's `reshape(-1, dim)` turns a
        (V*dim)-lane tensor into a dim-lane one -- on TPU that is a forced
        relayout copy padded 128/dim x per (8,128) tile (at the CERRA
        512x832 geometry the [20.4M, 16] fp32 relayout alone is ~15 GB of
        HBM) and, because the spatial axes are flattened away, it also
        stops GSPMD spatial sharding from propagating into the quantizer.

        zp: [..., V*dim] activations (any compute dtype; fp32 island here).
        Returns LFQScalarParts with s_q / indices shaped [..., V].
        """
        assert self.codebook_dims == 1, "fast path requires codebook_size=2"
        V, d = int(n_vars), self.dim
        assert zp.shape[-1] == V * d, (zp.shape, V, d)
        k_in, b_in = self.in_proj_params()
        # blk[k, v] = 1 iff k // dim == v: trace-time constant; gradient
        # flows to k_in through the tile+multiply
        import numpy as np

        blk = np.equal.outer(np.arange(V * d) // d,
                             np.arange(V)).astype(np.float32)
        w_blk = jnp.tile(k_in, V)[:, None] * blk  # [V*dim, V]
        s = jnp.einsum("...k,kv->...v", zp.astype(jnp.float32),
                       w_blk) + b_in
        return self._scalar_core(s, train)

    def _scalar_core(self, s, train: bool) -> LFQScalarParts:
        """Shared scalar tail of the 1-bit fast paths: sign quantize + STE,
        entropy and commitment losses (any-shaped fp32 latent s)."""
        scale = self.codebook_scale
        q = jnp.where(s > 0, scale, -scale)
        if train:
            s_q = s + jax.lax.stop_gradient(q - s)  # STE (reference :227-228)
        else:
            s_q = q
        indices = (s_q > 0).astype(jnp.int32)

        if train:
            # prob = softmax([2*s*(-scale), 2*s*(+scale)] * inv_temp)
            #      = [sigmoid(-4*scale*temp*s), sigmoid(4*scale*temp*s)]
            a = 4.0 * scale * self.inv_temperature * s
            p1 = jax.nn.sigmoid(a)
            p0 = 1.0 - p1
            per_sample_entropy = jnp.mean(-p0 * _log(p0) - p1 * _log(p1))
            q0, q1 = jnp.mean(p0), jnp.mean(p1)
            codebook_entropy = -q0 * _log(q0) - q1 * _log(q1)
            entropy_aux = (self.entropy_loss_weight * per_sample_entropy
                           - self.diversity_gamma * codebook_entropy)
            commit = jnp.mean(jnp.square(s - jax.lax.stop_gradient(q)))
        else:
            per_sample_entropy = codebook_entropy = jnp.float32(0.0)
            entropy_aux = commit = jnp.float32(0.0)

        aux_loss = commit * self.commitment_loss_weight + entropy_aux
        self.sow("intermediates", "lfq_breakdown",
                 LossBreakdown(per_sample_entropy, codebook_entropy, commit))
        return LFQScalarParts(s_q, indices, aux_loss)

    def __call__(self, x, *, train: bool = False):
        # fp32 island (reference: :183-189,199)
        x = x.astype(jnp.float32)
        assert x.shape[-1] == self.dim, (
            f"expected dim {self.dim}, got {x.shape[-1]}"
        )

        if self.has_projections:
            x = self.project_in(x)

        B, N = x.shape[0], x.shape[1]
        c, d = self.num_codebooks, self.codebook_dim
        x = x.reshape(B, N, c, d)

        original_input = x
        quantized = jnp.where(x > 0, self.codebook_scale, -self.codebook_scale)

        if train:
            # straight-through estimator (reference: :227-228)
            x = x + jax.lax.stop_gradient(quantized - x)
        else:
            x = quantized

        # bit-packed sign pattern is the code index (reference: :234)
        indices = ((x > 0).astype(jnp.int32) * self.mask).sum(axis=-1)  # [B,N,c]

        if train:
            codebook = self._codebook()  # [size, d]
            # logits = 2 * x . codebook * inv_temp (reference distance is
            # -2 x.c; prob = softmax(-distance * inv_temp), :239-240)
            logits = 2.0 * jnp.einsum("bncd,jd->bncj", original_input, codebook)
            prob = jax.nn.softmax(logits * self.inv_temperature, axis=-1)
            flat_prob = prob.reshape(-1, c, self.codebook_size)
            per_sample_entropy = _entropy(flat_prob).mean()
            avg_prob = flat_prob.mean(axis=0)
            codebook_entropy = _entropy(avg_prob).mean()
            entropy_aux = (self.entropy_loss_weight * per_sample_entropy
                           - self.diversity_gamma * codebook_entropy)
            commit = jnp.mean(
                (original_input - jax.lax.stop_gradient(quantized)) ** 2
            )
        else:
            per_sample_entropy = codebook_entropy = jnp.float32(0.0)
            entropy_aux = commit = jnp.float32(0.0)

        x = x.reshape(B, N, c * d)
        if self.has_projections:
            if self.freeze_project_out and self.codebook_dims == 1:
                w, b = self.out_proj_params()  # stop-gradient inside
                x = x * w + b
            else:
                x = self.project_out(x)

        if self.num_codebooks == 1:
            indices = indices[..., 0]

        aux_loss = commit * self.commitment_loss_weight + entropy_aux
        self.sow("intermediates", "lfq_breakdown",
                 LossBreakdown(per_sample_entropy, codebook_entropy, commit))
        return LFQReturn(x, indices, aux_loss)
