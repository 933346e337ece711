# ------------------------------------------------------------------
"""Vector quantization with learnable or EMA codebooks.

Parity target: reference models/codebook/VQ.py (a vector-quantize-pytorch
port, 1133 LoC). This is the repo component that carries the reference's ONLY
distributed code -- NCCL all_reduce/all_gather/broadcast for distributed
k-means init and EMA codebook sync (reference: VQ.py:164-202,322-324,
534-539,815-816). The TPU-native equivalent here is `jax.lax.psum` over a
named mesh axis (`sync_axis`): when the module runs inside `shard_map`/pjit
with that axis, k-means bins/means and the EMA cluster statistics are
all-reduced over ICI -- same math, no NCCL.

Functional-state design (not a port): torch mutates registered buffers
in-place during forward; here all codebook state (embed / embed_avg /
cluster_size / initted) lives in a flax "codebook" variable collection that
training steps thread explicitly (apply with mutable=["codebook"]). Lazy
k-means init happens under `lax.cond` on the `initted` flag -- jit-compatible,
same first-batch semantics as the reference (:356-377).

Modes (reference defaults at VQ.py:736-772):
* learnable codebook (default: learnable_codebook=True, ema_update=False) --
  embed is a trainable param, trained by the commitment MSE;
* EMA codebook (ema_update=True) -- embed in the "codebook" collection,
  updated by decayed cluster averages with Laplace smoothing (:524-548);
* cosine-sim codebook (use_cosine_sim) -- l2-normalized inputs and codes
  (:558-734);
* optional gumbel/stochastic code sampling (:83-121), dead-code expiry
  (:451-475), orthogonal regularization (:265-270), multi-head codebooks.

Not carried over: the cross-entropy-on-passed-indices path (VQ.py:994-1013)
-- unused by any reference driver; and in-place codebook optimizers.
"""
# ------------------------------------------------------------------

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from idee_tpu.quant.lfq import LFQReturn


def l2norm(t, eps: float = 1e-12):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)


def cdist(x, y):
    """Pairwise euclidean distance [H,M,D]x[H,K,D] -> [H,M,K]
    (reference: VQ.py:44-48)."""
    x2 = jnp.sum(x ** 2, -1, keepdims=True)      # [H,M,1]
    y2 = jnp.sum(y ** 2, -1)[:, None, :]          # [H,1,K]
    xy = jnp.einsum("hmd,hkd->hmk", x, y)
    return jnp.sqrt(jnp.maximum(x2 + y2 - 2 * xy, 0.0))


def laplace_smoothing(x, n_categories: int, eps: float = 1e-5):
    """(x + eps) / (sum + K*eps) (reference: VQ.py:124-126)."""
    return (x + eps) / (x.sum(-1, keepdims=True) + n_categories * eps)


def orthogonal_loss_fn(t, active_mask=None):
    """||cos_sim(codebook, codebook) - I||^2 mean (reference: VQ.py:265-270).

    active_mask [H,K] restricts the penalty to codes used this batch (the
    reference gathers unique indices -- dynamic shapes; the masked-dense
    formulation here is the jit-compatible equivalent).
    """
    h, k = t.shape[0], t.shape[1]
    normed = l2norm(t)
    cos = jnp.einsum("hkd,hjd->hkj", normed, normed)
    err = (cos - jnp.eye(k)[None]) ** 2
    if active_mask is not None:
        pair = active_mask[:, :, None] * active_mask[:, None, :]
        denom = jnp.maximum(pair.sum(), 1.0)
        return (err * pair).sum() / denom
    return err.mean()


class VQ(nn.Module):
    """Vector quantizer: forward x [B,N,dim] -> (quantized, indices, loss)."""

    dim: int = 16
    codebook_size: int = 2
    codebook_dim: Optional[int] = 16
    heads: int = 1
    separate_codebook_per_head: bool = False
    decay: float = 0.8
    eps: float = 1e-5
    commitment_weight: float = 1.0
    orthogonal_reg_weight: float = 0.0
    orthogonal_reg_active_codes_only: bool = False
    kmeans_init: bool = False
    kmeans_iters: int = 10
    use_cosine_sim: bool = False
    threshold_ema_dead_code: float = 0.0
    reset_cluster_size: Optional[float] = None
    stochastic_sample_codes: bool = False
    sample_codebook_temp: float = 1.0
    ema_update: bool = False
    learnable_codebook: bool = True
    freeze_codebook: bool = False
    sync_axis: Optional[str] = None  # mesh axis for psum codebook sync

    @property
    def _cd(self) -> int:
        return self.codebook_dim if self.codebook_dim is not None else self.dim

    @property
    def _num_codebooks(self) -> int:
        return self.heads if self.separate_codebook_per_head else 1

    @property
    def has_projections(self) -> bool:
        return self._cd * self.heads != self.dim

    def setup(self):
        from idee_tpu.nn.layers import reference_init

        assert not (self.ema_update and self.learnable_codebook), (
            "learnable codebook not compatible with EMA update"
        )
        assert not (self.kmeans_init and self.learnable_codebook), (
            "k-means init requires a non-learnable (collection) codebook"
        )
        H, K, D = self._num_codebooks, self.codebook_size, self._cd
        if self.has_projections:
            self.project_in = nn.Dense(self._cd * self.heads,
                                       dtype=jnp.float32,
                                       kernel_init=reference_init())
            self.project_out = nn.Dense(self.dim, dtype=jnp.float32,
                                        kernel_init=reference_init())

        def uniform_init(key):
            # kaiming-uniform over [H,K,D] (reference: VQ.py:72-75); zeros
            # when awaiting k-means init (reference: :304)
            if self.kmeans_init:
                return jnp.zeros((H, K, D), jnp.float32)
            bound = 1.0 / (K ** 0.5)
            return jax.random.uniform(key, (H, K, D), jnp.float32,
                                      -bound, bound)

        if self.learnable_codebook and not self.freeze_codebook:
            self.embed = self.param("embed", uniform_init)
        else:
            self.embed = self.variable(
                "codebook", "embed",
                lambda: uniform_init(self.make_rng("params")))
        self.cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((H, K), jnp.float32))
        self.embed_avg = self.variable(
            "codebook", "embed_avg",
            lambda: jnp.array(self._embed_value()))
        self.initted = self.variable(
            "codebook", "initted",
            lambda: jnp.float32(0.0 if self.kmeans_init else 1.0))

    def _embed_value(self):
        return self.embed if isinstance(self.embed, jnp.ndarray) else self.embed.value

    def _psum(self, t):
        if self.sync_axis is not None:
            return jax.lax.psum(t, self.sync_axis)
        return t

    # -- k-means (reference: VQ.py:213-253, distributed via psum) --

    def _kmeans(self, z, key):
        """z [H, M, D] -> (means [H,K,D], bins [H,K]); fixed-iteration Lloyd
        with psum-reduced bins/sums when sync_axis is set."""
        H, M, D = z.shape
        K = self.codebook_size

        # init means: random sample of K vectors per head
        idx = jax.random.randint(key, (H, K), 0, M)
        means = jnp.take_along_axis(z, idx[..., None], axis=1)

        def body(_, means):
            if self.use_cosine_sim:
                sim = jnp.einsum("hmd,hkd->hmk", z, l2norm(means))
                assign = jnp.argmax(sim, -1)
            else:
                assign = jnp.argmin(cdist(z, means), -1)
            onehot = jax.nn.one_hot(assign, K, dtype=jnp.float32)
            bins = self._psum(onehot.sum(1))          # [H,K]
            sums = self._psum(jnp.einsum("hmd,hmk->hkd", z, onehot))
            new = sums / jnp.maximum(bins[..., None], 1.0)
            means = jnp.where(bins[..., None] > 0, new, means)
            if self.use_cosine_sim:
                means = l2norm(means)
            return means

        means = jax.lax.fori_loop(0, self.kmeans_iters, body, means)
        if self.use_cosine_sim:
            sim = jnp.einsum("hmd,hkd->hmk", z, l2norm(means))
            assign = jnp.argmax(sim, -1)
        else:
            assign = jnp.argmin(cdist(z, means), -1)
        bins = self._psum(
            jax.nn.one_hot(assign, K, dtype=jnp.float32).sum(1))
        return means, bins

    def indices_to_codes(self, indices, project_out: bool = True):
        """Code index -> feature-space vector (reference: VQ.py:871-895).
        Heads==1 path (all framework call sites)."""
        embed = self._embed_value()[0]  # [K, D]
        codes = embed[jnp.asarray(indices, jnp.int32)]
        if project_out and self.has_projections:
            codes = self.project_out(codes)
        return codes

    def __call__(self, x, *, train: bool = False) -> LFQReturn:
        x = x.astype(jnp.float32)  # fp32 island (reference: VQ.py:476,487)
        assert x.shape[-1] == self.dim
        B, N = x.shape[0], x.shape[1]
        H, K, D = self._num_codebooks, self.codebook_size, self._cd

        v = x
        if self.has_projections:
            v = self.project_in(v)

        # [B, N, heads*D] -> [H, M, D]
        if self.separate_codebook_per_head:
            z = v.reshape(B, N, H, D).transpose(2, 0, 1, 3).reshape(H, B * N, D)
        else:
            z = v.reshape(1, B * N * self.heads, D)
        M = z.shape[1]

        updatable = (train and not self.freeze_codebook
                     and not self.learnable_codebook)
        needs_rng = (self.kmeans_init or self.stochastic_sample_codes
                     or self.threshold_ema_dead_code > 0)
        key = self.make_rng("codebook") if (train and needs_rng) else None

        embed = self._embed_value()
        cluster_size = self.cluster_size.value
        initted = self.initted.value

        # lazy k-means init on the first training batch
        # (reference: VQ.py:356-377,499)
        if self.kmeans_init and train:
            k_km, key = jax.random.split(key)

            def do_init(_):
                means, bins = self._kmeans(jax.lax.stop_gradient(z), k_km)
                return means, bins

            def keep(_):
                return embed, cluster_size

            embed, cluster_size = jax.lax.cond(initted == 0, do_init, keep,
                                               None)
            if updatable or not self.learnable_codebook:
                self.embed.value = embed
                self.cluster_size.value = cluster_size
                self.embed_avg.value = embed * cluster_size[..., None]
                self.initted.value = jnp.float32(1.0)

        codebook = jax.lax.stop_gradient(embed) \
            if (not self.learnable_codebook or self.freeze_codebook) else embed

        if self.use_cosine_sim:
            zq_in = l2norm(z)
            dist = jnp.einsum("hmd,hkd->hmk", zq_in, l2norm(codebook))
        else:
            zq_in = z
            dist = -cdist(z, codebook)

        # code sampling (reference gumbel_sample, VQ.py:83-121)
        if self.stochastic_sample_codes and train:
            k_g, key = jax.random.split(key)
            g = -jnp.log(-jnp.log(
                jax.random.uniform(k_g, dist.shape, minval=1e-20, maxval=1.0)
            ) + 1e-20)
            ind = jnp.argmax(dist / self.sample_codebook_temp + g, -1)
        else:
            ind = jnp.argmax(dist, -1)  # [H, M]
        onehot = jax.nn.one_hot(ind, K, dtype=jnp.float32)

        quantize = jnp.einsum("hmk,hkd->hmd", onehot, codebook)

        # EMA codebook update (reference: VQ.py:524-548) -- psum over the mesh
        if self.ema_update and updatable:
            zd = jax.lax.stop_gradient(z)
            bins = self._psum(onehot.sum(1))                     # [H,K]
            embed_sum = self._psum(jnp.einsum("hmd,hmk->hkd", zd, onehot))
            new_cs = cluster_size * self.decay + bins * (1 - self.decay)
            new_avg = (self.embed_avg.value * self.decay
                       + embed_sum * (1 - self.decay))
            smoothed = laplace_smoothing(new_cs, K, self.eps) \
                * new_cs.sum(-1, keepdims=True)
            new_embed = new_avg / smoothed[..., None]
            if self.use_cosine_sim:
                new_embed = l2norm(new_embed)

            # dead-code expiry (reference: VQ.py:451-475)
            if self.threshold_ema_dead_code > 0:
                k_e, key = jax.random.split(key)
                expired = new_cs < self.threshold_ema_dead_code    # [H,K]
                ridx = jax.random.randint(k_e, (H, K), 0, M)
                samples = jnp.take_along_axis(zd, ridx[..., None], axis=1)
                reset = self.reset_cluster_size \
                    if self.reset_cluster_size is not None \
                    else self.threshold_ema_dead_code
                new_embed = jnp.where(expired[..., None], samples, new_embed)
                new_cs = jnp.where(expired, jnp.float32(reset), new_cs)
                new_avg = jnp.where(expired[..., None], samples * reset,
                                    new_avg)

            self.cluster_size.value = new_cs
            self.embed_avg.value = new_avg
            self.embed.value = new_embed

        # losses (reference: VQ.py:978-1058)
        if train:
            commit_target = quantize \
                if (self.learnable_codebook and not self.freeze_codebook) \
                else jax.lax.stop_gradient(quantize)
            commit = jnp.mean((commit_target - zq_in) ** 2)
            loss = self.commitment_weight * commit
            if self.orthogonal_reg_weight > 0:
                mask = None
                if self.orthogonal_reg_active_codes_only:
                    mask = (onehot.sum(1) > 0).astype(jnp.float32)
                loss = loss + self.orthogonal_reg_weight * orthogonal_loss_fn(
                    embed, mask)
            # straight-through (reference: VQ.py:986)
            quantize = zq_in + jax.lax.stop_gradient(quantize - zq_in)
        else:
            loss = jnp.float32(0.0)

        # back to [B, N, heads*D]
        if self.separate_codebook_per_head:
            out = quantize.reshape(H, B, N, D).transpose(1, 2, 0, 3)
            out = out.reshape(B, N, H * D)
            indices = ind.reshape(H, B, N).transpose(1, 2, 0)
        else:
            out = quantize.reshape(B, N, self.heads * D)
            indices = ind.reshape(B, N, self.heads)
        if self.heads == 1:
            indices = indices[..., 0]

        if self.has_projections:
            out = self.project_out(out)
        return LFQReturn(out, indices.astype(jnp.int32), loss)
