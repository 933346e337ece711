# ------------------------------------------------------------------
"""UniAD: DETR-style feature-reconstruction transformer
(https://arxiv.org/abs/2206.03687).

Parity target: Baselines_Reconstruction/models/build_uniad.py (814 LoC).
Single-timestep input [B, V, H, W] is bilinearly downsampled by
`instrides`, tokenised over the feature grid, optionally feature-jittered
(build_uniad.py:705-714), projected, run through a transformer whose
encoder and both decoder attentions can be restricted to a spatial
neighborhood ("neighbor-masked attention", :149-173), reconstructed, and
scored as a per-pixel squared error map upsampled back to input
resolution, with the sign flipped on extreme pixels during training
(:763-776).

TPU-first notes: the neighborhood mask is a trace-time numpy boolean
computed by broadcasting (the reference builds it with an O((HW)^2)
Python loop on device, :149-173); attention is a plain batched einsum
(tokens x tokens fits comfortably for the 50x50 default grid).

Init: xavier_uniform for Linear (initialize_from_cfg, :71-97); the
decoder's learned query embedding and learned position embeddings are
N(0,1)-style torch defaults (uniform for pos embeds, :576-578).
"""
# ------------------------------------------------------------------

import math
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.baselines.config import ReconConfig

xavier_uniform = nn.initializers.xavier_uniform()


def neighbor_mask(feature_size: Tuple[int, int],
                  neighbor_size: Tuple[int, int]) -> np.ndarray:
    """Boolean [N, N] allowed-attention mask: token (h1,w1) may attend to
    (h2,w2) iff |h1-h2| <= hm//2 and |w1-w2| <= wm//2
    (reference: build_uniad.py:149-173). Trace-time numpy."""
    h, w = feature_size
    hm, wm = neighbor_size
    hh = np.arange(h)
    ww = np.arange(w)
    dh = np.abs(hh[:, None] - hh[None, :]) <= hm // 2   # [h, h]
    dw = np.abs(ww[:, None] - ww[None, :]) <= wm // 2   # [w, w]
    allowed = dh[:, None, :, None] & dw[None, :, None, :]
    return allowed.reshape(h * w, h * w)


def sine_pos_embed(feature_size, num_pos_feats, normalize=True) -> np.ndarray:
    """[N, 2*num_pos_feats] sine position embedding
    (reference: build_uniad.py:515-561). Trace-time numpy."""
    h, w = feature_size
    y = np.cumsum(np.ones((h, w)), axis=0)
    x = np.cumsum(np.ones((h, w)), axis=1)
    if normalize:
        scale = 2 * math.pi
        y = y / (y[-1:, :] + 1e-6) * scale
        x = x / (x[:, -1:] + 1e-6) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=2).reshape(h * w, -1).astype(
        np.float32)


class LearnedPosEmbed(nn.Module):
    """Row + col learned embeddings (reference: build_uniad.py:564-598;
    torch init is U[0, 1), :576-578)."""

    feature_size: Tuple[int, int]
    num_pos_feats: int

    @nn.compact
    def __call__(self):
        h, w = self.feature_size
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (h, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (w, self.num_pos_feats))
        pos = jnp.concatenate(
            [jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats)),
             jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats))],
            axis=-1)
        return pos.reshape(h * w, -1)


class MHA(nn.Module):
    """Multi-head attention with optional boolean mask (torch
    nn.MultiheadAttention equivalent: packed in-proj, out-proj,
    attention-weight dropout)."""

    dim: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, train: bool = False):
        """q [B, Nq, C]; k/v [B, Nk, C]; mask [Nq, Nk] boolean allowed."""
        h = self.nhead
        hd = self.dim // h
        dense = lambda name: nn.Dense(self.dim, kernel_init=xavier_uniform,
                                      bias_init=nn.initializers.zeros_init(),
                                      name=name)
        qh = dense("q_proj")(q).reshape(*q.shape[:-1], h, hd)
        kh = dense("k_proj")(k).reshape(*k.shape[:-1], h, hd)
        vh = dense("v_proj")(v).reshape(*k.shape[:-1], h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * hd ** -0.5, kh)
        if mask is not None:
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(*q.shape[:-1], self.dim)
        return dense("out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer
    (reference: build_uniad.py:280-353)."""

    dim: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos, mask, train: bool = False):
        q = k = src + pos
        y = MHA(dim=self.dim, nhead=self.nhead, dropout=self.dropout,
                name="self_attn")(q, k, src, mask, train)
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout, deterministic=not train)(y))
        y = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                     name="linear1")(src)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.dim, kernel_init=xavier_uniform,
                     name="linear2")(y)
        src = nn.LayerNorm(name="norm2")(
            src + nn.Dropout(self.dropout, deterministic=not train)(y))
        return src


class DecoderLayer(nn.Module):
    """Post-norm DETR-style decoder layer with a per-layer learned query
    embedding (reference: build_uniad.py:356-429)."""

    dim: int
    nhead: int
    num_queries: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, out, memory, pos, tgt_mask, memory_mask,
                 train: bool = False):
        tgt = self.param("learned_embed", nn.initializers.normal(1.0),
                         (self.num_queries, self.dim))
        tgt = jnp.broadcast_to(tgt[None], (memory.shape[0],) + tgt.shape)

        y = MHA(dim=self.dim, nhead=self.nhead, dropout=self.dropout,
                name="self_attn")(tgt + pos, memory + pos, memory,
                                  tgt_mask, train)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(y))
        y = MHA(dim=self.dim, nhead=self.nhead, dropout=self.dropout,
                name="multihead_attn")(tgt + pos, out + pos, out,
                                       memory_mask, train)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(y))
        y = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                     name="linear1")(tgt)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.dim, kernel_init=xavier_uniform,
                     name="linear2")(y)
        tgt = nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(y))
        return tgt


class UniADOutput(NamedTuple):
    loss_map: jnp.ndarray  # [B, C, H, W] signed squared error


class UniAD(nn.Module):
    """reference: build_uniad.py:612-776.

    forward(x [B, V, H, W], mask_extreme_loss [B, H, W] or None) ->
    per-pixel signed squared-error map at input resolution.
    """

    config: ReconConfig

    @nn.compact
    def __call__(self, x, mask_extreme_loss=None, *,
                 train: bool = False) -> UniADOutput:
        cfg = self.config
        B, V, H, W = x.shape
        fh, fw = H // cfg.instrides, W // cfg.instrides
        n = fh * fw

        # bilinear downsample (reference: :717)
        feat = jax.image.resize(x, (B, V, fh, fw), method="bilinear")
        tokens = feat.reshape(B, V, n).transpose(0, 2, 1)  # [B, n, V]

        if train and cfg.feature_jitter_scale:
            # jitter with probability feature_jitter_prob (reference:
            # :705-714 flips one python-level coin; here per-batch)
            coin = jax.random.uniform(self.make_rng("jitter"), ())
            norms = jnp.linalg.norm(tokens, axis=2, keepdims=True) / V
            noise = jax.random.normal(self.make_rng("jitter_noise"),
                                      tokens.shape)
            jit_tokens = tokens + noise * norms * cfg.feature_jitter_scale
            tokens = jnp.where(coin <= cfg.feature_jitter_prob, jit_tokens,
                               tokens)

        tokens = nn.Dense(cfg.hidden_dim, kernel_init=xavier_uniform,
                          name="input_proj")(tokens)

        if cfg.pos_embed_type in ("v3", "learned"):
            pos = LearnedPosEmbed((fh, fw), cfg.hidden_dim // 2,
                                  name="pos_embed")()
        elif cfg.pos_embed_type in ("v2", "sine"):
            pos = jnp.asarray(sine_pos_embed((fh, fw), cfg.hidden_dim // 2))
        else:
            raise ValueError(f"not supported {cfg.pos_embed_type}")
        pos = pos[None]  # [1, n, C]

        nm = neighbor_mask((fh, fw), tuple(cfg.neighbor_size))
        masks = [jnp.asarray(nm) if use else None
                 for use in cfg.neighbor_mask]  # [enc, dec1, dec2]

        out = tokens
        for i in range(cfg.num_encoder_layers):
            out = EncoderLayer(dim=cfg.hidden_dim, nhead=cfg.nhead,
                               dim_feedforward=cfg.dim_feedforward,
                               dropout=cfg.dropout,
                               name=f"encoder_layer{i}")(
                out, pos, masks[0], train)
        memory = out
        dec = memory
        for i in range(cfg.num_decoder_layers):
            dec = DecoderLayer(dim=cfg.hidden_dim, nhead=cfg.nhead,
                               num_queries=n,
                               dim_feedforward=cfg.dim_feedforward,
                               dropout=cfg.dropout,
                               name=f"decoder_layer{i}")(
                dec, memory, pos, masks[1], masks[2], train)
        dec = nn.LayerNorm(name="decoder_norm")(dec)

        rec = nn.Dense(V, kernel_init=xavier_uniform,
                       name="output_proj")(dec)  # [B, n, V]
        rec = rec.transpose(0, 2, 1).reshape(B, V, fh, fw)

        loss = (rec - feat) ** 2
        # upsample the loss map and flip its sign on extreme pixels
        # (reference: :763-776)
        loss = jax.image.resize(loss, (B, V, H, W), method="bilinear")
        if mask_extreme_loss is not None:
            sign = jnp.where(mask_extreme_loss[:, None] == 1, -1.0, 1.0)
            loss = loss * sign
        return UniADOutput(loss)
