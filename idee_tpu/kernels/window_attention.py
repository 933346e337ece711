# ------------------------------------------------------------------
"""Fused windowed attention Pallas kernel.

The Swin backbones' hot op (reference models/encoder/Swin_3D.py:145-178,
SURVEY.md 2.9 N2): per window, softmax(q k^T * scale + rel_pos_bias
[+ shift_mask]) v. Windows are tiny (8-32 tokens at the default window
sizes) while their count is huge (~10k per 200x200 frame), so the TPU-first
formulation packs P = 128 // n windows into one 128-row MXU tile and
computes the whole tile's attention as ONE [128, hd] x [hd, 128] matmul
with a block-diagonal additive mask: off-diagonal (cross-window) logits get
-1e9, the diagonal blocks get the shared relative-position bias plus each
window's shift mask. One kernel invocation fuses both matmuls, the bias
adds, and the softmax -- the XLA path round-trips the [BW, h, n, n] logits
through HBM between each of those steps.

Autodiff: custom_vjp with the Pallas kernel on the forward pass and the
XLA composition's VJP (recompute) on the backward pass -- training pays one
extra fused forward; inference/serving runs fully fused.

Grid: (tiles, heads). Shifted-window (masked) blocks dispatch to the XLA
composition -- see _can_fuse.
"""
# ------------------------------------------------------------------

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 128      # MXU tile rows
_NEG = -1e9


def _xla_impl(q, k, v, bias, mask, scale: float):
    """Reference composition (reference: Swin_3D.py:145-178).

    q/k/v: [BW, n, h, hd]; bias: [h, n, n]; mask: [nW, n, n] or None.
    """
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        BW = q.shape[0]
        nW = mask.shape[0]
        attn = attn.reshape(BW // nW, nW, *attn.shape[1:])
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(BW, *attn.shape[2:])
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def _attend(q, k, v, s_add, out_dtype):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jax.nn.softmax(s + s_add, axis=-1)
    return jax.lax.dot_general(s, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(
        out_dtype)


def _kernel(q_ref, k_ref, v_ref, base_ref, o_ref, *, scale: float):
    """Blocks: q/k/v/o [1, 1, R, hd]; base [1, R, R] = shared rel-pos bias
    on the block diagonal, -1e9 off it."""
    q = q_ref[0, 0].astype(jnp.float32) * scale
    o_ref[0, 0] = _attend(q, k_ref[0, 0].astype(jnp.float32),
                          v_ref[0, 0].astype(jnp.float32), base_ref[0],
                          o_ref.dtype)


def _build_base(bias, n: int, P: int):
    """[h, R, R] base additive: -1e9 off the block diagonal, the shared
    relative-position bias on it."""
    h = bias.shape[0]
    base = jnp.full((h, P, n, P, n), _NEG, jnp.float32)
    idx = jnp.arange(P)
    base = base.at[:, idx, :, idx, :].set(
        jnp.broadcast_to(bias[:, None], (h, P, n, n)).transpose(1, 0, 2, 3))
    return base.reshape(h, P * n, P * n)


@functools.partial(jax.jit, static_argnames=("scale", "n", "P"))
def _pallas_impl(q, k, v, base, mask, scale: float, n: int, P: int):
    """q/k/v: [h, tiles, R, hd]; base: [h, R, R];
    mask: [n_patterns, P, n, n] or None (pattern period along tiles)."""
    h, tiles, R, hd = q.shape
    qkv_spec = pl.BlockSpec((1, 1, R, hd), lambda i, hh: (hh, i, 0, 0),
                            memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec((1, R, R), lambda i, hh: (hh, 0, 0),
                             memory_space=pltpu.VMEM)
    flops_tile = 2 * R * R * hd * 2
    cost = pl.CostEstimate(
        flops=flops_tile * tiles * h,
        bytes_accessed=(3 * R * hd + R * R + R * hd) * 4 * tiles * h,
        transcendentals=R * R * tiles * h)
    interpret = jax.default_backend() != "tpu"
    if mask is None:
        return pl.pallas_call(
            functools.partial(_kernel, scale=scale),
            grid=(tiles, h),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, base_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((h, tiles, R, hd), q.dtype),
            cost_estimate=cost, interpret=interpret,
        )(q, k, v, base)
    raise NotImplementedError("masked tiles are dispatched to XLA")


def _can_fuse(q, mask) -> bool:
    # shifted (masked) blocks go through XLA: Mosaic cannot scatter the
    # per-window mask blocks onto the tile diagonal without materialising
    # a [n_patterns, R, R] additive tensor in HBM, which costs more than
    # the fusion saves (measured); unmasked blocks (2 of every 3 in the
    # default Swin config) fuse.
    BW, n, h, hd = q.shape
    if mask is not None:
        return False
    return n <= _ROWS and _ROWS % n == 0


def _fused(q, k, v, bias, mask, scale: float):
    BW, n, h, hd = q.shape
    P = _ROWS // n
    R = P * n
    pad = (-BW) % P
    if pad:
        zeros = jnp.zeros((pad, n, h, hd), q.dtype)
        q, k, v = (jnp.concatenate([t, zeros], 0) for t in (q, k, v))
    tiles = (BW + pad) // P

    def to_kernel(t):  # [BW, n, h, hd] -> [h, tiles, R, hd]
        t = t.reshape(tiles, P, n, h, hd)
        return jnp.moveaxis(t, 3, 0).reshape(h, tiles, R, hd)

    base = _build_base(bias.astype(jnp.float32), n, P)
    m = None if mask is None else mask.astype(jnp.float32).reshape(
        mask.shape[0] // P, P, n, n)
    out = _pallas_impl(to_kernel(q), to_kernel(k), to_kernel(v), base, m,
                       float(scale), n, P)
    out = jnp.moveaxis(out.reshape(h, tiles, P, n, hd), 0, 3)
    out = out.reshape(tiles * P, n, h, hd)
    return out[:BW] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_attention(q, k, v, bias, mask, scale):
    """softmax(q k^T * scale + bias [+ mask]) v, fused per 128-row tile.

    q/k/v: [BW, n, heads, head_dim]; bias: [heads, n, n];
    mask: [nW, n, n] additive shift mask or None (nW must divide BW).
    Returns [BW, n, heads, head_dim].
    """
    from idee_tpu.kernels.runtime import use_pallas

    if use_pallas() and _can_fuse(q, mask):
        return _fused(q, k, v, bias, mask, scale)
    return _xla_impl(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    return window_attention(q, k, v, bias, mask, scale), (q, k, v, bias,
                                                          mask)


def _bwd(scale, res, g):
    q, k, v, bias, mask = res
    # recompute-based backward through the XLA composition
    if mask is None:
        out, vjp = jax.vjp(
            lambda q_, k_, v_, b_: _xla_impl(q_, k_, v_, b_, None, scale),
            q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        dmask = None
    else:
        out, vjp = jax.vjp(
            lambda q_, k_, v_, b_, m_: _xla_impl(q_, k_, v_, b_, m_, scale),
            q, k, v, bias, mask)
        dq, dk, dv, dbias, dmask = vjp(g)
    return dq, dk, dv, dbias, dmask


window_attention.defvjp(_fwd, _bwd)
