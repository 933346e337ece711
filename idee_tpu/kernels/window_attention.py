# ------------------------------------------------------------------
"""Fused windowed attention Pallas kernel.

The Swin backbones' hot op (reference models/encoder/Swin_3D.py:145-178,
SURVEY.md 2.9 N2): per window and head, softmax(q k^T * scale +
rel_pos_bias [+ shift_mask]) v. Windows are tiny (8-32 tokens at the
default window sizes) and with the packed towers there are G = V*heads
bias planes, so the TPU-first formulation folds (window, head) PAIRS into
the 128-row MXU tile: P = 128/n pairs per tile, the whole tile's attention
as ONE [128, hd] x [hd, 128] matmul pair with a block-diagonal additive
base (off-diagonal -1e9, diagonal = that pair's rel-pos bias + its
window's shift mask).

Round-3 redesign (the round-2 kernel LOST to the XLA composition on
silicon, BASELINE.md kernel A/B): at the bench geometry one call is ~30k
tiles, and the round-2 grid ran them one per step, each DMA-ing a 64 KB
[128,128] base for ~0.5 MFLOP of matmul -- per-step overhead and base
traffic swamped the fused-softmax win. This version:

* batches B_T tiles per grid step (one batched dot_general pair);
* sorts tiles into PATTERN GROUPS at trace time so every step needs ONE
  base block, and consecutive steps of a group re-use it (Pallas skips
  the DMA when the block index repeats);
* keeps pairs in a transposed [hd, R] layout so every VMEM block has a
  full 128-lane minor dimension (the round-2 [R, hd=8] layout wasted
  15/16 of each lane tile).

Shifted windows: the (bias, shift-mask) combination per tile repeats with
a small period -- all distinct [R, R] bases are built ONCE per call on
device from the live bias parameter and the trace-time mask bank.

Backward is a second fused kernel over the same grouped tiling: recompute
s/p in VMEM, produce dq/dk/dv tiles and accumulate the rel-pos-bias
gradient into a [G, n, n] block kept resident across the (sequential)
grid.

The XLA composition remains as the off-TPU / fallback path and the
correctness reference in tests.
"""
# ------------------------------------------------------------------

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 128      # MXU tile rows
_NEG = -1e9
_BT = 16         # tiles batched per grid step


def _mask_parts(mask):
    """Normalize the shift-mask argument to trace-time numpy
    (bank [K, n, n], idx [nW]) -- or None.

    Accepts the deduplicated tuple form (compute_shift_mask) or a dense
    [nW, n, n] array (tests / external callers); traced masks return
    NotImplemented so the caller can fall back."""
    if mask is None:
        return None
    if isinstance(mask, tuple):
        bank, idx = mask
        return (np.asarray(bank, np.float32),
                np.asarray(idx, np.int64).reshape(-1))
    if isinstance(mask, jax.core.Tracer):
        return NotImplemented
    mask = np.asarray(mask, np.float32)
    nW, n = mask.shape[0], mask.shape[-1]
    bank, idx = np.unique(mask.reshape(nW, -1), axis=0, return_inverse=True)
    return bank.reshape(-1, n, n), idx.reshape(-1)


def _mask_full(parts):
    """Lazily-gathered dense [nW, n, n] device expression from parts (the
    gather fuses into the consuming add; the dense form never lands as an
    HLO constant -- 436 MB at the CERRA 512x832 geometry)."""
    bank, idx = parts
    return jnp.asarray(bank)[jnp.asarray(idx)]


def _xla_impl(q, k, v, bias, mask, scale: float):
    """Reference composition (reference: Swin_3D.py:145-178).

    q/k/v: [BW, n, G, hd]; bias: [G, n, n]; mask: (bank, idx) tuple /
    [nW, n, n] dense / traced [nW, n, n] / None.
    """
    attn = jnp.einsum("bngd,bmgd->bgnm", q * scale, k)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        parts = _mask_parts(mask)
        mask = mask if parts is NotImplemented else _mask_full(parts)
        BW = q.shape[0]
        nW = mask.shape[0]
        attn = attn.reshape(BW // nW, nW, *attn.shape[1:])
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(BW, *attn.shape[2:])
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bgnm,bmgd->bngd", attn, v)


# ------------------------------------------------------------------
# trace-time tile-pattern construction
# ------------------------------------------------------------------

def _tile_structure(BW: int, G: int, n: int, parts):
    """Pair-folded tiling structure (numpy, trace-time).

    Pairs are ordered (window-major, head-minor): pair = w*G + g. A tile
    holds P = 128//n consecutive pairs. The shift mask is a trace-time
    constant (compute_shift_mask); the rel-pos bias is a PARAMETER, so only
    the structure is computed here -- _build_bases assembles the actual
    [n_pat, R, R] additives on device from the live bias values.

    Returns (mask_bank [K, n, n] np, gg [n_pat, P] i32, mm [n_pat, P] i32,
             pattern_id [tiles] i32, pad_pairs). gg maps (pattern, block) ->
             rel-pos-bias plane; the backward kernel reads it via
             the per-step pattern id, keeping the SMEM tables tiny.
    """
    P = _ROWS // n
    n_pairs = BW * G
    pad = (-n_pairs) % P
    tiles = (n_pairs + pad) // P

    if parts is None:
        mask_type = np.zeros(1, np.int64)
        mask_bank = np.zeros((1, n, n), np.float32)
    else:
        mask_bank, mask_type = parts              # bank [K,n,n], idx [nW]
        mask_type = np.asarray(mask_type, np.int64)

    K = len(mask_bank)
    pair = np.arange(tiles * P, dtype=np.int64)
    w = np.minimum(pair // G, BW - 1)            # padded pairs clamp
    g = pair % G
    nW_eff = 1 if parts is None else mask_type.shape[0]
    mt = mask_type[(w % nW_eff)]
    key = (g * K + mt).reshape(tiles, P)         # per-pair additive id
    tile_keys, pattern_id = np.unique(key, axis=0, return_inverse=True)

    gg = (tile_keys // K).astype(np.int32)       # [n_pat, P]
    mm = (tile_keys % K).astype(np.int32)
    return (mask_bank, gg, mm, pattern_id.astype(np.int32), pad)


def _group_tiles(pattern_id: np.ndarray, bt: int):
    """Sort tiles into pattern groups, each padded to a multiple of bt.

    Returns (order [n_steps*bt] i32, padding slots = tiles (out-of-bounds
             HIGH: jnp.take mode="fill" wraps negatives but fills >= n),
             inv [tiles] i32 sorted position of each original tile,
             step_pattern [n_steps] i32). numpy, trace-time.
    """
    tiles = pattern_id.shape[0]
    order_parts, step_pat = [], []
    for pat in np.unique(pattern_id):
        idx = np.nonzero(pattern_id == pat)[0].astype(np.int32)
        pad = (-idx.shape[0]) % bt
        if pad:
            idx = np.concatenate([idx, np.full(pad, tiles, np.int32)])
        order_parts.append(idx)
        step_pat.extend([pat] * (idx.shape[0] // bt))
    order = np.concatenate(order_parts)
    inv = np.empty(tiles, np.int32)
    valid = order < tiles
    inv[order[valid]] = np.arange(order.shape[0], dtype=np.int32)[valid]
    return order, inv, np.asarray(step_pat, np.int32)


def _build_bases(bias, mask_bank, gg, mm, n: int):
    """Assemble [n_pat, R, R] additive bases on device: -1e9 off the block
    diagonal, bias[g] + shift_mask[m] on it. bias is the live parameter."""
    n_pat, P = gg.shape
    blocks = (bias.astype(jnp.float32)[jnp.asarray(gg)]
              + jnp.asarray(mask_bank)[jnp.asarray(mm)])  # [n_pat, P, n, n]
    # place blocks on the P-diagonal via a broadcast multiply (an
    # .at[:, i, :, i, :].set scatter lowers to a 2.6 ms gather/scatter on
    # TPU; this is one fused elementwise pass over the tiny bank)
    eye = jnp.eye(P, dtype=jnp.float32)[None, :, None, :, None]
    base = (blocks[:, :, :, None, :] * eye
            + _NEG * (1.0 - eye))                  # [n_pat, P, n, P, n]
    return base.reshape(n_pat, P * n, P * n)


# ------------------------------------------------------------------
# forward kernel
# ------------------------------------------------------------------

def _fwd_kernel(pid_ref, q_ref, k_ref, v_ref, base_ref, o_ref, *,
                scale: float):
    # q/k/v blocks: [B_T, hd, R] (transposed pairs); base: [1, R, R]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    # s[b, r, c] = sum_d q[b, d, r] k[b, d, c]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s + base_ref[0][None], axis=-1)
    # o[b, d, r] = sum_c v[b, d, c] p[b, r, c]
    o_ref[...] = jax.lax.dot_general(
        v, p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _fwd_pallas(qp, kp, vp, bases, step_pattern, scale: float):
    """qp/kp/vp: [n_steps*B_T, hd, R] pattern-grouped; bases: [n_pat, R, R];
    step_pattern: [n_steps] i32 (scalar-prefetch, SMEM)."""
    total, hd, R = qp.shape
    n_steps = total // _BT
    tile_spec = pl.BlockSpec((_BT, hd, R), lambda i, pid: (i, 0, 0))
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((1, R, R), lambda i, pid: (pid[i], 0, 0)),
        ],
        out_specs=tile_spec,
    )
    flops = 2 * R * R * hd * 2 * total
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((total, hd, R), qp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * total * R * hd * 4,
            transcendentals=total * R * R),
        interpret=jax.default_backend() != "tpu",
    )(step_pattern, qp, kp, vp, bases)


# ------------------------------------------------------------------
# backward kernel
# ------------------------------------------------------------------

def _bwd_kernel(pid_ref, gg_ref, q_ref, k_ref, v_ref, base_ref, g_ref,
                dq_ref, dk_ref, dv_ref, db_ref, *, scale: float, n: int,
                P: int, G: int):
    i = pl.program_id(0)
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s + base_ref[0][None], axis=-1)
    # dp[b, r, c] = sum_d g[b, d, r] v[b, d, c]
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dq[b, d, r] = scale * sum_c k[b, d, c] ds[b, r, c]
    dq_ref[...] = (scale * jax.lax.dot_general(
        k, ds, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
    # dk[b, d, c] = scale * sum_r q[b, d, r] ds[b, r, c]
    dk_ref[...] = (scale * jax.lax.dot_general(
        q, ds, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)).astype(dk_ref.dtype)
    # dv[b, d, c] = sum_r g[b, d, r] p[b, r, c]
    dv_ref[...] = jax.lax.dot_general(
        g, p, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    # rel-pos-bias gradient: the P diagonal blocks of ds (summed over the
    # step's tiles), accumulated into the resident [G, n, n] output (grid
    # runs sequentially on TPU). Padded slots carry g == 0 -> ds == 0.
    @pl.when(i == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    for p_i in range(P):
        blk = jnp.sum(ds[:, p_i * n:(p_i + 1) * n, p_i * n:(p_i + 1) * n],
                      axis=0)
        # per-pattern head-id table (tiny, SMEM): gg[pattern, p] = G-plane
        g_plane = gg_ref[pid_ref[i], p_i]
        sl = (pl.dslice(g_plane, 1), slice(None), slice(None))
        db_ref[sl] = db_ref[sl] + blk[None]


@functools.partial(jax.jit, static_argnames=("scale", "n", "P", "G"))
def _bwd_pallas(qp, kp, vp, gp, bases, step_pattern, gg, scale: float,
                n: int, P: int, G: int):
    total, hd, R = qp.shape
    n_steps = total // _BT
    tile_spec = pl.BlockSpec((_BT, hd, R), lambda i, pid, gid: (i, 0, 0))
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((1, R, R), lambda i, pid, gid: (pid[i], 0, 0)),
            tile_spec,
        ],
        out_specs=[
            tile_spec, tile_spec, tile_spec,
            # constant index -> resident accumulator, written back at end
            pl.BlockSpec((G, n, n), lambda i, pid, gid: (0, 0, 0)),
        ],
    )
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n=n, P=P, G=G),
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((total, hd, R), f32),
            jax.ShapeDtypeStruct((total, hd, R), f32),
            jax.ShapeDtypeStruct((total, hd, R), f32),
            jax.ShapeDtypeStruct((G, n, n), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * R * R * hd * 5 * total,
            bytes_accessed=8 * total * R * hd * 4,
            transcendentals=total * R * R),
        interpret=jax.default_backend() != "tpu",
    )(step_pattern, gg, qp, kp, vp, bases, gp)


# ------------------------------------------------------------------
# pair folding / dispatch
# ------------------------------------------------------------------

def _to_pairs(t, BW, n, G, hd, pad, order):
    """[BW, n, G, hd] -> [n_steps*B_T, hd, R]: pair = w*G + g rows, tiles
    pattern-grouped by `order` (-1 slots fill with zeros); order=None
    keeps the natural tile order (pure-XLA folded path)."""
    t = jnp.moveaxis(t, 2, 1).reshape(BW * G, n, hd)
    if pad:
        t = jnp.concatenate(
            [t, jnp.zeros((pad, n, hd), t.dtype)], axis=0)
    P = _ROWS // n
    t = jnp.moveaxis(t.reshape(-1, P * n, hd), 1, 2)   # [tiles, hd, R]
    if order is None:
        return t
    return jnp.take(t, order, axis=0, mode="fill", fill_value=0)


def _from_pairs(t, BW, n, G, hd, inv):
    """[n_steps*B_T, hd, R] -> [BW, n, G, hd] (undo grouping via inv;
    inv=None when the tiles were never reordered)."""
    if inv is not None:
        t = jnp.take(t, inv, axis=0)                   # [tiles, hd, R]
    t = jnp.moveaxis(t, 1, 2).reshape(-1, n, hd)[:BW * G]
    return jnp.moveaxis(t.reshape(BW, G, n, hd), 1, 2)


def _xla_folded(q, k, v, bias, mask, scale):
    """Pair-folded attention in PURE XLA (no pallas_call).

    Same trace-time tiling as the Pallas kernels -- P = 128//n
    (window, head) pairs fill one 128-row MXU tile; the [n_pat, R, R]
    additive bases carry bias + shift mask on the block diagonal and
    -1e9 off it, so softmax zeroes cross-pair attention -- but the
    compute is three fusable einsums. Every tensor is laid out
    [tiles, hd, R] / [tiles, R, R] (minor dims 8x128 / 128x128), i.e.
    ZERO tile padding, where the unfolded composition's [BW, n, G, hd]
    temps pad 16x (measured: two 1.83 GB copies of 117 MB of data in the
    batch-2 train step). Backward is plain autodiff: the base gather
    scatter-adds into the bank and _build_bases' VJP extracts the
    block-diagonal bias gradient. softmax accumulates in f32; the
    probability matrix is cast back to the input dtype for the second
    matmul (halves its HBM traffic; values are O(1)).
    """
    BW, n, G, hd = q.shape
    parts = _mask_parts(mask)
    mask_bank, gg, mm, pattern_id, pad = _tile_structure(BW, G, n, parts)
    bases = _build_bases(bias, mask_bank, gg, mm, n)      # [n_pat, R, R]
    base = jnp.take(bases, jnp.asarray(pattern_id), axis=0)

    qp, kp, vp = (_to_pairs(t, BW, n, G, hd, pad, None)   # [tiles, hd, R]
                  for t in (q, k, v))
    s = jnp.einsum("bdr,bdc->brc", qp * scale, kp,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s + base, axis=-1).astype(v.dtype)
    o = jnp.einsum("brc,bdc->bdr", p, vp,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    return _from_pairs(o, BW, n, G, hd, None)


def _xla_lanes(q, k, v, bias, mask, scale):
    """Window-batch-on-LANES attention in pure XLA.

    The third layout family (after the unfolded composition and the
    128-row pair fold): every attention tensor is laid out with the HUGE
    window-batch axis BW minor -- [G, n, hd, BW] / [G, n, n, BW] -- so
    the (8, 128) tile is always fully utilized (BW is 10k-80k at the
    bench geometry) where the unfolded composition's [BW, G, n, hd]
    temps pad their tiny (n<=32, hd=8) minors up to 16x (BASELINE.md
    memory envelope: 12.5 GB of padding in the batch-2 Swin program).

    The contraction axes (hd and the softmax token axis) are tiny -- 8
    both, at the default window sizes -- so the scores are computed as a
    broadcast multiply-reduce over hd on the VPU (elementwise + reduce
    fuse into one pass; the MXU formulation would pad the K=8
    contraction to 128 anyway, i.e. the matmul units cannot go faster
    than the VPU on this shape). Scores accumulate in f32; the
    probability tensor is cast back to the input dtype for the PV
    reduce (values are O(1); halves its HBM traffic). Backward is plain
    autodiff of the same layout. q/k/v: [BW, n, G, hd]; bias [G, n, n];
    mask: trace-time (bank [K, n, n], idx [nW]) pair / dense [nW, n, n] /
    None (reference math: Swin_3D.py:145-178).
    """
    mask_parts = _mask_parts(mask)
    BW, n, G, hd = q.shape
    # [BW, n, G, hd] -> [G, n, hd, BW]; XLA folds the producing
    # reshape/slice chain into this copy, so the padded [BW, n, G, hd]
    # form never lands in HBM
    qt, kt, vt = (jnp.transpose(t, (2, 1, 3, 0)) for t in (q, k, v))
    # score accumulation dtype: bf16 DEFAULT since round 5 — halves the
    # HBM traffic of the [G, n, n, BW] score tensor in fwd and its bwd
    # reloads: measured +6.4% full-step (6.827 vs 6.414 steps/s, real
    # v5e), training-quality-validated by twin Swin 48x48 accuracy arms
    # (best val extremes F1 0.613 bf16 vs 0.626 f32, within the val
    # noise band; driver F1 0.365 vs 0.333 — BASELINE.md round-5 A/B).
    # n <= 32 tokens keeps logit magnitudes small (no overflow risk);
    # IDEE_ATTN_SCORES_DTYPE=f32 opts back out.
    f32 = (jnp.float32
           if os.environ.get("IDEE_ATTN_SCORES_DTYPE") == "f32"
           else jnp.bfloat16)
    s = jnp.sum((qt[:, :, None].astype(f32) * jnp.asarray(scale, f32))
                * kt[:, None].astype(f32), axis=3)        # [G, n, n, BW]
    s = s + bias.astype(f32)[..., None]
    if mask_parts is not None:
        bank, idx = mask_parts
        nW = idx.shape[0]
        # BW is (batch-major, window-minor): window_partition emits
        # [B * nW] with the window index minor; the bank gather fuses
        # into the add (the dense [n, n, nW] mask never materializes)
        bank_t = jnp.asarray(np.transpose(bank, (1, 2, 0)),
                             dtype=f32)  # [n, n, K]
        s = (s.reshape(G, n, n, BW // nW, nW)
             + bank_t[:, :, jnp.asarray(idx)][:, :, None])
        s = s.reshape(G, n, n, BW)
    p = jax.nn.softmax(s, axis=2).astype(v.dtype)
    o = jnp.sum(p[:, :, :, None] * vt[:, None], axis=2)   # [G, n, hd, BW]
    return jnp.transpose(o, (3, 1, 0, 2))


def _can_fuse(q, parts) -> bool:
    BW, n, G, hd = q.shape
    if n > _ROWS or _ROWS % n != 0:
        return False
    if parts is NotImplemented:
        return False  # traced mask: only the unfolded path can take it
    if parts is not None and q.shape[0] % parts[1].shape[0] != 0:
        return False
    return True


def _structure(BW, n, G, mask):
    mask_bank, gg, mm, pattern_id, pad = _tile_structure(
        BW, G, n, _mask_parts(mask))
    order, inv, step_pattern = _group_tiles(pattern_id, _BT)
    return mask_bank, gg, mm, pad, order, inv, step_pattern


def _fused_fwd(q, k, v, bias, mask, scale):
    """Forward-only fused path (no custom vjp; tests)."""
    BW, n, G, hd = q.shape
    mask_bank, gg, mm, pad, order, inv, step_pattern = _structure(
        BW, n, G, mask)
    bases = _build_bases(bias, mask_bank, gg, mm, n)
    order_j = jnp.asarray(order)
    qp, kp, vp = (_to_pairs(t, BW, n, G, hd, pad, order_j)
                  for t in (q, k, v))
    o = _fwd_pallas(qp, kp, vp, bases, jnp.asarray(step_pattern),
                    float(scale))
    return _from_pairs(o, BW, n, G, hd, jnp.asarray(inv))


def window_attention(q, k, v, bias, mask, scale):
    """softmax(q k^T * scale + bias [+ mask]) v, fused per 128-row tile.

    q/k/v: [BW, n, G, hd] (G = folded variable*head planes);
    bias: [G, n, n] (live parameter); mask: a deduplicated trace-time
    numpy (bank [K, n, n], idx [nW]) pair (compute_shift_mask), a dense
    [nW, n, n] additive shift mask, or None. The mask must be a
    trace-time CONSTANT (the Swin modules build it with numpy,
    Swin_3D.py:340-352 semantics) -- a traced mask falls back to the XLA
    composition. Returns [BW, n, G, hd].

    Both passes are fused Pallas kernels: the tile structure (which
    bias/mask pattern each 128-row tile needs, and the pattern-grouped
    tile order) is computed once at trace time and closed over by a
    per-call custom_vjp, so autodiff never sees the structure constants.
    """
    from idee_tpu.kernels.runtime import (attn_lanes_enabled,
                                          attn_pallas_enabled,
                                          attn_xfold_enabled, use_pallas,
                                          window_batch_constraint)

    # under spatial GSPMD, re-establish the (data, space) sharding on the
    # window-batch axis — propagation dies at the window-partition
    # reshape and the attention temps otherwise replicate per device
    # (see runtime.set_spatial_mesh)
    q, k, v = window_batch_constraint(q, k, v)

    parts = _mask_parts(mask)
    foldable = _can_fuse(q, parts)
    if (attn_lanes_enabled() and parts is not NotImplemented
            and (parts is None
                 or q.shape[0] % parts[1].shape[0] == 0)):
        return window_batch_constraint(
            _xla_lanes(q, k, v, bias, parts, scale))
    if foldable and attn_xfold_enabled():
        return window_batch_constraint(
            _xla_folded(q, k, v, bias, mask, scale))
    if not use_pallas() or not attn_pallas_enabled() or not foldable:
        return window_batch_constraint(
            _xla_impl(q, k, v, bias, mask, scale))

    BW, n, G, hd = q.shape
    P = _ROWS // n
    mask_bank, gg, mm, pad, order, inv, step_pattern = _structure(
        BW, n, G, mask)
    order_j = jnp.asarray(order)
    inv_j = jnp.asarray(inv)
    step_pattern_j = jnp.asarray(step_pattern)
    gg_j = jnp.asarray(gg)

    @jax.custom_vjp
    def attend(q, k, v, bias):
        bases = _build_bases(bias, mask_bank, gg, mm, n)
        qp, kp, vp = (_to_pairs(t, BW, n, G, hd, pad, order_j)
                      for t in (q, k, v))
        o = _fwd_pallas(qp, kp, vp, bases, step_pattern_j, float(scale))
        return _from_pairs(o, BW, n, G, hd, inv_j)

    def fwd(q, k, v, bias):
        return attend(q, k, v, bias), (q, k, v, bias)

    def bwd(res, g):
        q, k, v, bias = res
        bases = _build_bases(bias, mask_bank, gg, mm, n)
        qp, kp, vp, gp = (_to_pairs(t, BW, n, G, hd, pad, order_j)
                          for t in (q, k, v, g))
        dq, dk, dv, dbias = _bwd_pallas(
            qp, kp, vp, gp, bases, step_pattern_j, gg_j, float(scale),
            n, P, G)
        # padding slots (order == -1) hold zero g -> zero grads; clamped
        # pairs' extra copies are dropped by the inv gather
        return (_from_pairs(dq, BW, n, G, hd, inv_j).astype(q.dtype),
                _from_pairs(dk, BW, n, G, hd, inv_j).astype(k.dtype),
                _from_pairs(dv, BW, n, G, hd, inv_j).astype(v.dtype),
                dbias.astype(bias.dtype))

    attend.defvjp(fwd, bwd)
    return window_batch_constraint(attend(q, k, v, bias))
