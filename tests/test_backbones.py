"""Swin-3D and Mamba backbones: window machinery, masks, scan semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.nn.mamba import Mamba, MambaSSM, selective_scan
from idee_tpu.nn.swin3d import (Swin_3D, compute_shift_mask, get_window_size,
                                relative_position_index, window_partition,
                                window_reverse)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8, 8, 5)))
    ws = (2, 4, 4)
    w = window_partition(x, ws)
    assert w.shape == (2 * 2 * 2 * 2, 32, 5)
    back = window_reverse(w, ws, 2, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_layout():
    """Token 0 of window 0 must be the (0,0,0) voxel; window grid is
    (D/wd, H/wh, W/ww) row-major (reference: Swin_3D.py:45-57)."""
    D, H, W = 2, 4, 4
    x = jnp.arange(D * H * W, dtype=jnp.float32).reshape(1, D, H, W, 1)
    ws = (2, 2, 2)
    w = np.asarray(window_partition(x, ws))[..., 0]
    # first window: d in {0,1}, h in {0,1}, w in {0,1}
    expected = [x[0, d, h, ww, 0] for d in range(2) for h in range(2)
                for ww in range(2)]
    np.testing.assert_array_equal(w[0], np.asarray(expected))


def test_get_window_size_shrinks():
    ws, ss = get_window_size((8, 2, 2), (2, 4, 4), (1, 2, 2))
    assert ws == (2, 2, 2)
    assert ss == (1, 0, 0)


def test_relative_position_index_range():
    ws = (2, 4, 4)
    rpi = relative_position_index(ws)
    n = 2 * 4 * 4
    assert rpi.shape == (n, n)
    table = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    assert rpi.min() >= 0 and rpi.max() < table
    # diagonal = self-relative position, a single shared index
    assert len(set(np.diag(rpi).tolist())) == 1


def test_shift_mask_blocks_cross_boundary():
    ws, ss = (1, 4, 4), (0, 2, 2)
    parts = compute_shift_mask(1, 8, 8, ws, ss)
    assert parts is not None
    bank, idx = parts   # deduplicated bank + per-window row index
    mask = bank[idx]
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) == {-100.0, 0.0}
    # the first window (interior) has no boundary crossings
    np.testing.assert_array_equal(mask[0], np.zeros((16, 16)))
    # shifted windows must mask something
    assert (mask[-1] == -100.0).any()


def test_no_shift_no_mask():
    assert compute_shift_mask(2, 8, 8, (2, 4, 4), (0, 0, 0)) is None


def test_swin_encoder_contract():
    model = Swin_3D(in_vars=2, in_chans=1, embed_dim=[8, 8], depths=[2, 1],
                    num_heads=[2, 2], window_size=[(2, 4, 4), (8, 1, 1)])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 8, 12, 12))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (1, 2, 8, 8, 12, 12)
    # per-variable towers have unshared params, stacked on the variable
    # axis of every GroupedDense/GroupedConv3d kernel (packed layout)
    qkv = v["params"]["stage0"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.shape[0] == 2  # stacked on the variable axis


def test_swin_handles_non_multiple_grid():
    """Grid not divisible by window -> internal padding must be transparent."""
    model = Swin_3D(in_vars=1, in_chans=1, embed_dim=[8], depths=[2],
                    num_heads=[2], window_size=[(2, 4, 4)])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1, 8, 10, 10))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (1, 1, 8, 8, 10, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_selective_scan_matches_sequential():
    """associative_scan == step-by-step recurrence."""
    rng = np.random.default_rng(0)
    B, L, d, n = 2, 16, 4, 2
    u = rng.normal(size=(B, L, d)).astype(np.float32)
    delta = np.abs(rng.normal(size=(B, L, d))).astype(np.float32)
    A = -np.abs(rng.normal(size=(d, n))).astype(np.float32)
    Bm = rng.normal(size=(B, L, n)).astype(np.float32)
    C = rng.normal(size=(B, L, n)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    z = rng.normal(size=(B, L, d)).astype(np.float32)

    got = np.asarray(selective_scan(*map(jnp.asarray, (u, delta, A, Bm, C, D, z))))

    h = np.zeros((B, d, n), np.float32)
    want = np.zeros((B, L, d), np.float32)
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A)
        dBu = delta[:, t, :, None] * Bm[:, t, None, :] * u[:, t, :, None]
        h = dA * h + dBu
        want[:, t] = np.einsum("bdn,bn->bd", h, C[:, t]) + u[:, t] * D
    want = want * (z / (1 + np.exp(-z)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mamba_ssm_causality():
    """Output at token t must not depend on tokens > t."""
    ssm = MambaSSM(d_model=8, d_state=2, d_conv=3, expand=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 8))
    v = ssm.init({"params": jax.random.PRNGKey(0)}, x)
    y1 = np.asarray(ssm.apply(v, x))
    x2 = x.at[0, 8:].set(99.0)  # perturb the future
    y2 = np.asarray(ssm.apply(v, x2))
    np.testing.assert_allclose(y1[0, :8], y2[0, :8], rtol=1e-5, atol=1e-6)
    assert not np.allclose(y1[0, 8:], y2[0, 8:])


def test_mamba_encoder_contract():
    model = Mamba(in_vars=2, in_chans=1, embed_dim=[8, 8], depths=[2, 1],
                  window_size=[(2, 4, 4), (8, 1, 1)],
                  d_state=[1, 1], d_conv=[3, 3], expand=[1, 1])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 8, 8, 8))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (1, 2, 8, 8, 8, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_grouped_layernorm_bf16_matches_f32():
    """The bf16 fast path (round-3 HBM fix) must track the f32 math.

    GroupedLayerNorm3d keeps its [.., V*C] intermediates in the input
    dtype with f32 MXU accumulation (nn/layers.py); for bf16 inputs only
    the final rounding of already-normalized values may differ from an
    all-f32 pass. Guards the memory fix against silent numeric drift.
    """
    from idee_tpu.nn.layers import GroupedLayerNorm3d

    rng = np.random.default_rng(0)
    V, C = 6, 16
    x64 = rng.normal(3.0, 5.0, (2, 4, 5, 7, V * C))
    ln = GroupedLayerNorm3d(n_groups=V, features=C)
    params = ln.init(jax.random.key(0), jnp.zeros((1, 1, 1, 1, V * C)))

    y32 = ln.apply(params, jnp.asarray(x64, jnp.float32))
    y16 = ln.apply(params, jnp.asarray(x64, jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    # normalized values are O(1); bf16 has ~3 decimal digits
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), atol=2e-2, rtol=2e-2)
    # and the f32 path itself is exact vs a plain per-group numpy norm
    xg = x64.reshape(2, 4, 5, 7, V, C)
    mu = xg.mean(-1, keepdims=True)
    var = ((xg - mu) ** 2).mean(-1, keepdims=True)
    ref = ((xg - mu) / np.sqrt(var + 1e-5)).reshape(x64.shape)
    np.testing.assert_allclose(np.asarray(y32), ref, atol=1e-4)
