"""Loss functions: hand-computed golden values + parity vs the reference
torch implementations (models/losses.py) when importable."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu import losses


def test_bce_with_logits_matches_definition():
    logits = np.array([-2.0, 0.0, 3.0], np.float32)
    targets = np.array([0.0, 1.0, 1.0], np.float32)
    expected = -(targets * np.log(1 / (1 + np.exp(-logits)))
                 + (1 - targets) * np.log(1 - 1 / (1 + np.exp(-logits))))
    got = np.asarray(losses.bce_with_logits(jnp.asarray(logits),
                                            jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_bce_synthetic_weighting():
    # 3 zeros, 1 one -> hist=[3,1]; w = log((h/4)^-.5 + 1.1)
    pred = jnp.zeros((1, 1, 2, 2))
    target = jnp.array([[[[0.0, 0.0], [0.0, 1.0]]]])
    w0 = np.log((3 / 4) ** -0.5 + 1.1)
    w1 = np.log((1 / 4) ** -0.5 + 1.1)
    per_px = np.log(2.0)  # bce(0 logits, any target) = log 2
    expected = per_px * (3 * w0 + 1 * w1) / 4
    got = float(losses.bce_loss_synthetic(pred, target))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_bce_synthetic_capped_weighting():
    # 3 zeros, 1 one -> frac=[.75,.25]; w = min(1/frac, cap)
    pred = jnp.zeros((1, 1, 2, 2))
    target = jnp.array([[[[0.0, 0.0], [0.0, 1.0]]]])
    per_px = np.log(2.0)
    expected = per_px * (3 * (4 / 3) + 1 * 4.0) / 4
    got = float(losses.bce_loss_synthetic(pred, target, weighting="capped"))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    # the cap binds: with cap=2 the positive weight clips to 2
    expected_cap = per_px * (3 * (4 / 3) + 1 * 2.0) / 4
    got_cap = float(losses.bce_loss_synthetic(pred, target,
                                              weighting="capped",
                                              weight_cap=2.0))
    np.testing.assert_allclose(got_cap, expected_cap, rtol=1e-4)


def test_bce_synthetic_focal():
    # focal(gamma) = alpha_t * (1-p_t)^gamma * bce; at 0 logits p_t = 0.5
    pred = jnp.zeros((1, 1, 2, 2))
    target = jnp.array([[[[0.0, 0.0], [0.0, 1.0]]]])
    per_px = np.log(2.0)
    mod = 0.5 ** 2.0
    expected = per_px * mod * (3 * (4 / 3) + 1 * 4.0) / 4
    got = float(losses.bce_loss_synthetic(pred, target, weighting="focal"))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    # gamma=0 focal == capped (modulating factor -> 1)
    got0 = float(losses.bce_loss_synthetic(pred, target, weighting="focal",
                                           focal_gamma=0.0))
    capped = float(losses.bce_loss_synthetic(pred, target,
                                             weighting="capped"))
    np.testing.assert_allclose(got0, capped, rtol=1e-5)


def test_bce_synthetic_variants_single_class_no_nan():
    pred = jnp.zeros((1, 1, 2, 2))
    target = jnp.zeros((1, 1, 2, 2))
    for weighting in ("capped", "focal"):
        got = float(losses.bce_loss_synthetic(pred, target,
                                              weighting=weighting))
        assert np.isfinite(got)


def test_bce_synthetic_single_class_no_nan():
    pred = jnp.zeros((1, 1, 2, 2))
    target = jnp.zeros((1, 1, 2, 2))
    got = float(losses.bce_loss_synthetic(pred, target))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, np.log(2.0) * np.log(1.0 + 1.1), rtol=1e-4)


def test_anomaly_l1_masks_extremes():
    N, V, C, T, H, W = 1, 2, 3, 2, 2, 2
    z_q = jnp.ones((N, V, C, T, H, W)) * 2.0
    vq0 = jnp.zeros((C,))
    mask = np.zeros((N, H, W), np.float32)
    loss_all = float(losses.anomaly_l1_loss_synthetic(z_q, jnp.asarray(mask), vq0))
    np.testing.assert_allclose(loss_all, 2.0, rtol=1e-6)
    # masking one pixel leaves the weighted mean unchanged for constant input
    mask[0, 0, 0] = 1
    loss_masked = float(losses.anomaly_l1_loss_synthetic(z_q, jnp.asarray(mask), vq0))
    np.testing.assert_allclose(loss_masked, 2.0, rtol=1e-6)
    # fully masked -> 0/0; guard not required by parity (reference divides by
    # zero too) but must not crash
    mask[:] = 1
    val = float(losses.anomaly_l1_loss_synthetic(z_q, jnp.asarray(mask), vq0))
    assert np.isnan(val)


def test_bce_real_world_masked():
    pred = jnp.zeros((1, 3, 3))
    target = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    mask = np.ones((1, 3, 3), np.float32)
    mask[0, 2, :] = 0  # last row invalid
    got = float(losses.bce_loss(pred, target, jnp.asarray(mask)))
    # valid: 4 zeros, 2 ones
    w0 = np.log((4 / 6) ** -0.5 + 1.1)
    w1 = np.log((2 / 6) ** -0.5 + 1.1)
    expected = np.log(2.0) * (4 * w0 + 2 * w1) / 6
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.losses import (Anomaly_L1_loss_synthetic,
                                   BCE_loss_synthetic)
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    target = (rng.random((2, 1, 8, 8)) < 0.2).astype(np.float32)

    t_loss = BCE_loss_synthetic()(torch.from_numpy(pred),
                                  torch.from_numpy(target))
    j_loss = losses.bce_loss_synthetic(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)

    V, C, T = 3, 4, 8
    z_q = rng.normal(size=(2, V, C, T, 8, 8)).astype(np.float32)
    mask = (rng.random((2, 8, 8)) < 0.3).astype(np.float32)
    vq0 = rng.normal(size=(1, C)).astype(np.float32)

    crit = Anomaly_L1_loss_synthetic(n_dynamic=V, delta_t=T, dim=C)
    t_loss = crit(torch.from_numpy(z_q), torch.from_numpy(mask),
                  torch.from_numpy(vq0))
    j_loss = losses.anomaly_l1_loss_synthetic(
        jnp.asarray(z_q), jnp.asarray(mask), jnp.asarray(vq0[0]))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)
