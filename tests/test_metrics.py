"""Evaluators + anomaly collector: semantics vs direct numpy computation."""

import numpy as np

from idee_tpu.train.metrics import (AnomalyCollector,
                                    EvaluatorAnomalySynthetic,
                                    EvaluatorSynthetic)
from idee_tpu.train.steps import extreme_counts


def test_evaluator_synthetic_counts():
    rng = np.random.default_rng(0)
    pred = (rng.random((4, 1, 8, 8)) < 0.3).astype(np.float32)
    gt = (rng.random((4, 1, 8, 8)) < 0.3).astype(np.float32)
    ev = EvaluatorSynthetic()
    ev(pred, gt)
    ev.get_results(0.0, 0.0)
    tp = np.sum((pred == 1) & (gt == 1))
    assert ev.correct[0] == tp
    assert ev.predicted[0] == np.sum(pred == 1)
    np.testing.assert_allclose(
        ev.iou[0], tp / np.sum((pred == 1) | (gt == 1)))
    prec = tp / np.sum(pred == 1)
    rec = tp / (np.sum(gt == 1) + 1e-6)
    np.testing.assert_allclose(ev.F1[0], 2 * prec * rec / (prec + rec),
                               rtol=1e-6)


def test_device_counts_match_host_evaluator():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    pred = (rng.random((2, 1, 8, 8)) < 0.4).astype(np.float32)
    gt = (rng.random((2, 1, 8, 8)) < 0.4).astype(np.float32)

    ev_host = EvaluatorSynthetic()
    ev_host(pred, gt)
    ev_dev = EvaluatorSynthetic()
    ev_dev.update_counts(
        {k: int(v) for k, v in
         extreme_counts(jnp.asarray(pred), jnp.asarray(gt)).items()})
    assert ev_host.correct[0] == ev_dev.correct[0]
    assert ev_host.seen[0] == ev_dev.seen[0]
    assert ev_host.iou_de[0] == ev_dev.iou_de[0]
    assert ev_host.predicted[0] == ev_dev.predicted[0]
    assert ev_host.seen_all == ev_dev.seen_all


def test_anomaly_collector_timeline():
    """Scatter-add semantics (reference: utils/utils_train.py:547-554):
    a window at timestep t covers slots [t-dt+1, t] after time re-flip."""
    V, T, H, W = 2, 12, 2, 2
    dt = 4
    timestep = np.arange(1, T + 1, dtype=np.float32)
    col = AnomalyCollector((V, T, H, W), timestep, dt)

    # one sample predicted at absolute timestep 4 (index 3)
    anomaly = np.zeros((1, V, dt, H, W), np.float32)
    anomaly[0, :, 0] = 1.0  # index 0 = target week (most recent)
    col(anomaly, np.array([[4.0]]))
    # after flip, the target week lands on slot 3
    assert col.anomaly[0, 3].sum() == H * W
    assert col.anomaly[0, 0:3].sum() == 0
    np.testing.assert_array_equal(col.anomaly_counter[0, 0:4], 1)
    assert col.anomaly_counter[0, 4:].sum() == 0

    col.majority_vote()
    np.testing.assert_array_equal(col.anomaly[0, 3], np.ones((H, W)))
    np.testing.assert_array_equal(col.anomaly[0, 2], np.zeros((H, W)))
    # uncovered slots stay NaN (reference masked assignment semantics)
    assert np.isnan(col.anomaly[0, 5]).all()


def test_majority_vote_threshold():
    V, T, H, W = 1, 6, 1, 1
    dt = 2
    col = AnomalyCollector((V, T, H, W), np.arange(1, 7, dtype=np.float32), dt)
    # slot 1 (timestep 2) voted by two windows: one yes, one no -> mean 0.5 -> 1
    a_yes = np.ones((1, V, dt, H, W), np.float32)
    a_no = np.zeros((1, V, dt, H, W), np.float32)
    col(a_yes, np.array([[2.0]]))
    col(a_no, np.array([[3.0]]))
    col.majority_vote()
    assert col.anomaly[0, 1, 0, 0] == 1.0  # >= 0.5 -> 1


def test_evaluator_anomaly_synthetic():
    rng = np.random.default_rng(2)
    # [T, V, H, W] layout (reference swaps axes before the call)
    pred = (rng.random((6, 3, 4, 4)) < 0.4).astype(np.float32)
    gt = (rng.random((6, 3, 4, 4)) < 0.4).astype(np.float32)
    ev = EvaluatorAnomalySynthetic(variables=["a", "b", "c"])
    ev(pred, gt)
    ev.get_results()
    for v in range(3):
        tp = np.sum((pred[:, v] == 1) & (gt[:, v] == 1))
        fp = np.sum((pred[:, v] == 1) & (gt[:, v] == 0))
        fn = np.sum((pred[:, v] == 0) & (gt[:, v] == 1))
        assert ev.correct_pos[v] == tp
        assert ev.FP[v] == fp
        assert ev.FN[v] == fn
        np.testing.assert_allclose(
            ev.iou_pos[v], tp / np.sum((pred[:, v] == 1) | (gt[:, v] == 1)))


def test_device_vote_scatter_matches_host_collector():
    """steps._scatter_votes + majority_vote_from_device must equal the host
    AnomalyCollector pipeline (reference semantics)."""
    import jax.numpy as jnp

    from idee_tpu.train.metrics import majority_vote_from_device
    from idee_tpu.train.steps import _scatter_votes

    rng = np.random.default_rng(3)
    V, T, H, W, dt = 2, 12, 4, 4, 4
    timestep = np.arange(1, T + 1, dtype=np.float32)

    col = AnomalyCollector((V, T, H, W), timestep, dt)
    vs = jnp.zeros((V, T, H, W), jnp.uint8)
    vc = jnp.zeros((T,), jnp.int32)

    for end in [4, 7, 7, 11]:  # absolute timesteps, some repeated
        anom = (rng.random((1, V, dt, H, W)) < 0.5).astype(np.float32)
        col(anom, np.array([[float(end)]]))
        vs, vc = _scatter_votes(vs, vc, jnp.asarray(anom),
                                jnp.array([end - 1], jnp.int32), dt)

    col.majority_vote()
    dev = majority_vote_from_device(np.asarray(vs), np.asarray(vc))
    np.testing.assert_array_equal(np.nan_to_num(dev, nan=-1),
                                  np.nan_to_num(col.anomaly, nan=-1))
