"""Prediction-export CLI: restored checkpoint -> npz artifact with the
extreme-probability timeline and the majority-vote driver maps
(scripts/predict_synthetic.py; beyond-parity serving surface — the
reference's test_synthetic.py computes metrics but exports nothing)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_predict_export_roundtrip(tiny_config, fake_cube, tmp_path):
    from predict_synthetic import predict_synthetic

    from idee_tpu.models import build_model
    from idee_tpu.train.checkpoint import CheckpointManager
    from idee_tpu.train.state import create_train_state

    cfg = tiny_config.replace(
        name="pred_test", dir_log=str(tmp_path),
        times_test=(41, 56), is_clima_scale=False)

    model = build_model(cfg)
    x0 = np.zeros((cfg.batch_size, 3, 1, cfg.delta_t, 16, 16), np.float32)
    state = create_train_state(cfg, model, x0)
    ckpt = CheckpointManager(cfg.log_dir)
    ckpt.save("best_F1_model", state, epoch=0)

    out = str(tmp_path / "pred.npz")
    payload = predict_synthetic(
        cfg, os.path.join(cfg.log_dir, "model_checkpoints", "best_F1_model"),
        out, cube=fake_cube.time_slice(41, 56))

    T_sel = 56 - 41 + 1
    V = len(cfg.variables)
    assert payload["extreme_prob"].shape == (T_sel, 16, 16)
    assert payload["anomaly"].shape == (V, T_sel, 16, 16)
    # exactly the target weeks are covered (one per sample window)
    covered = ~np.isnan(payload["extreme_prob"][:, 0, 0])
    assert covered.sum() == T_sel - cfg.delta_t + 1
    assert not covered[: cfg.delta_t - 1].any()
    p = payload["extreme_prob"][covered]
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    # mask consistent with prob at the 0.5 decision rule
    np.testing.assert_array_equal(
        payload["extreme_mask"][covered], (p > 0.5).astype(np.uint8))
    # anomaly timeline: covered slots are hard {0,1} votes
    a = payload["anomaly"]
    a_cov = a[~np.isnan(a)]
    assert np.isin(a_cov, (0.0, 1.0)).all()

    z = np.load(out)
    np.testing.assert_array_equal(z["timestep"],
                                  np.arange(41, 57, dtype=np.int32))
