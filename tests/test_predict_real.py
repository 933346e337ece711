"""Real-world prediction-export CLI (scripts/predict_real.py): restored
checkpoint -> npz with drought-probability maps, 0.35-rule masks over the
test valid mask, and the chronological driver bits per sample."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from idee_tpu.data.fake import write_fake_reanalysis  # noqa: E402
from idee_tpu.data.reanalysis import ReanalysisDataset, cerra_spec  # noqa: E402


@pytest.fixture(scope="module")
def cerra_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cerra_pred")
    main, noaa = str(root / "CERRA"), str(root / "NOAA")
    write_fake_reanalysis(main, noaa, years=("1990", "1991"), height=16,
                          width=16)
    return main, noaa


def test_predict_real_export(cerra_tree, tiny_config, tmp_path):
    from predict_real import predict_real

    from idee_tpu.models import build_model
    from idee_tpu.train.checkpoint import CheckpointManager
    from idee_tpu.train.state import create_train_state

    main, noaa = cerra_tree
    spec = cerra_spec(8)
    spec.grid_height = 16
    spec.grid_width = 16
    ds = ReanalysisDataset(
        spec=spec, root_main=main, root_noaa=noaa, delta_t=8,
        variables=["t2m", "tp", "al"], variables_static=[],
        years=["1991"], is_aug=False, is_norm=True,
        x_min=0, x_max=16, y_min=0, y_max=16)

    cfg = tiny_config.replace(
        name="pred_real_test", dir_log=str(tmp_path),
        in_channels=2, delta_t=8, threshold=26.0, batch_size=2)
    model = build_model(cfg)
    x0 = ds[0]["x"][None].repeat(cfg.batch_size, 0)
    state = create_train_state(cfg, model, x0)
    ckpt = CheckpointManager(cfg.log_dir)
    ckpt.save("best_F1_model", state, epoch=0)

    out = str(tmp_path / "pred_real.npz")
    payload = predict_real(
        cfg, "CERRA",
        os.path.join(cfg.log_dir, "model_checkpoints", "best_F1_model"),
        out, test_ds=ds)

    N, V = len(ds), 3
    assert payload["drought_prob"].shape == (N, 16, 16)
    assert payload["anomaly"].shape == (N, V, cfg.delta_t, 16, 16)
    assert payload["valid_mask"].shape == (N, 16, 16)
    p = payload["drought_prob"]
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    # the 0.35 decision rule only fires on valid pixels
    m = payload["drought_mask"].astype(bool)
    assert not m[payload["valid_mask"] == 0].any()
    np.testing.assert_array_equal(
        m, (p > 0.35) & (payload["valid_mask"] > 0))
    # name codes are <year><www> of the target week, strictly increasing
    codes = payload["name_code"]
    assert (codes // 1000 == 1991).all()
    assert (np.diff(codes) > 0).all()
    # round-trip
    z = np.load(out)
    np.testing.assert_array_equal(z["name_code"], codes)
