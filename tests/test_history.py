# ------------------------------------------------------------------
"""history.json must survive auto-resume and torn writes.

VERDICT r4 weak #3: the round-4 CERRA run's history.json held only the
resumed session's epoch (epochs 1-2 survived only in log_file.txt)
because each session rewrote the file from its own in-memory list.
train/history.py seeds from the prior session's file and writes
atomically; these tests pin both behaviors, including through the real
synthetic driver across two sessions (the reference has no scalar
history at all — utils/utils_train.py logs to file only).
"""
# ------------------------------------------------------------------

import json
import os

import numpy as np
import pytest

from idee_tpu.train.history import flush_history, seed_history


def test_seed_history_fresh_run(tmp_path):
    hist = seed_history(str(tmp_path), ["a", "b"], 0)
    assert hist == {"a": [], "b": []}


def test_seed_history_merges_prior_session(tmp_path):
    flush_history(str(tmp_path), {"a": [1.0, 2.0], "b": [3.0, 4.0]})
    hist = seed_history(str(tmp_path), ["a", "b"], 2)
    assert hist == {"a": [1.0, 2.0], "b": [3.0, 4.0]}


def test_seed_history_truncates_stale_epochs(tmp_path):
    # resuming from `latest` after epoch 1 re-runs epoch 2+: any later
    # entries in the old file are stale and must be dropped
    flush_history(str(tmp_path), {"a": [1.0, 2.0, 3.0]})
    hist = seed_history(str(tmp_path), ["a"], 1)
    assert hist == {"a": [1.0]}


def test_seed_history_tolerates_missing_and_corrupt(tmp_path):
    assert seed_history(str(tmp_path), ["a"], 3) == {"a": []}
    with open(os.path.join(str(tmp_path), "history.json"), "w") as fh:
        fh.write('{"a": [1.0')  # torn write from a pre-fix session
    assert seed_history(str(tmp_path), ["a"], 3) == {"a": []}


def test_flush_history_is_atomic_and_drops_state(tmp_path):
    flush_history(str(tmp_path), {"a": [1.0], "state": object()})
    path = os.path.join(str(tmp_path), "history.json")
    with open(path) as fh:
        assert json.load(fh) == {"a": [1.0]}
    assert not os.path.exists(path + ".tmp")


def test_driver_history_spans_resume_sessions(tmp_path):
    """Session 1 trains 2 epochs; session 2 resumes (same log dir, orbax
    `latest`) and trains to 3.  The flushed history must hold all 3
    epochs, with the first two numerically identical to session 1's."""
    from idee_tpu.config import synthetic_config
    from idee_tpu.data.fake import make_fake_cube
    from idee_tpu.train.driver import train_synthetic

    cube = make_fake_cube(n_vars=3, n_time=40, height=16, width=16, seed=3)

    def cfg(n_epochs):
        return synthetic_config(
            encoder="CNN_3D",
            in_channels_dynamic=3,
            variables=["var_01", "var_02", "var_03"],
            name="resume_hist", dir_log=str(tmp_path),
            x_max=16, y_max=16,
            times_train=(1, 28), times_val=(29, 40),
            en_embed_dim=[8, 8], en_depths=[1, 1],
            codebook_dim=8, cls_dim=8,
            batch_size=2, n_epochs=n_epochs,
            is_aug=True, is_clima_scale=False,
            device_data=True, seed=0,
        )

    h1 = train_synthetic(cfg(2), train_cube=cube, val_cube=cube)
    h2 = train_synthetic(cfg(3), train_cube=cube, val_cube=cube)
    assert len(h2["train_loss"]) == 3, "resume lost prior-session epochs"
    np.testing.assert_allclose(h2["train_loss"][:2], h1["train_loss"][:2])

    log_dir = os.path.join(str(tmp_path), "resume_hist")
    with open(os.path.join(log_dir, "history.json")) as fh:
        flushed = json.load(fh)
    assert len(flushed["val_f1"]) == 3
    np.testing.assert_allclose(flushed["train_loss"], h2["train_loss"][:3])
