# ------------------------------------------------------------------
"""Fused (lax.scan) epochs must reproduce the per-step dispatch path.

The driver's hot loop has two modes (train/driver.py): per-step Python
dispatch (the reference's structure, train_synthetic.py:170-215) and the
TPU-native fused epoch -- one jitted scan over fetch+step
(train/steps.py::make_train_epoch). Both must produce the same training
trajectory: same rng stream, same sample order, same metrics.
"""
# ------------------------------------------------------------------

import jax
import numpy as np
import pytest

from idee_tpu.config import synthetic_config
from idee_tpu.data.fake import make_fake_cube
from idee_tpu.train.driver import train_synthetic


@pytest.fixture(scope="module")
def cube():
    return make_fake_cube(n_vars=3, n_time=40, height=16, width=16, seed=3)


def _run(cube, tmp_path, fused, encoder="CNN_3D"):
    cfg = synthetic_config(
        encoder=encoder,
        in_channels_dynamic=3,
        variables=["var_01", "var_02", "var_03"],
        name=f"fused_{fused}", dir_log=str(tmp_path),
        x_max=16, y_max=16,
        times_train=(1, 28), times_val=(29, 40),
        en_embed_dim=[8, 8], en_depths=[1, 1],
        codebook_dim=8, cls_dim=8,
        batch_size=2, n_epochs=2,
        is_aug=True, is_clima_scale=False,
        device_data=True, fused_epoch=fused, seed=0,
        # small chunk -> the fused arm runs remainder + full-chunk
        # dispatches, so this equality test also pins chunked == per-step
        # (the start-offset rng contract, steps.py::epoch_chunks)
        fused_chunk=4,
    )
    hist = train_synthetic(cfg, train_cube=cube, val_cube=cube)
    state = hist.pop("state")
    return hist, state


def test_fused_epoch_matches_per_step(cube, tmp_path):
    hist_a, state_a = _run(cube, tmp_path / "a", fused=False)
    hist_b, state_b = _run(cube, tmp_path / "b", fused=True)

    # identical rng formula + sample order => the trajectories agree to
    # float tolerance (scan vs loop compile to different but equivalent
    # programs)
    for k in ("train_loss", "val_loss", "train_f1", "val_f1",
              "train_anom_f1", "val_anom_f1"):
        np.testing.assert_allclose(hist_a[k], hist_b[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)

    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)


def test_fused_epoch_runs_without_aug_and_resumes_order(cube, tmp_path):
    """aug off (rng-free fetch) + odd sample count (drop_last) still work
    under the scanned epoch."""
    cfg = synthetic_config(
        encoder="CNN_3D",
        in_channels_dynamic=3,
        variables=["var_01", "var_02", "var_03"],
        name="fused_noaug", dir_log=str(tmp_path),
        x_max=16, y_max=16,
        times_train=(1, 27), times_val=(28, 40),
        en_embed_dim=[8, 8], en_depths=[1, 1],
        codebook_dim=8, cls_dim=8,
        batch_size=2, n_epochs=1,
        is_aug=False, is_clima_scale=False,
        device_data=True, fused_epoch=True, seed=1,
    )
    hist = train_synthetic(cfg, train_cube=cube, val_cube=cube)
    assert np.isfinite(hist["train_loss"][0])
    assert np.isfinite(hist["val_loss"][0])
