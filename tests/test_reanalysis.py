"""CERRA / ERA5-Land pipeline: week indexing with rollover + fallback,
VHI label engine, normalization channels, end-to-end real-world train step."""

import os

import numpy as np
import pytest

pytest.importorskip("h5py")

from idee_tpu.data.fake import write_fake_reanalysis
from idee_tpu.data.reanalysis import (ReanalysisDataset, build_week_index,
                                      cerra_spec, era5_land_spec)


@pytest.fixture(scope="module")
def cerra_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cerra")
    main, noaa = str(root / "CERRA"), str(root / "NOAA")
    write_fake_reanalysis(main, noaa, years=("1990", "1991"), height=16,
                          width=16, missing_weeks=(("1991", 5),))
    return main, noaa


def _ds(main, noaa, **kw):
    spec = cerra_spec(kw.get("delta_t", 4))
    # tiny fixture grid: override geometry
    spec.grid_height = 16
    spec.grid_width = 16
    defaults = dict(
        spec=spec, root_main=main, root_noaa=noaa, delta_t=4,
        variables=["t2m", "tp", "al"], variables_static=[],
        years=["1991"], is_aug=False, is_norm=False,
        x_min=0, x_max=16, y_min=0, y_max=16,
    )
    defaults.update(kw)
    return ReanalysisDataset(**defaults)


def test_week_index_rollover(cerra_tree):
    main, noaa = cerra_tree
    idx = build_week_index(main, noaa, ["1991"], delta_t=4,
                           skip_rules={})
    # first target week of 1991 is week 1; its window must roll into 1990
    files_main, files_noaa, weeks = idx[0]
    assert weeks.tolist() == [1.0, 52.0, 51.0, 50.0]
    assert os.sep + "1991" + os.sep in files_main[0]
    assert all(os.sep + "1990" + os.sep in f for f in files_main[1:])
    assert len(idx) == 51  # 52 minus the missing NOAA week 5


def test_week_index_missing_week_fallback(cerra_tree):
    """1991 week 5 has no NOAA file: (a) no sample targets week 5,
    (b) windows crossing week 5 fall back to the previous entry's files
    (reference: CERRA_dataset.py:255-256)."""
    main, noaa = cerra_tree
    idx = build_week_index(main, noaa, ["1991"], delta_t=4, skip_rules={})
    weeks_targets = [w[2][0] for w in idx]
    assert 5.0 not in weeks_targets
    assert len(idx) == 51
    # the week-6 window covers weeks 6,5,4,3; week 5's NOAA entry must be a
    # fallback copy of an adjacent week's file list
    sample = next(w for w in idx if w[2][0] == 6.0)
    files_noaa = sample[1]
    assert files_noaa[1] == files_noaa[0]  # fell back to week 6's files
    # CERRA (non-NOAA) file for week 5 is still the real week-5 file
    assert "1991005.nc" in sample[0][1]


def test_skip_rules(cerra_tree):
    main, noaa = cerra_tree
    idx = build_week_index(main, noaa, ["1990", "1991"], delta_t=4,
                           skip_rules={1990: (40, 52), 1991: (1, 17)})
    targets = [(f[2][0], os.path.basename(os.path.dirname(f[0][0])))
               for f in idx]
    for week, year in targets:
        if year == "1990":
            assert week >= 40
        else:
            assert week <= 17


def test_item_shapes_and_channels(cerra_tree):
    main, noaa = cerra_tree
    ds = _ds(main, noaa)
    it = ds[10]
    assert it["x"].shape == (3, 2, 4, 16, 16)
    for k in ("mask_extreme", "mask_extreme_loss", "mask_cold_surface",
              "mask_cold_surface_loss", "mask_sea", "mask_no_vegetation"):
        assert it[k].shape == (16, 16), k
    assert set(np.unique(it["mask_extreme"])) <= {0.0, 1.0}


def test_vhi_label_engine(cerra_tree):
    """Drought = alpha*VCI+(1-alpha)*TCI < thr, y-flipped, minus
    cold/noveg/water (reference: CERRA_dataset.py:452-518)."""
    import h5py

    main, noaa = cerra_tree
    ds = _ds(main, noaa, alpha=0.5, threshold=26.0)
    files_main, files_noaa, weeks = ds.files[10]
    with h5py.File(files_noaa[0][0], "r") as f:
        vci, tci = f["VCI"][()], f["TCI"][()]
        cold = f["mask_cold_surface"][()]
    vhi = 0.5 * vci + 0.5 * tci
    expected = (np.flip(vhi, 0) < 26.0).astype(np.float32)
    cold_f = np.flip(cold, 0)
    expected[cold_f == 1] = 0
    expected[ds.mask_no_vegetation == 1] = 0
    expected[ds.mask_water == 1] = 0
    got, got_cold = ds.generate_mask(files_noaa[0], thr=26.0)
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(got_cold, cold_f)


def test_global_normalization_channels(cerra_tree):
    """mean channel: (x - mean)/std; std channel: x/std
    (reference: CERRA_dataset.py:618-620)."""
    main, noaa = cerra_tree
    raw = _ds(main, noaa, is_norm=False)[10]["x"]
    ds = _ds(main, noaa, is_norm=True, is_clima_scale=False)
    it = ds[10]
    m, s = ds._mean_var, ds._std_var
    exp0 = np.clip((raw[:, 0] - m[:, None, None, None])
                   / s[:, None, None, None], -10, 10)
    exp1 = np.clip(raw[:, 1] / s[:, None, None, None], -10, 10)
    np.testing.assert_allclose(it["x"][:, 0], exp0, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(it["x"][:, 1], exp1, rtol=1e-3, atol=1e-6)


def test_climatology_normalization(cerra_tree):
    main, noaa = cerra_tree
    raw = _ds(main, noaa, is_norm=False)[10]["x"]
    ds = _ds(main, noaa, is_norm=True, is_clima_scale=True)
    it = ds[10]
    weeks = ds.files[10][2]
    wk = [int(w) - 1 for w in weeks]
    mean = np.flip(ds._clima_mean[:, :, wk], -2)
    std = np.flip(ds._clima_std[:, :, wk], -2)
    exp = np.clip((raw - mean) / std, -10, 10)
    exp[np.isnan(exp)] = 0.0
    np.testing.assert_allclose(it["x"], exp, rtol=1e-4, atol=1e-5)


def test_cold_loss_excludes_target_step(cerra_tree):
    """mask_cold_surface_loss sums steps 1..delta_t-1 only
    (reference: CERRA_dataset.py:594-595)."""
    main, noaa = cerra_tree
    ds = _ds(main, noaa)
    it = ds[10]
    files_main, files_noaa, _ = ds.files[10]
    colds = [ds.generate_mask(files_noaa[d], 35)[1] for d in range(4)]
    expected = np.clip(np.stack(colds[1:]).sum(0), 0, 1)
    np.testing.assert_array_equal(it["mask_cold_surface_loss"], expected)


def test_era5_land_tree(tmp_path):
    from idee_tpu.config import CORDEX_REGIONS

    main, noaa = str(tmp_path / "ERA5"), str(tmp_path / "NOAA")
    write_fake_reanalysis(main, noaa, years=("1999", "2000"), height=16,
                          width=16, era5_region="EUR-11")
    spec = era5_land_spec("EUR-11", 4)
    spec.grid_height = 16
    spec.grid_width = 16
    ds = ReanalysisDataset(
        spec, os.path.join(main, "EUR-11"), os.path.join(noaa, "EUR-11"),
        delta_t=4, variables=["t2m", "tp", "al"], years=["2000"],
        is_norm=True, is_clima_scale=False,
        x_min=0, x_max=16, y_min=0, y_max=16)
    it = ds[5]
    assert it["x"].shape == (3, 2, 4, 16, 16)
    # ERA5 water mask = 1 - lsm (continuous lsm, no binarize before invert)
    assert ds.mask_water.min() >= 0.0 and ds.mask_water.max() <= 1.0


def test_real_train_step(cerra_tree, tiny_config):
    """End-to-end: real-world batch through the jitted train step."""
    import jax
    import jax.numpy as jnp

    from idee_tpu.data.loader import collate
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps_real import (init_epoch_metrics_real,
                                           make_train_step_real)

    main, noaa = cerra_tree
    ds = _ds(main, noaa, is_norm=True, is_clima_scale=False, delta_t=8)
    cfg = tiny_config.replace(in_channels=2, delta_t=8, threshold=26.0)
    model = build_model(cfg)
    batch = jax.tree.map(jnp.asarray, collate([ds[0], ds[1]]))
    state = create_train_state(cfg, model, batch["x"], steps_per_epoch=5)
    step = make_train_step_real(model, cfg, donate=False)
    metrics = init_epoch_metrics_real()
    state, metrics = step(state, metrics, batch)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss_sums"]["loss"])
    assert int(m["counts"]["seen_all"]) <= 2 * 16 * 16
    assert int(m["counts"]["seen"].sum()) == int(m["counts"]["seen_all"])


def test_real_device_loader_matches_host(cerra_tree):
    """RealDeviceLoader's on-device window assembly must reproduce the host
    DataLoader batches exactly (aug off; shuffle off for aligned order)."""
    import jax

    from idee_tpu.data.device import RealDeviceLoader
    from idee_tpu.data.loader import DataLoader

    main, noaa = cerra_tree
    ds = _ds(main, noaa, is_norm=True, is_clima_scale=False, delta_t=8)
    host = DataLoader(ds, 2, shuffle=False, drop_last=True, seed=0)
    dev = RealDeviceLoader(ds, 2, shuffle=False, drop_last=True, seed=0,
                           with_eval_masks=True)
    assert len(host) == len(dev)
    for i, (hb, db) in enumerate(zip(host, dev)):
        db = jax.device_get(db)
        for k in ("x", "mask_extreme", "mask_extreme_loss",
                  "mask_cold_surface", "mask_cold_surface_loss",
                  "mask_sea", "mask_no_vegetation"):
            np.testing.assert_allclose(
                np.asarray(hb[k], np.float32), np.asarray(db[k], np.float32),
                rtol=1e-5, atol=1e-6, err_msg=f"batch {i} key {k}")
        if i >= 3:
            break


def test_real_device_loader_clima_norm_matches_host(cerra_tree):
    """Per-week climatology normalization is separable across the window;
    the device path must match the host's stacked-window normalization."""
    import jax

    from idee_tpu.data.device import RealDeviceLoader
    from idee_tpu.data.loader import DataLoader

    main, noaa = cerra_tree
    ds = _ds(main, noaa, is_norm=True, is_clima_scale=True, delta_t=4)
    host = DataLoader(ds, 2, shuffle=False, drop_last=True, seed=0)
    dev = RealDeviceLoader(ds, 2, shuffle=False, drop_last=True, seed=0)
    hb = next(iter(host))
    db = jax.device_get(next(iter(dev)))
    np.testing.assert_allclose(np.asarray(hb["x"], np.float32),
                               np.asarray(db["x"], np.float32),
                               rtol=1e-5, atol=1e-6)


def test_real_fused_epoch_matches_per_step(cerra_tree, tmp_path):
    """Real-pipeline analogue of test_fused_epoch: the fused lax.scan epoch
    (steps_real.make_train_epoch_real) must reproduce the per-step path."""
    from idee_tpu.config import Config
    from idee_tpu.train.driver_real import train_real

    main, noaa = cerra_tree

    def run(fused, sub):
        cfg = Config(
            name=f"real_fused_{fused}", dir_log=str(tmp_path / sub),
            in_channels=2, in_channels_dynamic=3, delta_t=8, threshold=26.0,
            variables=["al", "t2m", "tp"], variables_static=[],
            root_CERRA=main, root_NOAA_CERRA=noaa,
            years_train=["1991"], years_val=["1991"],
            grid_override=(16, 16), x_min=0, x_max=16, y_min=0, y_max=16,
            en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8,
            cls_dim=8, n_epochs=2, batch_size=2, is_aug=True,
            is_norm=True, is_clima_scale=False,
            device_data=True, fused_epoch=fused, fused_chunk=4, seed=0,
        )
        hist = train_real(cfg, "CERRA")
        return hist, hist.pop("state")

    hist_a, state_a = run(False, "a")
    hist_b, state_b = run(True, "b")
    for k in ("train_loss", "val_loss", "train_f1", "val_f1"):
        np.testing.assert_allclose(hist_a[k], hist_b[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    import jax

    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)


def test_structured_reanalysis_fixture_is_learnable(tmp_path):
    """The structured fixture (data/fake.py write_structured_reanalysis)
    must carry causal driver->drought structure: at drought pixels the
    preceding window's |mean-channel| deviation exceeds the background, and
    the drought rate sits in a trainable band."""
    from idee_tpu.data.fake import write_structured_reanalysis

    main, noaa = str(tmp_path / "CERRA"), str(tmp_path / "NOAA")
    info = write_structured_reanalysis(
        main, noaa, years=("1989", "1990"), height=48, width=64, seed=0)
    assert 0.005 < info["drought_rate_valid"] < 0.25

    spec = cerra_spec(8)
    spec.grid_height, spec.grid_width = 48, 64
    ds = ReanalysisDataset(
        spec, main, noaa, delta_t=8, is_aug=False, is_norm=True,
        variables=info["variables"], variables_static=[],
        years=["1990"], threshold=26.0, alpha=0.5,
        x_min=0, x_max=64, y_min=0, y_max=48)
    dev_in, dev_out, n_pos = 0.0, 0.0, 0
    for i in range(0, len(ds), 4):
        it = ds[i]
        me = it["mask_extreme"] > 0
        if not me.any():
            continue
        # mean-channel deviation over the whole window [V, dt, H, W]
        dev = np.abs(it["x"][:, 0]).mean(axis=(0, 1))
        dev_in += float(dev[me].mean())
        dev_out += float(dev[~me].mean())
        n_pos += 1
    assert n_pos >= 3, "fixture produced too few drought weeks"
    assert dev_in / n_pos > 1.15 * (dev_out / n_pos), (
        dev_in / n_pos, dev_out / n_pos)


def test_real_train_driver_writes_panels(cerra_tree, tiny_config, tmp_path):
    """One epoch of the full real-world driver: evaluator output, checkpoints
    AND the TensorBoard image panels (probability/prediction/target +
    per-variable anomaly maps, reference train_CERRA.py:283-310)."""
    from idee_tpu.train.driver_real import train_real

    main, noaa = cerra_tree
    cfg = tiny_config.replace(
        name="real_driver_smoke", dir_log=str(tmp_path),
        in_channels=2, delta_t=8, threshold=26.0,
        variables=["al", "t2m", "tp"], variables_static=[],
        root_CERRA=main, root_NOAA_CERRA=noaa,
        years_train=["1991"], years_val=["1991"],
        grid_override=(16, 16), x_min=0, x_max=16, y_min=0, y_max=16,
        n_epochs=1, batch_size=2, is_aug=False,
        is_norm=True, is_clima_scale=False,
    )
    hist = train_real(cfg, "CERRA")
    assert len(hist["val_loss"]) == 1 and np.isfinite(hist["val_loss"][0])
    # checkpoints + TB event file with image panels
    ckpt_dir = os.path.join(cfg.log_dir, "model_checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "best_loss_model"))
    from tensorboard.backend.event_processing import event_accumulator

    events = [os.path.join(root, f)
              for root, _, files in os.walk(cfg.log_dir)
              for f in files if "tfevents" in f]
    assert events, "no TensorBoard event files written"
    tags = set()
    for path in events:
        acc = event_accumulator.EventAccumulator(
            os.path.dirname(path),
            size_guidance={event_accumulator.IMAGES: 1})
        acc.Reload()
        tags.update(acc.Tags().get("images", []))
    for expected in ("probability", "prediction", "target", "al"):
        assert any(expected in t for t in tags), (expected, tags)


def test_conversion_cache_matches_direct(cerra_tree, tmp_path):
    """convert_reanalysis + cache_root serves items byte-identical to the
    direct NetCDF path (incl. VHI labels and the missing-week fallback)."""
    from idee_tpu.data.convert import convert_reanalysis

    main, noaa = cerra_tree
    spec = cerra_spec(8)
    spec.grid_height = spec.grid_width = 16
    cache = convert_reanalysis(spec, main, noaa, ["1990", "1991"],
                               ["t2m", "tp", "al"], str(tmp_path / "cache"),
                               alpha=0.5, x_max=16, y_max=16)
    kw = dict(is_norm=True, is_clima_scale=False, delta_t=8)
    ds_direct = _ds(main, noaa, **kw)
    ds_cached = _ds(main, noaa, cache_root=cache, **kw)
    assert ds_cached._cache is not None, "cache not engaged"
    for i in (0, 3, len(ds_direct) - 1):
        a, b = ds_direct[i], ds_cached[i]
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=k)


def test_cache_alpha_mismatch_falls_back(cerra_tree, tmp_path):
    from idee_tpu.data.convert import convert_reanalysis

    main, noaa = cerra_tree
    spec = cerra_spec(8)
    spec.grid_height = spec.grid_width = 16
    cache = convert_reanalysis(spec, main, noaa, ["1990", "1991"],
                               ["t2m", "tp", "al"], str(tmp_path / "c2"),
                               alpha=0.7, x_max=16, y_max=16)
    ds = _ds(main, noaa, cache_root=cache, is_norm=False, delta_t=8)
    assert ds._cache is None  # alpha differs from the dataset default 0.5


def test_loader_workers_matches_serial(cerra_tree):
    """Thread-pool batch assembly yields the same batches in the same
    order as the serial path (shuffle off, aug off)."""
    from idee_tpu.data.loader import DataLoader

    main, noaa = cerra_tree
    ds = _ds(main, noaa, is_norm=False, delta_t=4)
    serial = list(DataLoader(ds, 2, shuffle=False, drop_last=True,
                             prefetch=0))
    pooled = list(DataLoader(ds, 2, shuffle=False, drop_last=True,
                             workers=3))
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
