"""Synthetic dataset semantics: time reversal, masks, normalization,
augmentation consistency, NetCDF adapter round-trip."""

import numpy as np
import pytest

from idee_tpu.data.fake import make_fake_cube, write_fake_netcdf
from idee_tpu.data.synthetic import SyntheticDataset, _week_of


def _ds(cube, **kw):
    defaults = dict(
        cube=cube, times=(1, cube.dynamic.shape[1]),
        variables=list(cube.variables),
        variables_static=list(cube.variables_static),
        delta_t=8, is_aug=False, is_norm=False,
        x_min=0, x_max=cube.dynamic.shape[-1],
        y_min=0, y_max=cube.dynamic.shape[-2],
    )
    defaults.update(kw)
    return SyntheticDataset(**defaults)


def test_week_of_matches_reference_formula():
    t = np.arange(1, 160, dtype=np.float32)
    ref = np.array([
        (x - 1) - 52 * ((x - 1) // 52) if (x - 1) // 52 != 0 else (x - 1)
        for x in t
    ])
    np.testing.assert_array_equal(_week_of(t), ref)


def test_len_and_item_shapes(fake_cube):
    ds = _ds(fake_cube)
    V, T, H, W = fake_cube.dynamic.shape
    assert len(ds) == T - 8 + 1
    it = ds[0]
    assert it["x"].shape == (V, 1, 8, H, W)
    assert it["mask_extreme"].shape == (H, W)
    assert it["mask_extreme_loss"].shape == (H, W)
    assert it["mask_anomaly"].shape == (V, 8, H, W)
    assert it["week"].shape == (8,)
    assert it["timestep"].shape == (1,)


def test_time_reversal(fake_cube):
    """Index 0 of the window must be the TARGET week Delta-t_0
    (reference: dataset/Synthetic_dataset.py:331)."""
    ds = _ds(fake_cube)
    i = 5
    it = ds[i]
    np.testing.assert_array_equal(
        it["x"][:, 0, 0], fake_cube.dynamic[:, i + 8 - 1])
    np.testing.assert_array_equal(
        it["x"][:, 0, -1], fake_cube.dynamic[:, i])
    np.testing.assert_array_equal(
        it["mask_anomaly"][:, 0], fake_cube.anomaly[:, i + 8 - 1])
    assert it["timestep"][0] == ds.timestep[i + 8 - 1]


def test_masks(fake_cube):
    ds = _ds(fake_cube)
    i = 3
    it = ds[i]
    expected_target = fake_cube.extreme[i + 7].copy()
    expected_target[expected_target > 1] = 0
    np.testing.assert_array_equal(it["mask_extreme"], expected_target)
    union = np.clip(fake_cube.extreme[i:i + 8].sum(0), 0, 1)
    np.testing.assert_array_equal(it["mask_extreme_loss"], union)


def test_global_normalization(fake_cube):
    ds = _ds(fake_cube, is_norm=True, is_clima_scale=False)
    v0 = fake_cube.variables[0]
    s = fake_cube.stats[v0]
    expected = np.clip(
        (fake_cube.dynamic[0] - s["median"]) / s["std"], -10, 10)
    np.testing.assert_allclose(ds.datacube_dynamic[0], expected, rtol=1e-5)


def test_climatology_normalization(fake_cube):
    ds = _ds(fake_cube, is_norm=True, is_clima_scale=True)
    t = 60  # timestep 61 -> week 8
    wk = int((61 - 1) % 52)
    expected = np.clip(
        (fake_cube.dynamic[0, t] - fake_cube.clima_median[0, wk])
        / fake_cube.clima_std[0, wk], -10, 10)
    np.testing.assert_allclose(ds.datacube_dynamic[0, t], expected, rtol=1e-5)


def test_augmentation_consistency(fake_cube):
    """Augmented data and masks must receive the same transform."""
    ds = _ds(fake_cube, is_aug=True, seed=123)
    found = False
    for trial in range(20):
        it = ds[2]
        raw = np.flip(ds.datacube_dynamic[:, 2:10], 1)[:, None]
        if not np.array_equal(it["x"], raw):
            found = True
            # the same flip/rot must map the raw anomaly onto the item's
            anom_raw = np.flip(ds.anomaly[:, 2:10], 1)
            ok = False
            for k in (0, 2):
                for ax in (None, -1, -2):
                    cand_x = np.rot90(raw, k=k, axes=(-1, -2)) if k else raw
                    cand_a = np.rot90(anom_raw, k=k, axes=(-1, -2)) if k else anom_raw
                    if ax is not None:
                        cand_x = np.flip(cand_x, axis=ax)
                        cand_a = np.flip(cand_a, axis=ax)
                    if np.array_equal(it["x"], cand_x):
                        ok = ok or np.array_equal(it["mask_anomaly"], cand_a)
            assert ok
            break
    assert found, "augmentation never triggered in 20 draws"


def test_window_reduce(fake_cube):
    ds = _ds(fake_cube, window_size=2)
    V, T, H, W = fake_cube.dynamic.shape
    assert ds.datacube_dynamic.shape == (V, T, H // 2, W // 2)
    block = fake_cube.dynamic[0, 0, :2, :2].mean()
    np.testing.assert_allclose(ds.datacube_dynamic[0, 0, 0, 0], block,
                               rtol=1e-5)


def test_netcdf_roundtrip(tmp_path, fake_cube):
    pytest.importorskip("h5py")
    root = str(tmp_path / "synthetic_fake")
    write_fake_netcdf(root, fake_cube)
    ds_file = SyntheticDataset(
        root_datacube=root, times=(1, 64),
        variables=list(fake_cube.variables),
        variables_static=list(fake_cube.variables_static),
        delta_t=8, is_aug=False, is_norm=True, is_clima_scale=False,
        x_min=0, x_max=16, y_min=0, y_max=16,
    )
    ds_mem = _ds(fake_cube, is_norm=True, is_clima_scale=False)
    np.testing.assert_allclose(ds_file.datacube_dynamic,
                               ds_mem.datacube_dynamic, rtol=1e-5)
    np.testing.assert_array_equal(ds_file.anomaly, ds_mem.anomaly)
    np.testing.assert_array_equal(ds_file.extreme, ds_mem.extreme)


def test_loader_batches(fake_cube):
    from idee_tpu.data.loader import DataLoader

    ds = _ds(fake_cube)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["x"].shape[0] == 4
    assert b["mask_extreme"].shape[0] == 4


def test_device_loader_matches_host_items(fake_cube):
    """DeviceLoader slices windows on-device with byte-identical semantics
    to SyntheticDataset.__getitem__ (aug off)."""
    from idee_tpu.data.device import DeviceLoader

    ds = _ds(fake_cube)
    dl = DeviceLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                      seed=0, with_anomaly=True)
    assert len(dl) == len(ds) // 4
    b = next(iter(dl))
    for i in range(4):
        it = ds[i]
        for k in ("x", "mask_extreme", "mask_extreme_loss"):
            np.testing.assert_allclose(np.asarray(b[k][i]), it[k], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(b["mask_anomaly"][i]),
                                      it["mask_anomaly"])
        assert float(b["timestep"][i, 0]) == float(it["timestep"][0])


def test_benchmark_cube_causal_structure():
    """Every extreme pixel has >= n_vars/2 variables anomalous at that pixel
    within the preceding 4 weeks (drivers precede extremes), and rates are
    non-degenerate."""
    from idee_tpu.data.fake import make_benchmark_cube

    cube = make_benchmark_cube(n_vars=4, n_time=104, height=48, width=48,
                               seed=1)
    ext = cube.extreme.astype(bool)
    an = cube.anomaly.astype(bool)
    assert 0.0 < ext.mean() < 0.3
    assert 0.0 < an.mean() < 0.4
    t, h, w = np.nonzero(ext)
    sel = slice(0, 500)
    ok = 0
    for tt, hh, ww in zip(t[sel], h[sel], w[sel]):
        nv = sum(an[v, max(0, tt - 3):tt + 1, hh, ww].any()
                 for v in range(4))
        ok += nv >= 2
    assert ok == len(t[sel])


def test_netcdf3_classic_adapter(tmp_path):
    """NetCDFFile reads classic NetCDF3 files (scipy backend) with the same
    interface as NetCDF4/HDF5 -- string coords, selections, label lookup."""
    from scipy.io import netcdf_file

    from idee_tpu.data.netcdf import NetCDFFile

    p = str(tmp_path / "classic.nc")
    f = netcdf_file(p, "w")
    f.createDimension("statistic", 2)
    f.createDimension("slen", 4)
    f.createDimension("y", 5)
    f.createDimension("x", 6)
    v = f.createVariable("statistic", "S1", ("statistic", "slen"))
    v[0] = np.frombuffer(b"mean", dtype="S1")
    v[1] = np.frombuffer(b"std\x00", dtype="S1")
    dv = f.createVariable("t2m", "f", ("statistic", "y", "x"))
    dv[:] = np.arange(60, dtype=np.float32).reshape(2, 5, 6)
    f.flush()
    f.close()

    with NetCDFFile(p) as nf:
        assert list(nf.coord("statistic")) == ["mean", "std"]
        assert nf.label_indices("statistic", ["std"])[0] == 1
        a = nf.read("t2m", {1: slice(1, 3)})
        assert a.shape == (2, 2, 6)
        np.testing.assert_allclose(a[0, 0], np.arange(6, 12))
        a.flags.writeable  # must be a writable copy, not the mmap view
        a[0, 0, 0] = -1.0


def test_time_slice_disjoint_split(fake_cube):
    """cube.time_slice must cut train/val into disjoint week ranges --
    with an in-memory cube, SyntheticDataset treats times= only as the
    absolute-timestep offset, so an unsliced cube passed to both splits
    would silently leak validation weeks into training."""
    T = fake_cube.dynamic.shape[1]
    t_train = int(T * 0.75)
    train = fake_cube.time_slice(1, t_train)
    val = fake_cube.time_slice(t_train + 1, T)

    assert train.dynamic.shape[1] == t_train
    assert val.dynamic.shape[1] == T - t_train
    # boundary weeks line up with the original cube, no overlap
    np.testing.assert_array_equal(train.dynamic[:, -1],
                                  fake_cube.dynamic[:, t_train - 1])
    np.testing.assert_array_equal(val.dynamic[:, 0],
                                  fake_cube.dynamic[:, t_train])
    np.testing.assert_array_equal(val.extreme[0], fake_cube.extreme[t_train])
    # time-invariant fields are shared, not copied
    assert val.stats is fake_cube.stats
    assert val.clima_median is fake_cube.clima_median


def test_time_slice_dataset_offset_semantics(fake_cube):
    """A sliced cube + matching times= reproduces the unsliced dataset's
    items (the climatology week phase follows the absolute timestep)."""
    T = fake_cube.dynamic.shape[1]
    t0 = 17
    whole = _ds(fake_cube, times=(1, T), is_norm=True, is_clima_scale=True)
    part = _ds(fake_cube.time_slice(t0, T), times=(t0, T), is_norm=True,
               is_clima_scale=True)
    a = whole[t0 - 1 + 3]
    b = part[3]
    np.testing.assert_array_equal(a["timestep"], b["timestep"])
    np.testing.assert_allclose(a["x"], b["x"], rtol=1e-6)
    np.testing.assert_array_equal(a["mask_extreme"], b["mask_extreme"])


def test_cube_npz_roundtrip(tmp_path, fake_cube):
    from idee_tpu.data.fake import load_cube_npz, save_cube_npz

    p = str(tmp_path / "cube.npz")
    save_cube_npz(p, fake_cube)
    back = load_cube_npz(p)
    np.testing.assert_array_equal(back.dynamic, fake_cube.dynamic)
    np.testing.assert_array_equal(back.anomaly, fake_cube.anomaly)
    np.testing.assert_array_equal(back.extreme, fake_cube.extreme)
    assert back.variables == list(fake_cube.variables)
    assert back.stats == fake_cube.stats
    np.testing.assert_array_equal(back.clima_median, fake_cube.clima_median)
