# ------------------------------------------------------------------
"""Tests for the visualization helpers and the NetCDF->npz converter."""
# ------------------------------------------------------------------

import numpy as np

from idee_tpu.utils.vis import (generate_anomaly, generate_images,
                                generate_images_synthetic)


class TestVis:
    def test_generate_anomaly_tiles_time(self):
        a = np.zeros((1, 2, 3, 4, 5), np.uint8)
        a[0, 0, 1, 2, 3] = 1
        im = generate_anomaly(a)
        assert im.shape == (1, 2, 4, 3 * 5, 3)
        # anomalous pixel is darkred, normal is wheat
        np.testing.assert_allclose(im[0, 0, 2, 1 * 5 + 3],
                                   [0.545, 0.0, 0.0], atol=1e-3)
        np.testing.assert_allclose(im[0, 0, 0, 0],
                                   [0.961, 0.871, 0.702], atol=1e-3)

    def test_generate_images_synthetic(self):
        p = np.random.default_rng(0).random((2, 6, 6))
        im_p, im_c, im_t = generate_images_synthetic(
            p, (p > 0.5).astype(float), (p > 0.7).astype(float))
        for im in (im_p, im_c, im_t):
            assert im.shape == (2, 6, 6, 3)
            assert im.min() >= 0.0 and im.max() <= 1.0

    def test_generate_images_mask_priority(self):
        """Categorical overlays follow the reference order: sea > no-veg >
        cold (utils_train.py:596-603)."""
        p = np.zeros((1, 2, 2))
        sea = np.zeros((1, 2, 2)); sea[0, 0, 0] = 1
        cold = np.zeros((1, 2, 2)); cold[0, 0, 1] = 1
        noveg = np.zeros((1, 2, 2)); noveg[0, 1, 0] = 1
        _, im_c, _ = generate_images(p, p.copy(), p.copy(), cold, sea, noveg)
        np.testing.assert_allclose(im_c[0, 0, 0], [0.0, 0.545, 0.545],
                                   atol=1e-3)   # sea: darkcyan
        np.testing.assert_allclose(im_c[0, 1, 0], [0.827, 0.827, 0.827],
                                   atol=1e-3)   # no-veg: lightgrey
        np.testing.assert_allclose(im_c[0, 0, 1], [1.0, 1.0, 1.0],
                                   atol=1e-3)   # cold: white


class TestConvert:
    def test_netcdf_to_npz_roundtrip(self, tmp_path, fake_cube):
        from idee_tpu.data.convert import convert_synthetic
        from idee_tpu.data.fake import write_fake_netcdf
        from idee_tpu.data.synthetic import SyntheticDataset

        root = str(tmp_path / "synth")
        write_fake_netcdf(root, fake_cube)
        kw = dict(times=(1, 40), variables=fake_cube.variables,
                  variables_static=[], delta_t=8, is_aug=False,
                  is_norm=True, is_clima_scale=False,
                  x_min=0, x_max=16, y_min=0, y_max=16)
        ds_nc = SyntheticDataset(root_datacube=root, **kw)
        out = convert_synthetic(root)
        ds_npz = SyntheticDataset(root_datacube=root, **kw)  # prefers .npz
        assert out.endswith(".npz")
        assert len(ds_nc) == len(ds_npz)
        a, b = ds_nc[3], ds_npz[3]
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
