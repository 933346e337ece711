# ------------------------------------------------------------------
"""Native C++ batch-engine tests: bit-exact parity with the numpy
__getitem__ path (same RNG sequence), loader integration, VHI core."""
# ------------------------------------------------------------------

import numpy as np
import pytest

from idee_tpu import native
from idee_tpu.data.loader import DataLoader, collate
from idee_tpu.data.synthetic import SyntheticDataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _pair(fake_cube, **kw):
    base = dict(cube=fake_cube, times=(1, 40),
                variables=fake_cube.variables,
                variables_static=fake_cube.variables_static,
                delta_t=8, seed=11)
    base.update(kw)
    return SyntheticDataset(**base), SyntheticDataset(**base)


class TestNativeEngine:
    @pytest.mark.parametrize("aug", [False, True])
    def test_batch_parity(self, fake_cube, aug):
        ds_py, ds_na = _pair(fake_cube, is_aug=aug)
        idx = [0, 3, 7, 12]
        ref = collate([ds_py[i] for i in idx])
        got = ds_na.get_batch(idx)
        assert set(got) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    def test_loader_uses_native(self, fake_cube):
        ds_py, ds_na = _pair(fake_cube, is_aug=True)
        l_py, l_na = (DataLoader(d, 4, shuffle=True, drop_last=True,
                                 seed=3, prefetch=0) for d in (ds_py, ds_na))
        # force the python path on one loader
        ds_py.get_batch = lambda indices: None
        for b_py, b_na in zip(l_py, l_na):
            for k in b_py:
                np.testing.assert_array_equal(np.asarray(b_py[k]),
                                              np.asarray(b_na[k]),
                                              err_msg=k)

    def test_vhi_core(self):
        rng = np.random.default_rng(0)
        vci = rng.uniform(0, 100, (32, 32)).astype(np.float32)
        tci = rng.uniform(0, 100, (32, 32)).astype(np.float32)
        cold = (rng.random((32, 32)) < 0.1).astype(np.float32)
        out = native.vhi_mask(vci, tci, cold, alpha=0.5, threshold=26.0)
        vhi = 0.5 * vci + 0.5 * tci
        want = ((vhi < 26.0) & (cold == 0)).astype(np.float32)
        np.testing.assert_array_equal(out, want)
