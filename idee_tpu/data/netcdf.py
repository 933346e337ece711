# ------------------------------------------------------------------
"""Minimal NetCDF4 (HDF5) reader built on h5py.

The reference uses xarray+netCDF4 (dataset/Synthetic_dataset.py:168). This
environment ships h5py only; NetCDF4 files *are* HDF5 files with named
datasets + dimension-scale coordinates, which is all we need: read variables
by name, decode string coordinates, label-select along coordinates.
"""
# ------------------------------------------------------------------

from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import h5py

    HAS_H5PY = True
except ImportError:  # pragma: no cover - h5py is in the base image
    HAS_H5PY = False


def _require_h5py():
    if not HAS_H5PY:
        raise ImportError(
            "h5py is required to read NetCDF4 files; install h5py or convert "
            "the data to .npz with idee_tpu.data.convert"
        )


def _decode(arr) -> np.ndarray:
    """Decode bytes/object string arrays to python str."""
    arr = np.asarray(arr)
    if arr.dtype.kind in ("S", "O"):
        return np.array([
            v.decode() if isinstance(v, bytes) else str(v) for v in arr.ravel()
        ]).reshape(arr.shape)
    return arr


class NetCDFFile:
    """Read-only view of a NetCDF4/HDF5 file's named datasets."""

    def __init__(self, path: str):
        _require_h5py()
        self._f = h5py.File(path, "r")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        self._f.close()

    def keys(self) -> List[str]:
        return list(self._f.keys())

    def has(self, name: str) -> bool:
        return name in self._f

    def coord(self, name: str) -> np.ndarray:
        return _decode(self._f[name][()])

    def read(self, name: str, sel: Optional[Dict[int, object]] = None) -> np.ndarray:
        """Read dataset ``name``; ``sel`` maps axis -> (slice | index array)."""
        ds = self._f[name]
        if not sel:
            return ds[()]
        index = [slice(None)] * ds.ndim
        fancy_axes = []
        for ax, s in sel.items():
            if isinstance(s, slice):
                index[ax] = s
            else:
                fancy_axes.append((ax, np.asarray(s)))
        data = ds[tuple(index)]
        for ax, idx in fancy_axes:  # apply fancy indexing after load
            data = np.take(data, idx, axis=ax)
        return data

    def label_indices(self, coord_name: str, labels: Sequence) -> np.ndarray:
        """Indices of ``labels`` along a coordinate (xarray .sel semantics)."""
        coord = self.coord(coord_name)
        lut = {v: i for i, v in enumerate(coord.tolist())}
        return np.array([lut[l] for l in labels], dtype=np.int64)

    def range_slice(self, coord_name: str, lo, hi) -> slice:
        """Contiguous slice where lo <= coord <= hi (xarray slice .sel)."""
        coord = np.asarray(self.coord(coord_name))
        idx = np.nonzero((coord >= lo) & (coord <= hi))[0]
        if idx.size == 0:
            return slice(0, 0)
        return slice(int(idx[0]), int(idx[-1]) + 1)
