# ------------------------------------------------------------------
"""Offline dataset conversion: NetCDF -> framework-native .npz.

The reference reads NetCDF on every run (the synthetic cube whole-file at
startup, dataset/Synthetic_dataset.py:163-242; CERRA/ERA5 per item in
DataLoader workers, CERRA_dataset.py:525-551). For TPU training the host
input pipeline should not re-decode NetCDF every epoch (SURVEY.md 2.9 N5):
this converter materialises the synthetic cube -- data, labels, statistics
and climatology -- into one memory-mappable .npz that
data/synthetic.load_cube_npz consumes directly.
"""
# ------------------------------------------------------------------

import os
from typing import List, Optional

import numpy as np


def convert_synthetic(root: str, out_path: Optional[str] = None,
                      variables: Optional[List[str]] = None) -> str:
    """Convert a reference-schema synthetic directory (datacube_<exp>.nc +
    statistic_<exp>.json + climatology_<exp>.nc) into datacube_<exp>.npz."""
    from idee_tpu.data.netcdf import NetCDFFile
    import json

    exp = os.path.basename(os.path.normpath(root))
    out_path = out_path or os.path.join(root, f"datacube_{exp}.npz")

    with NetCDFFile(os.path.join(root, f"datacube_{exp}.nc")) as f:
        time = np.asarray(f.coord("time"))
        all_vars = [v.decode() if isinstance(v, bytes) else str(v)
                    for v in np.asarray(f.coord("var"))]
        variables = variables or all_vars
        dyn = np.stack([f.read(v) for v in variables]).astype(np.float32)
        anom = f.read("anomaly_extreme")
        n_t, n_v = time.shape[0], len(all_vars)
        # normalize (var, time, ...) axis order (see load_cube_netcdf)
        if not (anom.shape[0] == n_v and anom.shape[1] == n_t):
            anom = anom.swapaxes(0, 1)
        vi = np.array([all_vars.index(v) for v in variables])
        anom = anom[vi]
        extreme = f.read("extreme")
        static = None
        svars = []
        for cand in ("latitude", "longitude"):
            try:
                layer = f.read(cand)
            except KeyError:
                continue
            static = layer[None] if static is None else np.concatenate(
                [static, layer[None]])
            svars.append(cand)

    with open(os.path.join(root, f"statistic_{exp}.json")) as fh:
        raw = json.load(fh)
    stats = {v: {k: float(raw[k][v])
                 for k in ("min", "max", "mean", "median", "std")}
             for v in variables}

    cm = cs = None
    clima = os.path.join(root, f"climatology_{exp}.nc")
    if os.path.exists(clima):
        with NetCDFFile(clima) as f:
            mi = f.label_indices("climatology", ["median"])[0]
            si = f.label_indices("climatology", ["std"])[0]
            cm = np.stack([f.read(v)[mi] for v in variables]).astype(
                np.float32)
            cs = np.stack([f.read(v)[si] for v in variables]).astype(
                np.float32)

    payload = dict(
        dynamic=dyn, anomaly=anom.astype(np.uint8),
        extreme=extreme.astype(np.uint8),
        variables=np.array(variables), timestep=time.astype(np.float32),
        stats=np.array(stats, dtype=object),
    )
    if static is not None:
        payload["static"] = static.astype(np.float32)
        payload["variables_static"] = np.array(svars)
    if cm is not None:
        payload["clima_median"] = cm
        payload["clima_std"] = cs
    np.savez(out_path, **payload)
    return out_path
