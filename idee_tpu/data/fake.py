# ------------------------------------------------------------------
"""Fake synthetic-datacube generator for tests and benchmarks.

Produces a cube with the statistic/climatology schema of the real synthetic
dataset (reference: dataset/Synthetic_dataset.py:168-283): per-variable
seasonal background + planted anomaly blobs that precede extreme events,
so driver-identification is learnable on tiny grids.
"""
# ------------------------------------------------------------------

import os
from typing import List, Optional

import numpy as np

from idee_tpu.data.synthetic import SyntheticCube


def make_fake_cube(
    n_vars: int = 6,
    n_time: int = 104,
    height: int = 32,
    width: int = 32,
    n_static: int = 2,
    seed: int = 0,
    anomaly_rate: float = 0.05,
    variables: Optional[List[str]] = None,
) -> SyntheticCube:
    rng = np.random.default_rng(seed)
    variables = variables or [f"var_{i + 1:02d}" for i in range(n_vars)]

    week = (np.arange(n_time) % 52).astype(np.float32)
    season = np.sin(2 * np.pi * week / 52.0)[None, :, None, None]
    base = rng.normal(0.0, 1.0, (n_vars, 1, height, width)).astype(np.float32)
    noise = rng.normal(0.0, 0.3, (n_vars, n_time, height, width)).astype(np.float32)
    dynamic = base + season + noise

    # plant anomaly blobs; an extreme fires where >= half the variables are
    # anomalous at a pixel. Independent per-variable blobs alone almost
    # never overlap in >= half the variables, so in addition plant shared
    # "events": co-located blobs across a random majority of variables --
    # this guarantees extremes exist at every grid size/seed.
    anomaly = np.zeros((n_vars, n_time, height, width), np.uint8)
    n_blobs = max(1, int(anomaly_rate * n_time))
    need = max(2, n_vars // 2)

    def blob():
        t0 = int(rng.integers(0, max(n_time - 4, 1)))
        yy = int(rng.integers(0, max(height - 8, 1)))
        xx = int(rng.integers(0, max(width - 8, 1)))
        dt = int(rng.integers(2, 5))
        hh = int(rng.integers(4, 9))
        ww = int(rng.integers(4, 9))
        return t0, dt, yy, hh, xx, ww

    for v in range(n_vars):
        for _ in range(n_blobs * 4):
            t0, dt, yy, hh, xx, ww = blob()
            anomaly[v, t0:t0 + dt, yy:yy + hh, xx:xx + ww] = 1
    for _ in range(n_blobs * 4):
        t0, dt, yy, hh, xx, ww = blob()
        n_hit = int(rng.integers(need, n_vars + 1))
        for v in rng.choice(n_vars, size=n_hit, replace=False):
            anomaly[v, t0:t0 + dt, yy:yy + hh, xx:xx + ww] = 1
    dynamic = (dynamic + 3.0 * anomaly).astype(np.float32)  # anomalies shift the signal

    extreme = (anomaly.sum(0) >= need).astype(np.uint8)

    static = rng.normal(0.0, 1.0, (n_static, height, width)).astype(np.float32)
    svars = ["latitude", "longitude"][:n_static] + [
        f"static_{i}" for i in range(max(0, n_static - 2))
    ]

    stats = {
        v: {
            "min": float(dynamic[i].min()),
            "max": float(dynamic[i].max()),
            "mean": float(dynamic[i].mean()),
            "median": float(np.median(dynamic[i])),
            "std": float(dynamic[i].std()),
        }
        for i, v in enumerate(variables)
    }

    # weekly pixel-wise climatology (grouped by week-of-year; robust to
    # n_time < 52)
    wk = (np.arange(n_time) % 52)
    clima_median = np.zeros((n_vars, 52, height, width), np.float32)
    clima_std = np.ones((n_vars, 52, height, width), np.float32)
    for w in range(52):
        sel = dynamic[:, wk == w]
        if sel.shape[1] == 0:
            sel = dynamic  # fallback: global stats for unseen weeks
        clima_median[:, w] = np.median(sel, axis=1)
        clima_std[:, w] = sel.std(axis=1) + 1e-2

    return SyntheticCube(
        dynamic=dynamic, anomaly=anomaly, extreme=extreme,
        variables=variables, static=static, variables_static=svars,
        stats=stats, clima_median=clima_median, clima_std=clima_std,
    )


def _smooth_field(rng, height, width, length):
    """Unit-variance Gaussian random field with correlation length `length`
    (spectral smoothing)."""
    f = rng.normal(size=(height, width))
    ky = np.fft.fftfreq(height)[:, None]
    kx = np.fft.fftfreq(width)[None, :]
    filt = np.exp(-0.5 * ((ky * length) ** 2 + (kx * length) ** 2) * (2 * np.pi) ** 2)
    s = np.fft.ifft2(np.fft.fft2(f) * filt).real
    s = (s - s.mean()) / (s.std() + 1e-12)
    return s.astype(np.float32)


def make_benchmark_cube(
    n_vars: int = 6,
    n_time: int = 2080,
    height: int = 200,
    width: int = 200,
    n_static: int = 2,
    seed: int = 0,
    events_per_year: float = 8.0,
    distractors_per_year: float = 10.0,
    mag_lo: float = 2.0,
    mag_hi: float = 3.5,
    variables: Optional[List[str]] = None,
) -> SyntheticCube:
    """Reference-statistics synthetic benchmark cube (accuracy-parity data).

    The real 46 GB benchmark (reference scripts/download_synthetic.sh) is
    not downloadable in this environment; this generator reproduces the
    STRUCTURE the reference model class is built to exploit
    (dataset/Synthetic_dataset.py + the training objective semantics,
    models/losses.py:127-168):

    * per-variable weekly seasonal cycle with smooth spatial amplitude and
      phase fields, plus AR(1)-in-time spatially correlated noise;
    * "events": spatio-temporal ellipsoids where a random MAJORITY of the
      variables turn anomalous (signed 2-3.5 sigma shifts), each variable's
      anomaly LEADING the extreme by 0-3 weeks -- drivers precede extremes,
      within the delta_t=8 window;
    * the extreme mask is the event's spatial core for its duration;
    * single-variable distractor anomalies with NO extreme, so the
      anomaly<->extreme coupling (not mere deviation) must be learned.

    GT anomaly masks mark exactly the planted anomalous regions; GT extreme
    masks the cores -- the evaluator semantics (utils/utils_train.py:
    269-526) then measure both extreme prediction and driver attribution.
    """
    rng = np.random.default_rng(seed)
    variables = variables or [f"var_{i + 1:02d}" for i in range(n_vars)]

    week = (np.arange(n_time) % 52).astype(np.float32)

    dynamic = np.empty((n_vars, n_time, height, width), np.float32)
    for v in range(n_vars):
        amp = 0.5 + 0.5 * np.abs(_smooth_field(rng, height, width, 30))
        phase = 0.8 * _smooth_field(rng, height, width, 30)
        season = amp[None] * np.sin(
            2 * np.pi * week[:, None, None] / 52.0 + phase[None])
        dynamic[v] = season
    # AR(1) noise with spatially correlated innovations
    rho, sigma = 0.65, 0.55
    state = np.zeros((n_vars, height, width), np.float32)
    scale = sigma * np.sqrt(1.0 - rho * rho)
    for t in range(n_time):
        innov = np.stack([_smooth_field(rng, height, width, 6)
                          for _ in range(n_vars)])
        state = rho * state + scale * innov
        dynamic[:, t] += state

    anomaly = np.zeros((n_vars, n_time, height, width), np.uint8)
    extreme = np.zeros((n_time, height, width), np.uint8)
    need = max(2, n_vars // 2)

    yy = np.arange(height, dtype=np.float32)
    xx = np.arange(width, dtype=np.float32)

    def ellipse(cy, cx, ry, rx, theta):
        dy = (yy[:, None] - cy)
        dx = (xx[None, :] - cx)
        c, s = np.cos(theta), np.sin(theta)
        u = (c * dx + s * dy) / rx
        v_ = (-s * dx + c * dy) / ry
        return u * u + v_ * v_  # r^2 field

    def plant(vars_hit, t0, dur, cy, cx, ry, rx, theta, is_event):
        r2 = ellipse(cy, cx, ry, rx, theta)
        core = r2 <= 1.0
        halo = r2 <= 1.69  # anomalies spread ~30% beyond the extreme core
        if not halo.any():
            return
        shape = np.clip(1.0 - 0.3 * r2, 0.0, None) * halo
        for v in vars_hit:
            mag = float(rng.uniform(mag_lo, mag_hi)) * (1 if rng.random() < 0.5
                                                  else -1)
            lead = int(rng.integers(0, 4)) if is_event else 0
            lo = max(0, t0 - lead)
            hi = min(n_time, t0 + dur)
            if hi <= lo:
                continue
            dynamic[v, lo:hi] += mag * shape[None]
            anomaly[v, lo:hi] |= halo[None]
        if is_event:
            hi = min(n_time, t0 + dur)
            if hi > t0:
                extreme[t0:hi] |= core[None]

    n_events = int(events_per_year * n_time / 52.0)
    for _ in range(n_events):
        m = int(rng.integers(need, n_vars + 1))
        plant(rng.choice(n_vars, size=m, replace=False),
              t0=int(rng.integers(4, n_time - 2)),
              dur=int(rng.integers(2, 7)),
              cy=float(rng.uniform(10, height - 10)),
              cx=float(rng.uniform(10, width - 10)),
              ry=float(rng.uniform(6, 20)), rx=float(rng.uniform(6, 20)),
              theta=float(rng.uniform(0, np.pi)), is_event=True)
    n_distract = int(distractors_per_year * n_time / 52.0)
    for _ in range(n_distract):
        plant([int(rng.integers(n_vars))],
              t0=int(rng.integers(0, n_time - 2)),
              dur=int(rng.integers(2, 7)),
              cy=float(rng.uniform(10, height - 10)),
              cx=float(rng.uniform(10, width - 10)),
              ry=float(rng.uniform(6, 20)), rx=float(rng.uniform(6, 20)),
              theta=float(rng.uniform(0, np.pi)), is_event=False)

    static = np.stack([_smooth_field(rng, height, width, 25)
                       for _ in range(n_static)])
    svars = ["latitude", "longitude"][:n_static] + [
        f"static_{i}" for i in range(max(0, n_static - 2))]

    stats = {
        v: {
            "min": float(dynamic[i].min()),
            "max": float(dynamic[i].max()),
            "mean": float(dynamic[i].mean()),
            "median": float(np.median(dynamic[i])),
            "std": float(dynamic[i].std()),
        }
        for i, v in enumerate(variables)
    }

    wk = (np.arange(n_time) % 52)
    clima_median = np.zeros((n_vars, 52, height, width), np.float32)
    clima_std = np.ones((n_vars, 52, height, width), np.float32)
    for w in range(52):
        sel = dynamic[:, wk == w]
        if sel.shape[1] == 0:
            sel = dynamic
        clima_median[:, w] = np.median(sel, axis=1)
        clima_std[:, w] = sel.std(axis=1) + 1e-2

    return SyntheticCube(
        dynamic=dynamic, anomaly=anomaly, extreme=extreme,
        variables=variables, static=static, variables_static=svars,
        stats=stats, clima_median=clima_median, clima_std=clima_std,
    )


def save_cube_npz(path: str, cube: SyntheticCube) -> None:
    """Disk-cache a generated cube (deterministic in its seed; 200x200x40y
    generation costs ~20 min of single-core time, loading seconds)."""
    import json

    extras = {}
    if cube.static is not None:
        extras["static"] = cube.static
        extras["variables_static"] = np.array(cube.variables_static)
    np.savez(path, dynamic=cube.dynamic, anomaly=cube.anomaly,
             extreme=cube.extreme, variables=np.array(cube.variables),
             stats=np.array(json.dumps(cube.stats)),
             clima_median=cube.clima_median, clima_std=cube.clima_std,
             **extras)


def load_cube_npz(path: str) -> SyntheticCube:
    """Inverse of save_cube_npz."""
    import json

    z = np.load(path, allow_pickle=False)
    return SyntheticCube(
        dynamic=z["dynamic"], anomaly=z["anomaly"], extreme=z["extreme"],
        variables=list(z["variables"]),
        static=z["static"] if "static" in z else None,
        variables_static=(list(z["variables_static"])
                          if "variables_static" in z else []),
        stats=json.loads(str(z["stats"])),
        clima_median=z["clima_median"], clima_std=z["clima_std"])


def write_fake_netcdf(root: str, cube: SyntheticCube) -> None:
    """Write the cube in the reference directory schema via h5py so the
    NetCDF loader path can be tested without xarray."""
    import json
    import os

    import h5py

    os.makedirs(root, exist_ok=True)
    exp = os.path.basename(os.path.normpath(root))
    T = cube.dynamic.shape[1]

    with h5py.File(os.path.join(root, f"datacube_{exp}.nc"), "w") as f:
        f.create_dataset("time", data=np.arange(1, T + 1, dtype=np.float64))
        f.create_dataset(
            "var", data=np.array([v.encode() for v in cube.variables]))
        for i, v in enumerate(cube.variables):
            f.create_dataset(v, data=cube.dynamic[i])  # [T, H, W]? no: [T,H,W]
        f["anomaly_extreme"] = cube.anomaly.swapaxes(0, 1)  # [T, V, H, W]
        f["extreme"] = cube.extreme
        if cube.static is not None:
            for i, v in enumerate(cube.variables_static):
                f[v] = cube.static[i]

    with open(os.path.join(root, f"statistic_{exp}.json"), "w") as fh:
        json.dump(
            {
                k: {v: cube.stats[v][k] for v in cube.variables}
                for k in ("min", "max", "mean", "median", "std")
            },
            fh,
        )

    with h5py.File(os.path.join(root, f"climatology_{exp}.nc"), "w") as f:
        f.create_dataset(
            "climatology",
            data=np.array([b"median", b"std"]))
        for i, v in enumerate(cube.variables):
            f[v] = np.stack([cube.clima_median[i], cube.clima_std[i]])


def write_structured_reanalysis(
    root_main: str,
    root_noaa: str,
    variables: Optional[List[str]] = None,
    years=("1989", "1990", "1991", "1992"),
    height: int = 512,
    width: int = 832,
    era5_region: Optional[str] = None,
    seed: int = 0,
    events_per_year: float = 12.0,
    distractors_per_year: float = 12.0,
    mag_lo: float = 2.0,
    mag_hi: float = 3.5,
    vhi_event_drop: float = 45.0,
    write_climatology: bool = False,
) -> dict:
    """Learnable CERRA/ERA5-Land-shaped fixture at real-world geometry.

    write_fake_reanalysis writes *random* VCI/TCI, so its drought labels are
    noise -- fine for plumbing tests, useless for training. This generator
    mirrors make_benchmark_cube's causal structure in the reanalysis file
    schema (reference: dataset/CERRA_dataset.py:525-551 weekly files,
    :452-518 VHI label engine), so the real-world drivers
    (train/driver_real.py) can be trained to a meaningful drought-F1 at the
    reference's published geometry (CERRA Europe 512x832 crop,
    dataset/CERRA_dataset.py:100-101; the ~1.1 TB real archive is not
    downloadable in this environment -- BASELINE.md risk note):

    * per-variable weekly `mean` channel: seasonal cycle with smooth
      amplitude/phase fields + AR(1) spatially-correlated noise; `std`
      channel: smooth positive base + weekly noise;
    * droughts: spatio-temporal ellipsoids where VHI (written as VCI = TCI
      so any alpha yields the same VHI) drops below the 26/35 thresholds
      for the event duration, while a random MAJORITY of the variables turn
      anomalous (+-2-3.5 sigma on the mean channel), each LEADING the
      drought by 0-3 weeks -- drivers precede extremes within delta_t=8;
    * single-variable distractor anomalies with NO VHI response;
    * cold-surface masks concentrated in winter weeks, static water and
      no-vegetation masks from thresholded smooth fields (the label engine
      excludes all three, CERRA_dataset.py:478-518).

    Returns a summary dict (drought rate, event count) for documentation.
    """
    import json

    import h5py

    rng = np.random.default_rng(seed)
    variables = sorted(variables or
                       ["al", "hcc", "lcc", "msl", "si10", "wdir10"])
    V = len(variables)
    years = [str(y) for y in years]
    n_time = 52 * len(years)
    need = max(2, V // 2)

    if era5_region:
        root_main = os.path.join(root_main, era5_region)
        root_noaa = os.path.join(root_noaa, era5_region)
        prefix = era5_region + "_"
        masks_name = era5_region + "_masks.nc"
    else:
        prefix = "CERRA_"
        masks_name = "masks.nc"
    os.makedirs(root_main, exist_ok=True)
    os.makedirs(root_noaa, exist_ok=True)

    week_of_year = (np.arange(n_time) % 52).astype(np.float32)

    # --- dynamic variables: seasonal + AR(1) noise (mean channel) ---
    mean_ch = np.empty((V, n_time, height, width), np.float32)
    for v in range(V):
        amp = 0.5 + 0.5 * np.abs(_smooth_field(rng, height, width, 60))
        phase = 0.8 * _smooth_field(rng, height, width, 60)
        mean_ch[v] = amp[None] * np.sin(
            2 * np.pi * week_of_year[:, None, None] / 52.0 + phase[None])
    rho, sigma = 0.65, 0.55
    state = np.zeros((V, height, width), np.float32)
    scale = sigma * np.sqrt(1.0 - rho * rho)
    for t in range(n_time):
        innov = np.stack([_smooth_field(rng, height, width, 12)
                          for _ in range(V)])
        state = rho * state + scale * innov
        mean_ch[:, t] += state

    # --- std channel: smooth positive base + weekly noise ---
    std_base = np.stack([0.8 + 0.4 * np.abs(_smooth_field(rng, height,
                                                          width, 40))
                         for _ in range(V)])  # [V, H, W]

    # --- VHI: smooth base ~55 + seasonal dip + AR(1) noise ---
    vhi_base = 55.0 + 8.0 * _smooth_field(rng, height, width, 80)
    vhi = np.empty((n_time, height, width), np.float32)
    vstate = np.zeros((height, width), np.float32)
    for t in range(n_time):
        vstate = 0.7 * vstate + 5.0 * np.sqrt(1 - 0.49) * _smooth_field(
            rng, height, width, 30)
        vhi[t] = (vhi_base + vstate
                  + 4.0 * np.sin(2 * np.pi * week_of_year[t] / 52.0))

    # --- plant droughts (events) and distractors ---
    yy = np.arange(height, dtype=np.float32)
    xx = np.arange(width, dtype=np.float32)

    def ellipse(cy, cx, ry, rx, theta):
        dy = yy[:, None] - cy
        dx = xx[None, :] - cx
        c, s = np.cos(theta), np.sin(theta)
        u = (c * dx + s * dy) / rx
        w_ = (-s * dx + c * dy) / ry
        return u * u + w_ * w_

    r_lo = max(6.0, 0.06 * min(height, width))
    r_hi = max(12.0, 0.2 * min(height, width))

    def plant(vars_hit, t0, dur, is_event):
        r2 = ellipse(float(rng.uniform(0.1 * height, 0.9 * height)),
                     float(rng.uniform(0.1 * width, 0.9 * width)),
                     float(rng.uniform(r_lo, r_hi)),
                     float(rng.uniform(r_lo, r_hi)),
                     float(rng.uniform(0, np.pi)))
        halo = r2 <= 1.69
        if not halo.any():
            return
        shape = np.clip(1.0 - 0.3 * r2, 0.0, None) * halo
        hi = min(n_time, t0 + dur)
        for v in vars_hit:
            mag = float(rng.uniform(mag_lo, mag_hi)) * (
                1 if rng.random() < 0.5 else -1)
            lead = int(rng.integers(0, 4)) if is_event else 0
            lo = max(0, t0 - lead)
            if hi <= lo:
                continue
            mean_ch[v, lo:hi] += mag * shape[None]
        if is_event and hi > t0:
            vhi[t0:hi] -= vhi_event_drop * np.clip(
                1.0 - 0.5 * r2, 0.0, None) * halo

    n_events = int(events_per_year * n_time / 52.0)
    for _ in range(n_events):
        m = int(rng.integers(need, V + 1))
        plant(rng.choice(V, size=m, replace=False),
              t0=int(rng.integers(4, n_time - 2)),
              dur=int(rng.integers(3, 11)), is_event=True)
    for _ in range(int(distractors_per_year * n_time / 52.0)):
        plant([int(rng.integers(V))], t0=int(rng.integers(0, n_time - 2)),
              dur=int(rng.integers(3, 11)), is_event=False)
    vhi = np.clip(vhi, 2.0, 98.0)

    # --- masks: water / no-vegetation static, cold seasonal ---
    water = (_smooth_field(rng, height, width, 100) > 0.9).astype(np.float32)
    noveg = ((_smooth_field(rng, height, width, 70) > 1.3)
             & (water == 0)).astype(np.float32)
    cold_field = _smooth_field(rng, height, width, 60)

    # --- write weekly files ---
    for yi, year in enumerate(years):
        os.makedirs(os.path.join(root_main, year), exist_ok=True)
        os.makedirs(os.path.join(root_noaa, year), exist_ok=True)
        for week in range(1, 53):
            t = yi * 52 + week - 1
            wnr = ("0" + str(week)) if week > 9 else ("00" + str(week))
            with h5py.File(os.path.join(root_main, year,
                                        f"{year}{wnr}.nc"), "w") as f:
                f["statistic"] = np.array([b"mean", b"std"])
                stds = (std_base
                        + rng.normal(0, 0.1, (V, height, width))).astype(
                            np.float32)
                for v, name in enumerate(variables):
                    f.create_dataset(
                        name, data=np.stack([mean_ch[v, t], stds[v]]))
            # winter weeks get a cold band; rare cold elsewhere
            is_winter = week >= 45 or week <= 8
            thr_c = 1.2 if is_winter else 2.6
            cold = ((cold_field + 0.3 * rng.standard_normal()) > thr_c
                    ).astype(np.float32)
            with h5py.File(os.path.join(root_noaa, year,
                                        f"{year}{wnr}_00.nc"), "w") as f:
                f["VCI"] = vhi[t]  # VCI == TCI -> VHI == vhi for any alpha
                f["TCI"] = vhi[t]
                f["mask_cold_surface"] = cold

    # --- global statistics (mean channel; the std channel is scaled by
    # the same per-variable std, CERRA_dataset.py:618-620) ---
    stats = {
        "min": {v: float(mean_ch[i].min()) for i, v in enumerate(variables)},
        "max": {v: float(mean_ch[i].max()) for i, v in enumerate(variables)},
        "mean": {v: float(mean_ch[i].mean()) for i, v in enumerate(variables)},
        "std": {v: float(mean_ch[i].std()) for i, v in enumerate(variables)},
    }
    with open(os.path.join(root_main, prefix + "statistic_train.json"),
              "w") as fh:
        json.dump(stats, fh)

    if write_climatology:
        wk = np.arange(n_time) % 52
        with h5py.File(os.path.join(
                root_main, prefix + "climatology_pixels_train.nc"),
                "w") as f:
            f["climatology"] = np.array([b"mean", b"std"])
            f["week"] = np.arange(1, 53, dtype=np.float64)
            for v, name in enumerate(variables):
                cm = np.stack([mean_ch[v, wk == w].mean(0)
                               for w in range(52)])
                cs = np.stack([mean_ch[v, wk == w].std(0) + 1e-2
                               for w in range(52)])
                # [climatology, statistic(mean,std-ch), week, y, x]; the
                # std channel's climatology reuses the mean channel's
                # moments (fixture simplification)
                f[name] = np.stack([np.stack([cm, cm]),
                                    np.stack([cs, cs])]).astype(np.float32)

    with h5py.File(os.path.join(root_noaa, masks_name), "w") as f:
        f["mask_no_vegetation"] = noveg
        if era5_region:
            f["lsm"] = 1.0 - water  # land fraction
    if not era5_region:
        with h5py.File(os.path.join(root_main, "CERRA_static_variables.nc"),
                       "w") as f:
            f["lsm"] = 1.0 - water
            f["orog"] = _smooth_field(rng, height, width, 50)
            f["latitude"] = np.tile(np.linspace(30, 70, height)[:, None],
                                    (1, width)).astype(np.float32)
            f["longitude"] = np.tile(np.linspace(-10, 40, width)[None],
                                     (height, 1)).astype(np.float32)

    valid = np.clip(1.0 - water - noveg, 0.0, 1.0)
    drought = (vhi < 26.0) & (valid[None] > 0)
    return {
        "n_events": n_events,
        "drought_rate_valid": float(drought.sum()
                                    / max(valid.sum() * n_time, 1.0)),
        "water_frac": float(water.mean()),
        "noveg_frac": float(noveg.mean()),
        "variables": variables,
        "years": years,
        "height": height, "width": width,
    }


def write_fake_reanalysis(root_main: str, root_noaa: str,
                          variables: Optional[List[str]] = None,
                          years=("1990", "1991"), height: int = 16,
                          width: int = 16, era5_region: Optional[str] = None,
                          seed: int = 0,
                          missing_weeks=()) -> List[str]:
    """Write a tiny CERRA/ERA5-Land-shaped directory tree via h5py for
    tests: weekly files root/<year>/<year><www>.nc with a 'statistic'
    (mean,std) axis, NOAA VCI/TCI/cold files, masks, statistics json and
    weekly climatology (schema per reference dataset/CERRA_dataset.py).

    missing_weeks: (year, week) pairs to omit from the NOAA tree (exercises
    the missing-week fallback).
    """
    import json

    import h5py

    rng = np.random.default_rng(seed)
    variables = sorted(variables or ["t2m", "tp", "al"])

    if era5_region:
        root_main = os.path.join(root_main, era5_region)
        root_noaa = os.path.join(root_noaa, era5_region)
        prefix = era5_region + "_"
        masks_name = era5_region + "_masks.nc"
    else:
        prefix = "CERRA_"
        masks_name = "masks.nc"
    os.makedirs(root_main, exist_ok=True)
    os.makedirs(root_noaa, exist_ok=True)

    written = []
    for year in years:
        os.makedirs(os.path.join(root_main, year), exist_ok=True)
        os.makedirs(os.path.join(root_noaa, year), exist_ok=True)
        for week in range(1, 53):
            wnr = ("0" + str(week)) if week > 9 else ("00" + str(week))
            main_path = os.path.join(root_main, year, f"{year}{wnr}.nc")
            with h5py.File(main_path, "w") as f:
                f["statistic"] = np.array([b"mean", b"std", b"min", b"max"])
                for v in variables:
                    f[v] = rng.normal(
                        size=(4, height, width)).astype(np.float32)
            written.append(main_path)
            if (year, week) in set(missing_weeks):
                continue
            noaa_path = os.path.join(root_noaa, year,
                                     f"{year}{wnr}_00.nc")
            with h5py.File(noaa_path, "w") as f:
                f["VCI"] = rng.uniform(0, 100, (height, width)).astype(
                    np.float32)
                f["TCI"] = rng.uniform(0, 100, (height, width)).astype(
                    np.float32)
                f["mask_cold_surface"] = (
                    rng.random((height, width)) < 0.05).astype(np.float32)

    stats = {k: {v: float(x) for v, x in
                 zip(variables, rng.uniform(0.5, 2.0, len(variables)))}
             for k in ("min", "max", "mean", "std")}
    with open(os.path.join(root_main, prefix + "statistic_train.json"),
              "w") as fh:
        json.dump(stats, fh)

    with h5py.File(os.path.join(root_main,
                                prefix + "climatology_pixels_train.nc"),
                   "w") as f:
        f["climatology"] = np.array([b"mean", b"std"])
        f["week"] = np.arange(1, 53, dtype=np.float64)
        for v in variables:
            data = rng.normal(size=(2, 2, 52, height, width)).astype(
                np.float32)
            data[1] = np.abs(data[1]) + 0.5  # std > 0
            f[v] = data  # [climatology, statistic, week, y, x]

    with h5py.File(os.path.join(root_noaa, masks_name), "w") as f:
        f["mask_no_vegetation"] = (
            rng.random((height, width)) < 0.1).astype(np.float32)
        if era5_region:
            f["lsm"] = rng.uniform(0, 1, (height, width)).astype(np.float32)

    if not era5_region:
        with h5py.File(os.path.join(root_main, "CERRA_static_variables.nc"),
                       "w") as f:
            f["lsm"] = (rng.random((height, width)) > 0.3).astype(np.float32)
            f["orog"] = rng.normal(size=(height, width)).astype(np.float32)
            f["latitude"] = np.tile(
                np.linspace(30, 70, height)[:, None], (1, width)).astype(
                np.float32)
            f["longitude"] = np.tile(
                np.linspace(-10, 40, width)[None], (height, 1)).astype(
                np.float32)

    return written
