# ------------------------------------------------------------------
"""Synthetic datacube pipeline.

Parity target: reference dataset/Synthetic_dataset.py. The entire cube is
loaded to host RAM once; per-item slicing returns a delta_t-week window,
**time-reversed** so index 0 is the target week Delta-t_0
(reference: dataset/Synthetic_dataset.py:331-336), plus extreme/anomaly masks
and consistent rot90/flip augmentation (reference: :355-373).

Sources: NetCDF (h5py adapter), .npz cubes, or in-memory arrays (tests).
"""
# ------------------------------------------------------------------

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class SyntheticCube:
    """In-memory synthetic datacube (pre-selection, raw units)."""

    dynamic: np.ndarray  # [V, T, H, W] float32
    anomaly: np.ndarray  # [V, T, H, W] {0,1}
    extreme: np.ndarray  # [T, H, W]
    variables: List[str]
    static: Optional[np.ndarray] = None  # [S, H, W] raw (pre-normalization)
    variables_static: List[str] = field(default_factory=list)
    # per-variable global stats (statistic_*.json schema)
    stats: Optional[Dict[str, Dict[str, float]]] = None
    # weekly pixel-wise climatology: median/std [V, 52, H, W]
    clima_median: Optional[np.ndarray] = None
    clima_std: Optional[np.ndarray] = None

    def time_slice(self, t0: int, t1: int) -> "SyntheticCube":
        """Weeks [t0, t1] (1-based inclusive) as a new cube.

        With an in-memory ``cube=``, SyntheticDataset uses ``times=`` only
        as the absolute-timestep offset (for climatology week phase), NOT
        as a slice — so a train/val split must be cut HERE, with matching
        ``times=(t0, t1)`` passed to the dataset. Passing one unsliced
        cube as both train and val leaks the validation weeks into
        training. Stats/climatology/static fields are time-invariant and
        shared."""
        import dataclasses

        return dataclasses.replace(
            self,
            dynamic=self.dynamic[:, t0 - 1:t1],
            anomaly=self.anomaly[:, t0 - 1:t1],
            extreme=self.extreme[t0 - 1:t1],
        )


def _week_of(timestep: np.ndarray) -> np.ndarray:
    """Absolute timestep (1-based) -> week-of-year index 0..51
    (reference: dataset/Synthetic_dataset.py:197-198; the conditional there
    is equivalent to (t-1) % 52)."""
    return ((timestep - 1) % 52).astype(np.float32)


def _window_mean(x: np.ndarray, w: int, axes: Tuple[int, int]) -> np.ndarray:
    """Non-overlapping window-mean downsampling over two trailing spatial axes
    (reference: dataset/Synthetic_dataset.py:217-242)."""
    if w <= 1:
        return x
    shape = list(x.shape)
    h_ax, w_ax = axes
    H, W = shape[h_ax], shape[w_ax]
    new_shape = shape[:h_ax] + [H // w, w] + [W // w, w]
    y = x.reshape(new_shape)
    return np.nanmean(y, axis=(h_ax + 1, h_ax + 3))


def load_cube_netcdf(root: str, variables: List[str],
                     variables_static: List[str], times: Tuple[int, int],
                     x_min: int, x_max: int, y_min: int, y_max: int,
                     need_stats: bool, need_clima: bool) -> SyntheticCube:
    """Load datacube_<exp>.nc (+ statistic json / climatology nc) via the
    h5py NetCDF adapter (reference: dataset/Synthetic_dataset.py:163-283)."""
    from idee_tpu.data.netcdf import NetCDFFile

    exp = os.path.basename(os.path.normpath(root))
    path = os.path.join(root, f"datacube_{exp}.nc")
    xs, ys = slice(x_min, x_max), slice(y_min, y_max)

    with NetCDFFile(path) as f:
        n_time_total = np.asarray(f.coord("time")).shape[0]
        n_var_total = np.asarray(f.coord("var")).shape[0]
        tsl = f.range_slice("time", times[0], times[1])
        dyn = np.stack(
            [f.read(v, {0: tsl, 1: ys, 2: xs}) for v in variables], axis=0
        ).astype(np.float32)
        var_idx = f.label_indices("var", variables)
        # infer (var, time) axis order of anomaly_extreme by size: xarray
        # writes (var, time, y, x); our h5py fixture writes (time, var, y, x)
        anom = f.read("anomaly_extreme")
        v_ax = 0 if anom.shape[0] == n_var_total and anom.shape[1] == n_time_total else 1
        t_ax = 1 - v_ax
        anom = np.take(anom, var_idx, axis=v_ax)
        anom = np.take(anom, np.arange(tsl.start, tsl.stop), axis=t_ax)
        if v_ax != 0:
            anom = anom.swapaxes(0, 1)
        anom = anom[..., ys, xs]
        extreme = f.read("extreme", {0: tsl, 1: ys, 2: xs})

        static = None
        if variables_static:
            layers = []
            for v_s in variables_static:
                # crop (xarray isel happens at open), then flip along y
                # (reference: dataset/Synthetic_dataset.py:180-191)
                data = np.flip(f.read(v_s)[..., ys, xs], -2)[None]
                data = (data - np.nanmean(data)) / np.nanstd(data)
                data = np.clip(data, -10.0, 10.0)
                layers.append(data)
            static = np.concatenate(layers, axis=0)

    stats = None
    if need_stats:
        with open(os.path.join(root, f"statistic_{exp}.json")) as fh:
            raw = json.load(fh)
        stats = {
            v: {k: float(raw[k][v]) for k in ("min", "max", "mean", "median", "std")}
            for v in variables
        }

    cm = cs = None
    if need_clima:
        with NetCDFFile(os.path.join(root, f"climatology_{exp}.nc")) as f:
            med_i = f.label_indices("climatology", ["median"])[0]
            std_i = f.label_indices("climatology", ["std"])[0]
            cm = np.stack([
                f.read(v, {0: slice(med_i, med_i + 1), 2: ys, 3: xs})[0]
                for v in variables
            ]).astype(np.float32)
            cs = np.stack([
                f.read(v, {0: slice(std_i, std_i + 1), 2: ys, 3: xs})[0]
                for v in variables
            ]).astype(np.float32)

    return SyntheticCube(
        dynamic=dyn,
        anomaly=anom, extreme=extreme, variables=list(variables),
        static=static, variables_static=list(variables_static),
        stats=stats, clima_median=cm, clima_std=cs,
    )


def load_cube_npz(path: str, variables: List[str],
                  variables_static: List[str], times: Tuple[int, int],
                  x_min: int, x_max: int, y_min: int, y_max: int) -> SyntheticCube:
    """Load a cube from the framework-native .npz format (see data/convert.py)."""
    z = np.load(path, allow_pickle=True)
    all_vars = [str(v) for v in z["variables"]]
    vi = np.array([all_vars.index(v) for v in variables])
    t = z["timestep"]
    tm = (t >= times[0]) & (t <= times[1])
    sel = np.ix_(vi, np.nonzero(tm)[0], np.arange(y_min, y_max),
                 np.arange(x_min, x_max))
    static = None
    if variables_static and "static" in z:
        svars = [str(v) for v in z["variables_static"]]
        si = np.array([svars.index(v) for v in variables_static])
        raw = z["static"][si][:, y_min:y_max, x_min:x_max]
        layers = []
        for s in raw:
            s = np.flip(s, -2)[None]
            s = (s - np.nanmean(s)) / np.nanstd(s)
            layers.append(np.clip(s, -10.0, 10.0))
        static = np.concatenate(layers, 0)
    stats = z["stats"].item() if "stats" in z else None
    cm = z["clima_median"][vi][:, :, y_min:y_max, x_min:x_max] \
        if "clima_median" in z else None
    cs = z["clima_std"][vi][:, :, y_min:y_max, x_min:x_max] \
        if "clima_std" in z else None
    return SyntheticCube(
        dynamic=z["dynamic"][sel].astype(np.float32),
        anomaly=z["anomaly"][sel],
        extreme=z["extreme"][np.nonzero(tm)[0], y_min:y_max, x_min:x_max],
        variables=list(variables), static=static,
        variables_static=list(variables_static),
        stats=stats, clima_median=cm, clima_std=cs,
    )


class SyntheticDataset:
    """Synthetic dataset with reference __getitem__ semantics
    (reference: dataset/Synthetic_dataset.py:88-405).

    Items are dicts:
      x                 [V, 1, delta_t, H, W] float32 (time-reversed)
      static            [S, H, W] or absent
      week              [delta_t] week numbers (1-based, time-reversed)
      mask_extreme      [H, W] extreme at Delta-t_0 (values > 1 zeroed)
      mask_extreme_loss [H, W] union of extremes over the window
      mask_anomaly      [V, delta_t, H, W] GT drivers (time-reversed)
      timestep          [1] absolute timestep of the target week
    """

    def __init__(self, cube: Optional[SyntheticCube] = None,
                 root_datacube: Optional[str] = None,
                 times: Tuple[int, int] = (1, 52),
                 variables: Optional[List[str]] = None,
                 variables_static: Optional[List[str]] = None,
                 delta_t: int = 8, is_aug: bool = False,
                 is_clima_scale: bool = False, is_norm: bool = True,
                 is_replace_anomaly: bool = False,
                 window_size: int = 1,
                 x_min: int = 0, x_max: int = 200,
                 y_min: int = 0, y_max: int = 200,
                 seed: int = 0):
        variables = sorted(variables or [])
        variables_static = sorted(variables_static or [])
        self.delta_t = delta_t
        self.is_aug = is_aug
        self.is_norm = is_norm
        self.is_clima_scale = is_clima_scale
        self.window_size = window_size
        self.variables_dynamic = variables
        self.variables_static = variables_static
        self.times = times
        self._rng = np.random.default_rng(seed)

        if cube is None:
            if root_datacube is None:
                raise ValueError("provide either cube= or root_datacube=")
            npz = os.path.join(
                root_datacube,
                f"datacube_{os.path.basename(os.path.normpath(root_datacube))}.npz",
            )
            if os.path.exists(npz):
                cube = load_cube_npz(npz, variables, variables_static, times,
                                     x_min, x_max, y_min, y_max)
            else:
                cube = load_cube_netcdf(
                    root_datacube, variables, variables_static, times,
                    x_min, x_max, y_min, y_max,
                    need_stats=is_norm and not is_clima_scale,
                    need_clima=(is_norm and is_clima_scale)
                    or is_replace_anomaly,
                )
        self.cube = cube

        if cube.dynamic.shape[1] < delta_t:
            raise ValueError(
                f"time window {times} holds {cube.dynamic.shape[1]} steps, "
                f"fewer than delta_t={delta_t}; check --times_* and the cube"
            )

        self._dynamic = cube.dynamic.astype(np.float32).copy()
        self._anomaly = cube.anomaly
        self._extreme = cube.extreme
        self._static = cube.static
        V, T = self._dynamic.shape[:2]
        self._timestep = np.arange(times[0], times[0] + T, dtype=np.float32)
        self._week = _week_of(self._timestep)

        if is_replace_anomaly:
            # train reconstruction / one-class models on "anomaly-free"
            # data: overwrite pixels under extremes with draws from the
            # pixel-wise weekly climatology Normal(median, std)
            # (reference: Baselines_Reconstruction/dataset/
            # Synthetic_dataset.py:205-219)
            if cube.clima_median is None:
                raise ValueError("cube lacks climatology for "
                                 "is_replace_anomaly")
            wk = self._week.astype(np.int32)
            sel = np.broadcast_to(self._extreme[None] > 0,
                                  self._dynamic.shape)
            med = cube.clima_median[:, wk]
            std = cube.clima_std[:, wk]
            self._dynamic[sel] = self._rng.normal(
                med[sel], np.abs(std[sel])).astype(np.float32)

        if is_norm:
            if is_clima_scale:
                if cube.clima_median is None:
                    raise ValueError("cube lacks climatology for is_clima_scale")
                wk = self._week.astype(np.int32)
                with np.errstate(divide="ignore", invalid="ignore"):
                    self._dynamic = (
                        (self._dynamic - cube.clima_median[:, wk])
                        / cube.clima_std[:, wk]
                    )
            else:
                if cube.stats is None:
                    raise ValueError("cube lacks statistics for global norm")
                for v, name in enumerate(self.variables_dynamic):
                    s = cube.stats[name]
                    self._dynamic[v] = (self._dynamic[v] - s["median"]) / s["std"]
            self._dynamic = np.clip(self._dynamic, -10.0, 10.0)

        # native-engine caches (built lazily by get_batch)
        self._dyn_f32 = self._anom_f32 = self._ext_f32 = None

        if window_size > 1:
            self._dynamic = _window_mean(self._dynamic, window_size, (2, 3))
            self._anomaly = _window_mean(
                self._anomaly.astype(np.float32), window_size, (2, 3))
            self._extreme = _window_mean(
                self._extreme.astype(np.float32), window_size, (1, 2))
            if self._static is not None:
                self._static = _window_mean(self._static, window_size, (1, 2))

    # -- reference properties (dataset/Synthetic_dataset.py:387-405) --
    @property
    def anomaly(self):
        return self._anomaly

    @property
    def extreme(self):
        return self._extreme

    @property
    def timestep(self):
        return self._timestep

    @property
    def datacube_dynamic(self):
        return self._dynamic

    def __len__(self):
        return self._dynamic.shape[1] - self.delta_t + 1

    # -- native fused batch path (idee_tpu/native: the C++ OpenMP engine
    # replacing the reference's torch DataLoader C++ workers) --

    def _draw_aug(self):
        """Augmentation flags with the same RNG draw sequence as
        __getitem__, composed into (flip_h, flip_w): rot90(k=2) flips both
        axes; np.flip(axis=-ax) flips W (ax=1) or H (ax=2)."""
        rot = bool(self._rng.integers(2)) if self.is_aug else False
        fh = fw = rot
        if self.is_aug and self._rng.integers(2):
            ax = int(self._rng.integers(1, 3))
            if ax == 1:
                fw = not fw
            else:
                fh = not fh
        return fh, fw

    def get_batch(self, indices) -> Optional[Dict[str, np.ndarray]]:
        """Assemble a whole collated batch in one native call; returns None
        when the engine is unavailable (caller falls back to __getitem__)."""
        from idee_tpu import native

        if not native.available():
            return None
        if self._anom_f32 is None:
            self._dyn_f32 = np.ascontiguousarray(self._dynamic, np.float32)
            self._anom_f32 = np.ascontiguousarray(self._anomaly, np.float32)
            self._ext_f32 = np.ascontiguousarray(self._extreme, np.float32)

        B = len(indices)
        base = np.asarray(indices, np.int64)
        fh = np.zeros(B, np.uint8)
        fw = np.zeros(B, np.uint8)
        for b in range(B):
            h, w = self._draw_aug()
            fh[b], fw[b] = h, w

        x, me, mel, mel_t, ma = native.synth_batch(
            self._dyn_f32, self._ext_f32, self._anom_f32, base, fh, fw,
            self.delta_t)
        dt = self.delta_t
        week = np.stack([np.flip(self._week[i:i + dt] + 1)
                         for i in indices]).astype(np.float32)
        tstep = np.asarray([[self._timestep[i + dt - 1]] for i in indices],
                           np.float32)
        batch = {
            "x": x, "week": week, "mask_extreme": me,
            "mask_extreme_loss": mel, "mask_extreme_loss_t": mel_t,
            "mask_anomaly": ma, "timestep": tstep,
        }
        if self._static is not None:
            stat = np.broadcast_to(
                self._static[None], (B,) + self._static.shape).copy()
            for b in range(B):
                if fh[b]:
                    stat[b] = stat[b, :, ::-1, :]
                if fw[b]:
                    stat[b] = stat[b, :, :, ::-1]
            batch["static"] = np.ascontiguousarray(stat, np.float32)
        return batch

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        dt = self.delta_t
        x = np.flip(self._dynamic[:, index:index + dt], 1)[:, None]  # [V,1,T,H,W]
        week = np.flip(self._week[index:index + dt] + 1)
        tstep = np.array([self._timestep[index + dt - 1]], np.float32)

        mask_extreme = self._extreme[index + dt - 1].copy()
        mask_extreme[mask_extreme > 1] = 0

        # union of extremes over the window, clamped to 1 (values > 1 count
        # as extreme here, unlike mask_extreme; reference: :346-349)
        mel = self._extreme[index:index + dt].sum(0)
        mask_extreme_loss = np.clip(mel, 0, 1)

        # time-reversed per-timestep window extremes, used by the
        # reconstruction baselines (reference: Baselines_Reconstruction/
        # dataset/Synthetic_dataset.py:366-369 keeps the full [dt, H, W]
        # cube instead of the summed union)
        mask_extreme_loss_t = np.flip(
            self._extreme[index:index + dt].copy(), 0)

        mask_anomaly = np.flip(self._anomaly[:, index:index + dt], 1)

        static = self._static.copy() if self._static is not None else None

        if self.is_aug:
            if self._rng.integers(2):
                args = dict(k=2, axes=(-1, -2))
                x = np.rot90(x, **args)
                mask_extreme = np.rot90(mask_extreme, **args)
                mask_extreme_loss = np.rot90(mask_extreme_loss, **args)
                mask_extreme_loss_t = np.rot90(mask_extreme_loss_t, **args)
                mask_anomaly = np.rot90(mask_anomaly, **args)
                if static is not None:
                    static = np.rot90(static, **args)
            if self._rng.integers(2):
                ax = int(self._rng.integers(1, 3))
                x = np.flip(x, axis=-ax)
                mask_extreme = np.flip(mask_extreme, axis=-ax)
                mask_extreme_loss = np.flip(mask_extreme_loss, axis=-ax)
                mask_extreme_loss_t = np.flip(mask_extreme_loss_t, axis=-ax)
                mask_anomaly = np.flip(mask_anomaly, axis=-ax)
                if static is not None:
                    static = np.flip(static, axis=-ax)

        item = {
            "x": np.ascontiguousarray(x, np.float32),
            "week": np.ascontiguousarray(week, np.float32),
            "mask_extreme": np.ascontiguousarray(mask_extreme, np.float32),
            "mask_extreme_loss": np.ascontiguousarray(
                mask_extreme_loss, np.float32),
            "mask_extreme_loss_t": np.ascontiguousarray(
                mask_extreme_loss_t, np.float32),
            "mask_anomaly": np.ascontiguousarray(mask_anomaly, np.float32),
            "timestep": tstep,
        }
        if static is not None:
            item["static"] = np.ascontiguousarray(static, np.float32)
        return item
