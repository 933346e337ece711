# ------------------------------------------------------------------
"""Device-resident synthetic dataset: slice training windows ON the chip.

The reference (and our host DataLoader) re-uploads every delta_t window as
a fresh [V, 1, dt, H, W] tensor each step -- ~4 MB/step over the remote-TPU
tunnel, which bounds training throughput well below the chip's step time.
The synthetic cube is small (200x200 x ~2000 weeks x 6 vars ~ 1 GB bf16),
so the TPU-native formulation uploads the NORMALIZED cube once and performs
the window slice, time reversal, mask construction, and rot/flip
augmentation on device inside one jitted fetch (reference per-item
semantics: dataset/Synthetic_dataset.py:310-385).

Per-step host traffic drops to a [B] int32 index vector.
"""
# ------------------------------------------------------------------

import os
from typing import Optional

import numpy as np


class RealDeviceLoader:
    """Device-resident CERRA / ERA5-Land loader.

    The host DataLoader path uploads ~[V,2,dt,H,W] per sample per step --
    at the reference's real-world CERRA geometry (512x832 crop,
    dataset/CERRA_dataset.py:100-101) that is ~82 MB/step over the
    remote-TPU transport, which dominates the step. The TPU-native
    formulation precomputes each unique WEEK once on the host (normalized
    [V,2,H,W] data slab + the three VHI-engine masks,
    CERRA_dataset.py:452-518,525-551 semantics via the ReanalysisDataset
    primitives), uploads the per-week arrays once, and assembles the
    delta_t windows, mask unions, and rot/flip augmentation on device.
    Per-step host traffic drops to a [B] int32 index vector.

    Two index maps reproduce the reference's file plumbing exactly: items
    map to main-file weeks directly, and to NOAA weeks through the
    missing-week fallback (CERRA_dataset.py:236-278), so each unique NOAA
    file-list is labeled once even when several items share it.

    Batches carry x, mask_extreme, mask_extreme_loss, mask_cold_surface,
    mask_cold_surface_loss (+ mask_sea / mask_no_vegetation when
    with_eval_masks=True) -- the keys steps_real.py consumes.
    """

    def __init__(self, ds, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 dtype=None, with_eval_masks: bool = False):
        import jax
        import jax.numpy as jnp

        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self.n = len(ds)
        dt = ds.delta_t

        # ---- host precompute: one slab + mask triple per unique week ----
        main_slot, noaa_slot = {}, {}
        main_idx = np.empty((self.n, dt), np.int32)
        noaa_idx = np.empty((self.n, dt), np.int32)
        for i, (files_main, files_noaa, _) in enumerate(ds.files):
            for d in range(dt):
                main_idx[i, d] = main_slot.setdefault(files_main[d],
                                                      len(main_slot))
                key = tuple(files_noaa[d])
                noaa_idx[i, d] = noaa_slot.setdefault(key, len(noaa_slot))

        Hc, Wc = ds.n_lat_window, ds.n_lon_window
        V = ds.var_n_dynamic
        xw = np.empty((len(main_slot), V, 2, Hc, Wc), np.float32)
        for path, s in main_slot.items():
            xw[s] = self._normalized_week(path)
        d35 = np.empty((len(noaa_slot), Hc, Wc), np.uint8)
        dthr = np.empty_like(d35)
        cold = np.empty_like(d35)
        for files, s in noaa_slot.items():
            dr35, cd = ds.generate_mask(list(files), thr=35)
            drt, _ = ds.generate_mask(list(files), thr=ds.threshold)
            d35[s], dthr[s], cold[s] = dr35, drt, cd

        if ds.is_reduce:
            sea, noveg = ds.mask_water_scaled, ds.mask_no_vegetation_scaled
        else:
            sea, noveg = ds.mask_water, ds.mask_no_vegetation

        x_dtype = dtype or jnp.float32
        put = jax.device_put
        arrays = {
            "xw": put(jnp.asarray(xw, x_dtype)),
            "d35": put(jnp.asarray(d35)),
            "dthr": put(jnp.asarray(dthr)),
            "cold": put(jnp.asarray(cold)),
            "sea": put(jnp.asarray(sea, jnp.float32)),
            "noveg": put(jnp.asarray(noveg, jnp.float32)),
            "main_idx": put(jnp.asarray(main_idx)),
            "noaa_idx": put(jnp.asarray(noaa_idx)),
        }
        is_aug = bool(ds.is_aug)

        def one(a, i, key):
            mi = a["main_idx"][i]  # [dt]
            ni = a["noaa_idx"][i]
            # [dt,V,2,H,W] -> [V,2,dt,H,W]; index 0 IS the target week
            # (the reanalysis window is already newest-first,
            # CERRA_dataset.py:114-137 -- unlike the synthetic path there
            # is no time flip)
            x = jnp.transpose(jnp.take(a["xw"], mi, axis=0), (1, 2, 0, 3, 4))
            me = jnp.take(a["dthr"], ni[0], axis=0).astype(jnp.float32)
            mel = jnp.clip(jnp.sum(jnp.take(a["d35"], ni, axis=0)
                                   .astype(jnp.float32), 0), 0.0, 1.0)
            cw = jnp.take(a["cold"], ni, axis=0).astype(jnp.float32)
            # cold-surface loss union EXCLUDES the target step
            # (CERRA_dataset.py:594-595)
            mcl = jnp.clip(jnp.sum(cw[1:], 0), 0.0, 1.0)
            out = {"x": x, "mask_extreme": me, "mask_extreme_loss": mel,
                   "mask_cold_surface": cw[0],
                   "mask_cold_surface_loss": mcl}
            if with_eval_masks:
                out["mask_sea"] = a["sea"]
                out["mask_no_vegetation"] = a["noveg"]
            if is_aug:
                # rot90(k=2) == flip H+W, then one random-axis flip --
                # the same composite as the host path
                # (reanalysis.py __getitem__ / Synthetic_dataset.py:355-373)
                r = jax.random.bernoulli(key, 0.5, (3,))
                fh = jnp.logical_xor(r[0], r[1] & ~r[2])
                fw = jnp.logical_xor(r[0], r[1] & r[2])

                def flip2(t):
                    t = jnp.where(fh, jnp.flip(t, -2), t)
                    return jnp.where(fw, jnp.flip(t, -1), t)

                out = {k: flip2(v) for k, v in out.items()}
            return out

        def batch_from(a, idx, key):
            keys = jax.random.split(key, idx.shape[0])
            return jax.vmap(one, in_axes=(None, 0, 0))(a, idx, keys)

        fetch = jax.jit(batch_from)
        self._arrays = arrays
        self._batch_from = batch_from
        self._fetch = lambda idx, key: fetch(arrays, idx, key)
        self._key = jax.random.PRNGKey(seed)

    def _normalized_week(self, path):
        """One week's normalized [V, 2, H, W] slab -- the per-week
        restriction of ReanalysisDataset.__getitem__'s normalize/clip/
        nan-fill/reduce tail (separable across the window because every
        step normalizes by its own week's statistics)."""
        ds = self.ds
        x = ds.load_datacube([path])  # [V, 2, 1, H, W]
        if ds.is_norm:
            if ds.is_clima_scale:
                week = float(int(os.path.basename(path)[4:7]))
                wk = [ds._clima_week_lut[week]]
                mean = np.flip(ds._clima_mean[:, :, wk], -2)
                std = np.flip(ds._clima_std[:, :, wk], -2)
                with np.errstate(all="ignore"):
                    x = (x - mean) / std
            else:
                m = ds._mean_var[:, None, None, None].astype(np.float32)
                s = ds._std_var[:, None, None, None].astype(np.float32)
                x = np.stack([(x[:, 0] - m) / s, x[:, 1] / s], axis=1)
            x = np.clip(x, -10.0, 10.0)
        x[np.isnan(x) | np.isinf(x)] = ds.nan_fill
        if ds.is_reduce:
            from idee_tpu.data.synthetic import _window_mean

            with np.errstate(all="ignore"):
                x = _window_mean(x, ds.window_size, (3, 4))
        return x[:, :, 0]

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    # ---- fused-epoch (lax.scan) interface: see DeviceLoader ----

    def epoch_order(self):
        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        self._epoch += 1
        nb = len(self)
        return (order[:nb * self.batch_size]
                .reshape(nb, self.batch_size).astype(np.int32), self._epoch)

    def traced_batch(self, arrays, idx, epoch, b):
        import jax

        key = jax.random.fold_in(self._key, epoch * 100003 + b)
        return self._batch_from(arrays, idx, key)

    @property
    def arrays(self):
        """Device-array dict pytree for the fused-epoch scan."""
        return self._arrays

    def __iter__(self):
        import jax

        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        self._epoch += 1
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            key = jax.random.fold_in(self._key, self._epoch * 100003 + b)
            yield self._fetch(np.asarray(idx, np.int32), key)

    def close(self):
        pass


class DeviceLoader:
    """Iterable over device-resident batches, mirroring DataLoader's
    protocol (len = steps/epoch; iteration yields dict batches).

    Batches contain x, mask_extreme, mask_extreme_loss, timestep and
    (with_anomaly=True) mask_anomaly -- the keys the jitted train/eval steps
    and the TensorBoard panels consume.
    """

    def __init__(self, ds, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 dtype=None, with_anomaly: bool = False):
        import jax
        import jax.numpy as jnp

        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self.n = len(ds)

        dt = ds.delta_t
        V, T, H, W = ds.datacube_dynamic.shape
        x_dtype = dtype or jnp.float32
        dyn = jax.device_put(jnp.asarray(ds.datacube_dynamic, x_dtype))
        ext = jax.device_put(jnp.asarray(
            np.ascontiguousarray(ds.extreme, np.float32)))
        anom = None
        if with_anomaly:
            anom = jax.device_put(jnp.asarray(
                np.ascontiguousarray(ds.anomaly, np.uint8)))
        t0 = float(ds.timestep[0])
        is_aug = bool(ds.is_aug)
        has_anom = anom is not None
        self._dt, self._t0 = dt, t0

        # NOTE the cube arrays are ARGUMENTS of the jitted fetch, not
        # closure captures: a closed-over concrete array is embedded into
        # the lowered HLO as a literal constant, which at real geometries
        # (40y x 200x200 ~ 0.85 GB bf16) bloats the compile payload until
        # the remote-compile transport breaks (observed: 85-minute hang
        # then "remote_compile: Broken pipe" on the axon tunnel)
        def one(dyn, ext, anom, i, key):
            x = jax.lax.dynamic_slice(dyn, (0, i, 0, 0), (V, dt, H, W))
            x = jnp.flip(x, 1)[:, None]  # [V, 1, dt, H, W] time-reversed
            ew = jax.lax.dynamic_slice(ext, (i, 0, 0), (dt, H, W))
            me = ew[-1]
            me = jnp.where(me > 1.0, 0.0, me)  # values > 1 zeroed (:342-343)
            mel = jnp.clip(ew.sum(0), 0.0, 1.0)  # union over window (:346)
            out = {"x": x, "mask_extreme": me, "mask_extreme_loss": mel}
            if has_anom:
                a = jax.lax.dynamic_slice(anom, (0, i, 0, 0), (V, dt, H, W))
                out["mask_anomaly"] = jnp.flip(a, 1)
            if is_aug:
                # same composite as the host path (rot90 k=2 == flip H+W,
                # then one random-axis flip; Synthetic_dataset.py:355-373)
                r = jax.random.bernoulli(key, 0.5, (3,))
                fh = jnp.logical_xor(r[0], r[1] & ~r[2])
                fw = jnp.logical_xor(r[0], r[1] & r[2])

                def flip2(t):
                    t = jnp.where(fh, jnp.flip(t, -2), t)
                    return jnp.where(fw, jnp.flip(t, -1), t)

                out = {k: flip2(v) for k, v in out.items()}
            return out

        def batch_from(dyn, ext, anom, idx, key):
            keys = jax.random.split(key, idx.shape[0])
            out = jax.vmap(one, in_axes=(None, None, None, 0, 0))(
                dyn, ext, anom, idx, keys)
            out["timestep"] = (idx.astype(jnp.float32)
                               + (dt - 1) + t0)[:, None]
            return out

        fetch = jax.jit(batch_from)

        if not has_anom:  # placeholder leaf so the jit signature is uniform
            anom = jnp.zeros((), jnp.uint8)
        self._arrays = (dyn, ext, anom)
        self._batch_from = batch_from
        self._fetch = lambda idx, key: fetch(dyn, ext, anom, idx, key)
        self._key = jax.random.PRNGKey(seed)

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    # ---- fused-epoch (lax.scan) interface ----------------------------
    # Per-step dispatch over the remote-TPU tunnel costs ~90 ms of
    # host/transport overhead; train/steps.py::make_train_epoch scans the
    # whole epoch inside one jitted call and uses these hooks to build
    # each batch ON device with rng identical to the __iter__ path.

    def epoch_order(self):
        """Advance one epoch; return ([nb, B] int32 index matrix, epoch#).

        Same permutation stream as __iter__ (shared numpy Generator), so a
        fused epoch consumes the identical sample order the per-step path
        would have.
        """
        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        self._epoch += 1
        nb = len(self)
        return (order[:nb * self.batch_size]
                .reshape(nb, self.batch_size).astype(np.int32), self._epoch)

    def traced_batch(self, dyn, ext, anom, idx, epoch, b):
        """Traceable batch constructor for use inside lax.scan: batch `b`
        of epoch `epoch` (both may be traced scalars) from the
        device-resident arrays. rng formula matches __iter__ exactly
        (fold_in(key, epoch * 100003 + b))."""
        import jax

        key = jax.random.fold_in(self._key, epoch * 100003 + b)
        return self._batch_from(dyn, ext, anom, idx, key)

    @property
    def arrays(self):
        """(dynamic, extreme, anomaly-or-placeholder) device arrays."""
        return self._arrays

    def __iter__(self):
        import jax

        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        self._epoch += 1
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            key = jax.random.fold_in(self._key, self._epoch * 100003 + b)
            yield self._fetch(np.asarray(idx, np.int32), key)

    def close(self):  # DataLoader interface parity
        pass
