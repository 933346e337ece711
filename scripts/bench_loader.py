#!/usr/bin/env python
# ------------------------------------------------------------------
"""Host input-pipeline throughput: loader variants measured head-to-head.

VERDICT r2 weak #8: the thread-pool loader workers share the GIL --
h5py/scipy release it during file IO, but the per-item numpy
normalization/augment work does not, and no loader-throughput measurement
existed for either the direct-NetCDF path or the mmap cache. This harness
measures batches/s and items/s (host wall clock -- unaffected by the TPU
tunnel sync caveat) for:

  synthetic cube   : numpy per-item collate vs the native C++ OpenMP engine
  reanalysis direct: per-item NetCDF decode + VHI labels, serial vs threads
  reanalysis cache : mmap npz cache (scripts/convert_reanalysis.py), serial
                     vs threads

Reference context: torch DataLoader(num_workers=8) forks PROCESSES
(train_synthetic.py:79-90); our workers are threads (data/loader.py:158).
This bench quantifies what that costs on each path. Runs entirely on CPU
(jax platform forced) so it never touches a busy TPU.

Usage: python scripts/bench_loader.py [--hw 64] [--batch 8] [--iters 12]
       [--out /tmp/bench_loader.json]
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(loader, iters, label, batch, rows):
    # one warm pass primes mmaps / native caches / page cache
    it = iter(loader)
    next(it)
    del it
    n, t0 = 0, time.perf_counter()
    while n < iters:
        for b in loader:
            n += 1
            if n >= iters:
                break
    dt = time.perf_counter() - t0
    row = {"variant": label, "batches_per_sec": round(n / dt, 2),
           "items_per_sec": round(n * batch / dt, 1),
           "ms_per_batch": round(dt / n * 1e3, 1)}
    rows.append(row)
    print(f"{label:42s} {row['ms_per_batch']:8.1f} ms/batch "
          f"{row['items_per_sec']:8.1f} items/s", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--out", default="/tmp/bench_loader.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # never touch the TPU

    from idee_tpu.data.fake import make_fake_cube, write_fake_reanalysis
    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.reanalysis import ReanalysisDataset, cerra_spec
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu import native

    hw, batch, iters, workers = args.hw, args.batch, args.iters, args.workers
    rows = []
    print(f"# hw={hw} batch={batch} iters={iters} workers={workers} "
          f"native={'yes' if native.available() else 'NO'}", flush=True)

    # ---------- synthetic cube (RAM-resident; reference per-item semantics)
    cube = make_fake_cube(n_vars=6, n_time=64, height=hw, width=hw, seed=0)
    common = dict(cube=cube, times=(1, 64), variables=cube.variables,
                  variables_static=[], delta_t=8, is_norm=True,
                  is_clima_scale=False, x_min=0, x_max=hw, y_min=0, y_max=hw)
    keys = ["x", "mask_extreme", "mask_extreme_loss", "timestep"]

    ds = SyntheticDataset(is_aug=True, **common)
    dl = DataLoader(ds, batch, shuffle=True, drop_last=True, prefetch=0,
                    keys=keys)
    if native.available():
        timeit(dl, iters, "synthetic / C++ engine (get_batch)", batch, rows)
        ds_np = SyntheticDataset(is_aug=True, **common)
        ds_np.get_batch = lambda idx: None  # force the numpy per-item path
        dl_np = DataLoader(ds_np, batch, shuffle=True, drop_last=True,
                           prefetch=0, keys=keys)
        timeit(dl_np, iters, "synthetic / numpy per-item", batch, rows)
    else:
        timeit(dl, iters, "synthetic / numpy per-item", batch, rows)

    # ---------- reanalysis fixtures (direct NetCDF vs mmap cache)
    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        main_root = os.path.join(tmp, "CERRA")
        noaa_root = os.path.join(tmp, "NOAA")
        write_fake_reanalysis(main_root, noaa_root, years=("1990", "1991"),
                              height=hw, width=hw)
        spec = cerra_spec(8)
        spec.grid_height = hw
        spec.grid_width = hw
        rkw = dict(spec=spec, root_main=main_root, root_noaa=noaa_root,
                   delta_t=8, variables=["t2m", "tp", "al"],
                   variables_static=[], years=["1991"], is_aug=True,
                   is_norm=False, x_min=0, x_max=hw, y_min=0, y_max=hw)
        rkeys = ["x", "mask_extreme", "mask_extreme_loss"]

        direct = ReanalysisDataset(**rkw)
        timeit(DataLoader(direct, batch, shuffle=True, drop_last=True,
                          prefetch=0, keys=rkeys),
               iters, "reanalysis direct-NetCDF / serial", batch, rows)
        timeit(DataLoader(direct, batch, shuffle=True, drop_last=True,
                          prefetch=0, keys=rkeys, workers=workers),
               iters, f"reanalysis direct-NetCDF / {workers} threads",
               batch, rows)

        from idee_tpu.data.convert import convert_reanalysis

        cache = os.path.join(tmp, "cache")
        convert_reanalysis(spec=spec, root_main=main_root,
                           root_noaa=noaa_root, out_root=cache,
                           variables=["t2m", "tp", "al"],
                           years=["1990", "1991"], alpha=0.5,
                           x_min=0, x_max=hw, y_min=0, y_max=hw)
        cached = ReanalysisDataset(cache_root=cache, **rkw)
        timeit(DataLoader(cached, batch, shuffle=True, drop_last=True,
                          prefetch=0, keys=rkeys),
               iters, "reanalysis mmap cache / serial", batch, rows)
        timeit(DataLoader(cached, batch, shuffle=True, drop_last=True,
                          prefetch=0, keys=rkeys, workers=workers),
               iters, f"reanalysis mmap cache / {workers} threads",
               batch, rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump({"hw": hw, "batch": batch, "iters": iters,
                   "workers": workers, "cpus": os.cpu_count(),
                   "rows": rows}, f, indent=1)
    print(json.dumps({"out": args.out, "cpus": os.cpu_count()}))


if __name__ == "__main__":
    main()
