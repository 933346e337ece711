#!/usr/bin/env python
# ------------------------------------------------------------------
"""Offline CERRA / ERA5-Land conversion CLI.

Converts the weekly NetCDF trees (reference layout root/<year>/<year><www>.nc
plus the NOAA VCI/TCI/cold files, dataset/CERRA_dataset.py:204-283) into the
framework's per-year mmap cache with precomputed VHI labels
(idee_tpu/data/convert.convert_reanalysis). Training then runs with
--cache_root <out> and performs zero NetCDF decoding in the hot loop.

Examples:
  python scripts/convert_reanalysis.py --family CERRA \
      --root_main /data/CERRA --root_noaa /data/NOAA_CERRA \
      --years 1984-2021 --out /data/cache_cerra \
      --variables t2m r2 tp ... --x_min 234 --x_max 1066 --y_min 322 --y_max 834
  python scripts/convert_reanalysis.py --family ERA5_Land --region EUR-11 ...
"""
# ------------------------------------------------------------------

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_years(spec):
    out = []
    for part in spec:
        if "-" in part:
            lo, hi = part.split("-")
            out += [str(y) for y in range(int(lo), int(hi) + 1)]
        else:
            out.append(part)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["CERRA", "ERA5_Land"],
                    required=True)
    ap.add_argument("--region", default="EUR-11",
                    help="CORDEX region (ERA5_Land only)")
    ap.add_argument("--root_main", required=True)
    ap.add_argument("--root_noaa", required=True)
    ap.add_argument("--years", nargs="+", required=True,
                    help="years or ranges, e.g. 1984-2021")
    ap.add_argument("--variables", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--x_min", type=int, default=0)
    ap.add_argument("--x_max", type=int, default=None)
    ap.add_argument("--y_min", type=int, default=0)
    ap.add_argument("--y_max", type=int, default=None)
    ap.add_argument("--grid", default=None,
                    help="override the spec's native grid as HxW (e.g. "
                    "512x832) -- for archives already stored at a crop "
                    "size, mirroring Config.grid_override in the drivers")
    ap.add_argument("--validate", action="store_true",
                    help="after converting, re-read the first year through "
                    "BOTH the cache and the direct-NetCDF path and compare "
                    "item-for-item (first run against real archive files "
                    "should use this -- the adapters are developed against "
                    "schema fixtures only, BASELINE.md)")
    args = ap.parse_args()

    from idee_tpu.data.convert import convert_reanalysis
    from idee_tpu.data.reanalysis import cerra_spec, era5_land_spec

    if args.family == "CERRA":
        spec = cerra_spec(delta_t=8)
        root_main, root_noaa = args.root_main, args.root_noaa
    else:
        spec = era5_land_spec(args.region, delta_t=8)
        root_main = os.path.join(args.root_main, args.region)
        root_noaa = os.path.join(args.root_noaa, args.region)

    if args.grid:
        h, w = (int(v) for v in args.grid.split("x"))
        spec.grid_height, spec.grid_width = h, w

    years = parse_years(args.years)
    t0 = time.time()
    out = convert_reanalysis(spec, root_main, root_noaa, years,
                             args.variables, args.out, alpha=args.alpha,
                             x_min=args.x_min, x_max=args.x_max,
                             y_min=args.y_min, y_max=args.y_max)
    print(f"cache written to {out} ({len(years)} years, "
          f"{time.time() - t0:.1f}s)")

    if args.validate:
        # round-trip check: first converted year, cache path vs the direct
        # NetCDF decode path, item-for-item on a few samples
        import numpy as np

        from idee_tpu.data.reanalysis import ReanalysisDataset

        common = dict(spec=spec, root_main=root_main, root_noaa=root_noaa,
                      variables=args.variables, years=[years[0]],
                      is_aug=False, is_norm=True, is_clima_scale=False,
                      alpha=args.alpha, x_min=args.x_min, x_max=args.x_max,
                      y_min=args.y_min, y_max=args.y_max)
        direct = ReanalysisDataset(**common)
        cached = ReanalysisDataset(cache_root=out, **common)
        assert len(direct) == len(cached), (len(direct), len(cached))
        idxs = sorted({0, len(direct) // 2, len(direct) - 1})
        for i in idxs:
            a, b = direct[i], cached[i]
            for k in a:
                np.testing.assert_allclose(
                    a[k], b[k], rtol=1e-5, atol=1e-5,
                    err_msg=f"cache/direct mismatch at item {i} key {k}")
        print(f"validate: {len(idxs)} items bit-compared across "
              f"{len(a)} keys -- cache matches the direct NetCDF path")


if __name__ == "__main__":
    main()
