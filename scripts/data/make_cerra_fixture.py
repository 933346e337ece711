#!/usr/bin/env python
# ------------------------------------------------------------------
"""Generate the real-geometry structured CERRA fixture for round-4 runs.

Writes a learnable CERRA-shaped dataset at the reference's published crop
geometry (512x832 -- dataset/CERRA_dataset.py:100-101) via
idee_tpu.data.fake.write_structured_reanalysis: 5 years (4 train + 1 val)
of weekly files with a causal driver->drought structure, plus the NOAA VHI
files, masks, statistics, and static variables the CERRA driver consumes.

Also supports the ERA5-Land EUR-11 region (412x424,
dataset/ERA5_Land_dataset.py:154-160) via --era5.

The real ~1.1 TB archive is not downloadable in this container (zero
egress); this fixture is the documented stand-in (BASELINE.md risk note).
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cerra_fixture")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--years", default="1989,1990,1991,1992,1993")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--era5", default="",
                    help="CORDEX region name (e.g. EUR-11); writes the "
                         "ERA5-Land layout instead of CERRA")
    ap.add_argument("--variables", default="",
                    help="comma-separated variable names to write "
                         "(default: CERRA 6-var list, or the first 6 of "
                         "the reference ERA5-Land list with --era5)")
    args = ap.parse_args()

    from idee_tpu.data.fake import write_structured_reanalysis

    t0 = time.perf_counter()
    main_root = os.path.join(args.root, "ERA5" if args.era5 else "CERRA")
    noaa_root = os.path.join(args.root, "NOAA")
    if args.variables:
        variables = args.variables.split(",")
    else:
        variables = (["d2m", "t2m", "fal", "sp", "e", "tp"] if args.era5
                     else None)
    info = write_structured_reanalysis(
        main_root, noaa_root,
        years=tuple(args.years.split(",")),
        height=args.height, width=args.width, seed=args.seed,
        era5_region=args.era5 or None, variables=variables,
        write_climatology=False)
    info["gen_seconds"] = round(time.perf_counter() - t0, 1)
    info["root_main"] = main_root
    info["root_noaa"] = noaa_root
    out = os.path.join(args.root, "fixture_info.json")
    with open(out, "w") as fh:
        json.dump(info, fh, indent=1)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
