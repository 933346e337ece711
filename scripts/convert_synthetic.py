#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: convert a reference-schema synthetic NetCDF directory into the
framework-native .npz (one memory-mappable file with data, labels,
statistics, and climatology; see idee_tpu/data/convert.py).

Usage: python scripts/convert_synthetic.py --root <dir> [--out <path>]
"""
# ------------------------------------------------------------------

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from idee_tpu.data.convert import convert_synthetic

    out = convert_synthetic(args.root, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
