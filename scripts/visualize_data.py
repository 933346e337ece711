#!/usr/bin/env python
# ------------------------------------------------------------------
"""CLI: browse raw datacubes with matplotlib
(reference: vis/visualize_{synthetic,CERRA,ERA5-Land,NOAA}_data.py).

Usage:
  python scripts/visualize_data.py --dataset synthetic --root <dir> \
      [--timestep 0] [--out panel.png]

Renders one panel per variable (plus anomaly/extreme layers for the
synthetic cube) at the chosen timestep; saves to --out or shows
interactively.
"""
# ------------------------------------------------------------------

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def vis_synthetic(root, timestep, out):
    import matplotlib

    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from idee_tpu.data.netcdf import NetCDFFile

    exp = os.path.basename(os.path.normpath(root))
    with NetCDFFile(os.path.join(root, f"datacube_{exp}.nc")) as f:
        variables = [v.decode() if isinstance(v, bytes) else str(v)
                     for v in np.asarray(f.coord("var"))]
        layers = [f.read(v)[timestep] for v in variables]
        extreme = f.read("extreme")[timestep]

    n = len(layers) + 1
    cols = min(n, 4)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3.2 * rows),
                             squeeze=False)
    for i, (name, layer) in enumerate(zip(variables + ["extreme"],
                                          layers + [extreme])):
        ax = axes[i // cols][i % cols]
        im = ax.imshow(layer, cmap="cividis")
        ax.set_title(f"{name} @ t={timestep}")
        fig.colorbar(im, ax=ax, shrink=0.8)
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=120)
        print(f"saved {out}")
    else:
        plt.show()


def vis_reanalysis(root, year, week, out, family):
    import matplotlib

    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from idee_tpu.data.netcdf import NetCDFFile

    wnr = f"{week:03d}"
    path = os.path.join(root, str(year), f"{year}{wnr}.nc")
    with NetCDFFile(path) as f:
        names = [k for k in f.keys() if k not in ("statistic",)]
        layers = {k: f.read(k) for k in names}

    n = len(layers)
    cols = min(n, 3)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3.2 * rows),
                             squeeze=False)
    for i, (name, layer) in enumerate(layers.items()):
        ax = axes[i // cols][i % cols]
        data = layer[0] if layer.ndim == 3 else layer  # 'mean' statistic
        im = ax.imshow(data, cmap="cividis")
        ax.set_title(f"{family} {name} {year}w{week}")
        fig.colorbar(im, ax=ax, shrink=0.8)
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=120)
        print(f"saved {out}")
    else:
        plt.show()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True,
                    choices=["synthetic", "cerra", "era5_land", "noaa"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--timestep", type=int, default=0)
    ap.add_argument("--year", type=int, default=1990)
    ap.add_argument("--week", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.dataset == "synthetic":
        vis_synthetic(args.root, args.timestep, args.out)
    else:
        vis_reanalysis(args.root, args.year, args.week, args.out,
                       args.dataset.upper())


if __name__ == "__main__":
    main()
