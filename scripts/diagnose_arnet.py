#!/usr/bin/env python
# ------------------------------------------------------------------
"""Root-cause the ARNet zoo anomaly (VERDICT r3 next-#5).

Observation: ARNet driver F1 0.540 at 32x32/2y/1 epoch but 0.040 at
48x48/40y/6 epochs -- a 13x degradation with MORE data and epochs, while
RTFM improved (0.372 -> 0.430) on the same cubes. Suspects named by the
review: center-loss scale vs instance count, top-k k = H*W // alpha_arnet
(reference Baselines_MIL/train_arnet_synthetic.py:121-122) vs bag size,
lr schedule.

This harness runs short controlled arms of the REAL MIL driver
(baselines/mil/driver.py train_mil_synthetic) on the same benchmark-cube
family and records per-epoch val driver F1 plus the majority-vote
predicted-positive rate (val_pred_rate) -- which separates "the scores
never cross the 0.5 anomaly threshold" (rate ~ 0; the trivial-negative
collapse) from "the ranking is poor".

It also prints the data yardsticks (val anomaly base rate, all-positive
F1) at each geometry, since the 32x32 zoo numbers sat close to the
all-positive line and the cross-geometry comparison is only meaningful
relative to those anchors.

Usage:
  python scripts/diagnose_arnet.py --hw 48 --years 40 --epochs 3 \
      --out /root/work/arnet_diag.json
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def yardsticks(cube, hw, years):
    """Val-split anomaly base rate and the all-positive predictor's F1."""
    import numpy as np

    n_time = years * 52
    t_train = 34 * 52 if years > 34 else int(n_time * 0.85)
    val = cube.time_slice(t_train + 1, n_time)
    rate = float(np.asarray(val.anomaly, np.float32).mean())
    return {"val_anom_rate": rate,
            "all_positive_f1": 2 * rate / (1 + rate)}


ARMS = {
    # reproduce the zoo configuration (3-epoch prefix of the 0.040 run)
    "base": {},
    # suspect 1: center loss (lambda_c=20) pulls every normal-bag score to
    # the bag mean -- with ~18k instance-scores per sample at 48x48 vs the
    # 5 top-k instances the DMIL BCE pushes up, it may dominate
    "no_center": {"loss_lambda_c_arnet": 0.0},
    # suspect 2: k = H*W // 400 (= 5 at 48x48) -- too few positives pushed
    # up per step to ever lift the dense map over the 0.5 threshold
    "k_x10": {"loss_alpha_arnet": 40.0},
    # suspect 3: lr -- ARNet's sigmoid-MLP head may need a gentler rate at
    # the larger instance count
    "lr_low": {"lr": 1e-4},
    # control: the 0.5-rate bernoulli instance drop halves effective k
    "no_drop": {"instance_drop_rate": 0.0},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--years", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--dir_log", default="/root/work/arnet_diag")
    ap.add_argument("--out", default="/root/work/arnet_diag.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from idee_tpu.baselines.config import mil_config
    from idee_tpu.baselines.mil.driver import train_mil_synthetic
    from idee_tpu.data.fake import make_benchmark_cube

    cube = make_benchmark_cube(n_vars=6, n_time=args.years * 52,
                               height=args.hw, width=args.hw,
                               seed=args.seed)
    n_time = args.years * 52
    t_train = 34 * 52 if args.years > 34 else int(n_time * 0.85)
    train_cube = cube.time_slice(1, t_train)
    val_cube = cube.time_slice(t_train + 1, n_time)

    results = {"hw": args.hw, "years": args.years, "epochs": args.epochs,
               "yardsticks": yardsticks(cube, args.hw, args.years),
               "arms": {}}
    print(json.dumps({"yardsticks": results["yardsticks"]}), flush=True)

    for arm in args.arms.split(","):
        kw = ARMS[arm]
        cfg = mil_config(
            in_channels_dynamic=6,
            name=f"arnet_diag_{arm}", dir_log=args.dir_log,
            x_max=args.hw, y_max=args.hw,
            times_train=(1, t_train), times_val=(t_train + 1, n_time),
            n_epochs=args.epochs, batch_size=8,
            is_aug=True, is_clima_scale=False,
            seed=args.seed, **kw)
        t0 = time.time()
        hist = train_mil_synthetic(cfg, "arnet", train_cube=train_cube,
                                   val_cube=val_cube)
        hist.pop("state", None)
        row = {"overrides": kw,
               "val_anom_f1": hist["val_anom_f1"],
               "val_pred_rate": hist["val_pred_rate"],
               "train_loss": hist["train_loss"],
               "val_loss": hist["val_loss"],
               "secs": round(time.time() - t0, 1)}
        results["arms"][arm] = row
        print(json.dumps({arm: row}), flush=True)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)

    print(json.dumps(results["arms"].get("base", {}).get("val_anom_f1")))


if __name__ == "__main__":
    main()
