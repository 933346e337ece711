#!/usr/bin/env python
# ------------------------------------------------------------------
"""Train the baseline zoo end-to-end and record anomaly-F1 per baseline.

VERDICT r2 #7: all 7 baselines existed with unit tests but none had ever
been trained to a number. This harness trains the four families'
representatives (DeepMIL for MIL, SimpleNet for one-class, STEAL and UniAD
for reconstruction) on the same generated benchmark cube the core accuracy
runs use (data/fake.py make_benchmark_cube), through the real drivers --
so the MIL masked-dense top-k losses and the is_replace_anomaly dataset
mode run under actual optimization.

Geometry: 48x48 (VERDICT: "48x48 is fine"), 6 vars, 40y cube split
34y/6y like the reference protocol (Baselines_MIL/train_deepmil_synthetic
.py:32 et al.). Results -> one JSON with best val anomaly-F1 per baseline
(majority-vote timeline, evaluator_anomaly_synthetic semantics).

Usage: python scripts/train_baselines_zoo.py [--which deepmil,simplenet,
       steal,uniad] [--epochs 6] [--out /tmp/baseline_zoo.json]

--which accepts all seven baselines (deepmil, arnet, rtfm, mgfn,
simplenet, steal, uniad). --pretrained points SimpleNet's frozen backbone
at a trained core checkpoint (the reference protocol,
Baselines_OneClass/models/build_simplenet.py:146-163: SimpleNet scores
features of the PRETRAINED encoder; with a random frozen backbone the
discriminator maps everything to one score and the median-threshold
anomaly map degenerates to empty).
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(which: str, cube, hw: int, epochs: int, years: int,
            dir_log: str, pretrained: str = None):
    from idee_tpu.baselines.config import (mil_config, oneclass_config,
                                           recon_config)

    n_time = years * 52
    t_train = 34 * 52 if years > 34 else int(n_time * 0.85)
    train_cube = cube.time_slice(1, t_train)
    val_cube = cube.time_slice(t_train + 1, n_time)
    common = dict(
        in_channels_dynamic=6,
        name=f"zoo_{which}_{hw}", dir_log=dir_log,
        x_max=hw, y_max=hw,
        times_train=(1, t_train), times_val=(t_train + 1, n_time),
        n_epochs=epochs, batch_size=8,
        is_aug=True, is_clima_scale=False,
    )

    t0 = time.time()
    if which in ("deepmil", "arnet", "rtfm", "mgfn"):
        from idee_tpu.baselines.mil.driver import train_mil_synthetic

        cfg = mil_config(**common)
        hist = train_mil_synthetic(cfg, which, train_cube=train_cube,
                                   val_cube=val_cube)
    elif which == "simplenet":
        from idee_tpu.baselines.oneclass.driver import (
            train_simplenet_synthetic)

        cfg = oneclass_config(model_pretrained=pretrained, **common)
        hist = train_simplenet_synthetic(cfg, train_cube=train_cube,
                                         val_cube=val_cube)
    elif which in ("steal", "uniad"):
        from idee_tpu.baselines.recon.driver import train_recon_synthetic

        kw = dict(common)
        if which == "uniad":
            kw.update(delta_t=1, inplanes=6,
                      feature_size=(hw // 2, hw // 2))
        cfg = recon_config(**kw)
        hist = train_recon_synthetic(cfg, which, train_cube=train_cube,
                                     val_cube=val_cube)
    else:
        raise SystemExit(f"unknown baseline {which}")

    hist.pop("state", None)
    hist.pop("bb_variables", None)  # oneclass driver returns jax arrays
    f1s = [v for v in hist.get("val_anom_f1", [])
           if v is not None and v == v]
    return {
        "baseline": which,
        "epochs": epochs,
        "best_val_anom_f1": max(f1s) if f1s else None,
        "final_val_loss": (hist.get("val_loss") or [None])[-1],
        "steps_per_sec": (hist.get("steps_per_sec") or [None])[-1],
        "history": hist,
        "secs": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="deepmil,simplenet,steal,uniad")
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--years", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dir_log", default="/tmp/zoo_runs")
    ap.add_argument("--out", default="/tmp/baseline_zoo.json")
    ap.add_argument("--pretrained", default=None,
                    help="core checkpoint dir for SimpleNet's frozen "
                    "backbone (orbax; e.g. a best_F1_model from "
                    "train_benchmark_accuracy.py)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu when the TPU "
                    "is busy with a training run)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from idee_tpu.data.fake import make_benchmark_cube

    cube = make_benchmark_cube(n_vars=6, n_time=args.years * 52,
                               height=args.hw, width=args.hw,
                               seed=args.seed)

    results = []
    for which in args.which.split(","):
        res = run_one(which.strip(), cube, args.hw, args.epochs,
                      args.years, args.dir_log, pretrained=args.pretrained)
        results.append(res)
        print(json.dumps({k: res[k] for k in
                          ("baseline", "best_val_anom_f1",
                           "final_val_loss", "secs")}), flush=True)
        with open(args.out, "w") as f:  # checkpoint after each baseline
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
