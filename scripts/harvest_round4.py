#!/usr/bin/env python
# ------------------------------------------------------------------
"""Summarize round-4 chip-chain artifacts for BASELINE.md harvesting.

The round-4 queues (scripts/round4_{cerra,queue2,queue3}.sh) write their
results to /root/work/*.json and the driver log trees; this script reads
whatever exists and prints one compact markdown-ready block per
deliverable (VERDICT r3 next-items #1, #4, #5, #7, #8 and the memory
probes). It never edits BASELINE.md -- harvesting stays a reviewed,
manual edit (the round-3 auto-harvester's regex surgery produced two
bugs; this one only reports).

Usage: python scripts/harvest_round4.py
"""
# ------------------------------------------------------------------

import json
import os
import re

WORK = "/root/work"


def _load(path):
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def _last_json_line(path):
    """memory_fit output files mix warnings with the JSON line (2>&1)."""
    try:
        with open(path) as fh:
            lines = [l.strip() for l in fh if l.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None


def real_run(tag, logname):
    hist = _load(os.path.join(WORK, "log", logname, "history.json"))
    if hist is None:
        print(f"[{tag}] history.json not written yet ({logname})")
        return
    vf = hist.get("val_f1") or []
    sps = hist.get("steps_per_sec") or []
    # NaN-safe best: the synthetic driver's _nanmean serializes NaN for
    # all-NaN epochs and max() over a NaN-bearing list is order-dependent
    finite = [v for v in vf if v == v]
    best = max(finite) if finite else None
    best_ep = (vf.index(best) + 1) if finite else None
    steady = sorted(sps[1:] or sps)[len(sps[1:] or sps) // 2] if sps else None
    print(f"[{tag}] epochs={len(vf)} best_val_F1={best} (epoch {best_ep}) "
          f"median_steps_per_sec(excl. compile epoch)={steady}")
    print(f"  val_f1 per epoch: {[round(v, 3) for v in vf]}")
    print(f"  steps/s per epoch: {[round(s, 3) for s in sps]}")


def acc_json(tag, name, logname=None):
    p = _load(os.path.join(WORK, name))
    if p is None and logname:
        # run killed by the queue timeout before writing its summary JSON:
        # fall back to the per-epoch history.json flush (driver.py)
        hist = _load(os.path.join(WORK, "log", logname, "history.json"))
        if hist:
            vf = [v for v in hist.get("val_f1") or [] if v == v]
            va = [v for v in hist.get("val_anom_f1") or [] if v == v]
            p = {"encoder": logname, "codebook": "(from history.json)",
                 "history": hist,
                 "best_val_f1": max(vf) if vf else 0.0,
                 "best_val_anom_f1": max(va) if va else 0.0}
    if p is None:
        print(f"[{tag}] {name} missing")
        return
    print(f"[{tag}] encoder={p.get('encoder')} codebook={p.get('codebook')} "
          f"best_val_extremes_F1={p.get('best_val_f1')} "
          f"best_val_driver_F1={p.get('best_val_anom_f1')} "
          f"epochs={len(p.get('history', {}).get('val_f1', []) or [])}")


def main():
    print("== CERRA 512x832 (VERDICT #1) ==")
    real_run("cerra512_CNN_3D", "cerra512_CNN_3D")

    print("\n== ERA5-Land EUR-11 412x424 (VERDICT #7) ==")
    real_run("era5_eur11_CNN_3D", "era5_eur11_CNN_3D")

    print("\n== codebook variants @48x48 (VERDICT #4) ==")
    # explicit tags: deriving from name.split('_') labeled VQ_EMA as 'VQ'
    for tag, name, logname in (
            ("LFQ", "acc_cnn48_LFQ.json", "acc_CNN_3D_48"),
            ("VQ_EMA", "acc_cnn48_VQ_EMA.json", "acc_CNN_3D_48_VQ_EMA"),
            ("FSQ", "acc_cnn48_FSQ.json", "acc_CNN_3D_48_FSQ")):
        acc_json(tag, name, logname)

    print("\n== Mamba d_state sweep @48x48 (round 5, VERDICT r4 #7) ==")
    for ds in (1, 4, 16):
        acc_json(f"ds{ds}", f"acc_mamba48_ds{ds}.json",
                 f"acc_Mamba_48_ds{ds}")

    print("\n== VQ-EMA anchored (commitment 0.25) arm (round 5) ==")
    acc_json("VQ_EMA_commit", "acc_cnn48_VQ_EMA_commit.json",
             "acc_CNN_3D_48_VQ_EMA_commit0.25")

    print("\n== CERRA device-compute step bound (round 5) ==")
    sb = _load(os.path.join(WORK, "cerra_step_bench.json"))
    print(json.dumps(sb) if sb else "cerra_step_bench.json missing")

    print("\n== Swin attention A/B benches (round 5) ==")
    for f in ("bench_swin_control", "bench_swin_bf16scores",
              "bench_swin_pallas", "bench_swin_b2remat",
              "bench_headline_r5"):
        row = _last_json_line(os.path.join(WORK, f + ".json"))
        print(f"  {f}: {json.dumps(row) if row else 'missing'}")

    print("\n== native-density 200x200 capped-BCE arm (VERDICT #8) ==")
    acc_json("native_capped", "acc_cnn200_native_capped.json",
             "acc_CNN_3D_200_capped")

    print("\n== ARNet diagnosis (VERDICT #5) ==")
    diag = _load(os.path.join(WORK, "arnet_diag.json"))
    if diag is None:
        print("arnet_diag.json missing")
    else:
        print(json.dumps(diag.get("yardsticks", {})))
        for arm, row in diag.get("arms", {}).items():
            print(f"  {arm}: {json.dumps(row)}")

    print("\n== zoo 48x48 @15 epochs (VERDICT #5 second half) ==")
    zoo = _load(os.path.join(WORK, "zoo48_15ep.json"))
    if zoo is None:
        print("zoo48_15ep.json missing")
    else:
        for row in zoo if isinstance(zoo, list) else zoo.get("results", []):
            print(f"  {row.get('baseline')}: "
                  f"best_val_driver_F1={row.get('best_val_anom_f1')} "
                  f"wall={row.get('train_wall_s', row.get('wall_s'))}")

    print("\n== memory probes ==")
    for f in ("fit_swin512_1x8.json", "fit_mamba512_1x8.json",
              "fit_swin200_b2.json", "fit_cnn512_b1.json"):
        row = _last_json_line(os.path.join(WORK, f))
        print(f"  {f}: {json.dumps(row) if row else 'missing/crashed'}")


if __name__ == "__main__":
    main()
