#!/usr/bin/env python
# ------------------------------------------------------------------
"""Codebook-dynamics diagnosis for the 48x48 variant arms (VERDICT r4 #5).

The round-5 chain-A arms showed: LFQ extremes val F1 0.387, but VQ-EMA
~0.03 and FSQ all-NaN (zero predicted positives in 15 epochs) while all
three learn driver detection identically (~0.378).  The classifier reads
ONLY z_q (reference models/build.py:157), so a collapsed or
information-destroying codebook starves the extremes head specifically.

This script loads each arm's trained checkpoint and reports, per arm:
  * code-index histogram over a val batch (is one code eating everything?)
  * z_q token variance (is the classifier input spatially constant?)
  * extreme-probability stats + predicted-positive rate at the 0.5
    threshold (threshold-collapse vs poor ranking)
  * for VQ-EMA: the codebook collection state — EMA cluster sizes, dead
    codes vs threshold, kmeans-init flag (reference VQ.py:451-475 is the
    machinery being checked)

Runs on CPU (forward-only); safe while the chip trains.

Usage: python scripts/diagnose_codebooks.py [--runs acc_CNN_3D_48 ...]
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_root", default="/root/work/log")
    ap.add_argument("--runs", nargs="*",
                    default=["acc_CNN_3D_48", "acc_CNN_3D_48_VQ_EMA",
                             "acc_CNN_3D_48_FSQ"])
    ap.add_argument("--cube_npz", default="/root/work/cube48.npz")
    ap.add_argument("--alias", default="latest")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/root/work/codebook_diag.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from idee_tpu.kernels import runtime

    runtime.set_force_xla(True)

    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from idee_tpu.config import Config
    from idee_tpu.data.fake import load_cube_npz
    from idee_tpu.models.vq_model import build_model
    from idee_tpu.train.driver import _make_datasets

    cube = load_cube_npz(args.cube_npz)
    report = {}

    def harness_cfg(run):
        """Rebuild the accuracy-harness config for runs trained before the
        driver snapshotted config.json (mirrors
        train_benchmark_accuracy.py's knobs for the 48x48 arms)."""
        from idee_tpu.config import synthetic_config

        cb_kw = {}
        if run.endswith("_VQ_EMA"):
            cb_kw = dict(codebook="VQ", vq_ema_update=True,
                         vq_kmeans_init=True,
                         vq_threshold_ema_dead_code=2.0)
        elif run.endswith("_FSQ"):
            cb_kw = dict(codebook="FSQ")
        return synthetic_config(
            encoder="CNN_3D", name=run, dir_log=args.log_root,
            batch_size=8, n_epochs=15, x_max=48, y_max=48,
            times_train=(1, 34 * 52), times_val=(34 * 52 + 1, 40 * 52),
            is_clima_scale=False, is_aug=True, dtype="bfloat16",
            device_data=True, init_scheme="lecun",
            codebook_freeze_out=True, lambda_commitment=0.0,
            lambda_anomaly=0.0, seed=0, **cb_kw)

    for run in args.runs:
        run_dir = os.path.join(args.log_root, run)
        cfg_path = os.path.join(run_dir, "config.json")
        ckpt_path = os.path.join(run_dir, "model_checkpoints", args.alias)
        if not os.path.exists(ckpt_path):
            print(f"[{run}] missing checkpoint — skipped")
            continue
        if os.path.exists(cfg_path):
            with open(cfg_path) as fh:
                cfg = Config.from_dict(json.load(fh))
        else:
            cfg = harness_cfg(run)

        raw = ocp.StandardCheckpointer().restore(ckpt_path)
        params = raw["state"]["params"]
        extra = raw["state"].get("extra_vars") or {}

        # --- codebook collection state (VQ-EMA machinery) -------------
        row = {"codebook": cfg.codebook,
               "ema_update": bool(getattr(cfg, "vq_ema_update", False))}
        cb_state = extra.get("codebook") if isinstance(extra, dict) else None
        if cb_state:
            flat = jax.tree_util.tree_leaves_with_path(cb_state)
            for path, leaf in flat:
                key = "/".join(str(getattr(p, "key", p)) for p in path)
                arr = np.asarray(leaf)
                stat = {"shape": list(arr.shape)}
                if "cluster" in key or "size" in key:
                    thr = float(getattr(cfg, "vq_threshold_ema_dead_code",
                                        0.0))
                    stat.update(sum=float(arr.sum()),
                                min=float(arr.min()), max=float(arr.max()),
                                dead=int((arr < max(thr, 1e-9)).sum()))
                elif arr.ndim >= 1 and arr.size <= 64:
                    stat["values"] = np.round(
                        arr.astype(np.float64), 4).tolist()
                else:
                    stat.update(mean=float(arr.mean()),
                                std=float(arr.std()))
                row.setdefault("codebook_state", {})[key] = stat

        # --- forward a val batch (same slicing as the harness) --------
        t_train, n_time = cfg.times_train[1], cfg.times_val[1]
        _, ds = _make_datasets(cfg,
                               train_cube=cube.time_slice(1, t_train),
                               val_cube=cube.time_slice(t_train + 1, n_time))
        xs = np.stack([ds[i]["x"] for i in range(args.batch)])
        me = np.stack([ds[i]["mask_extreme"] for i in range(args.batch)])

        model = build_model(cfg)
        variables = {"params": params}
        if isinstance(extra, dict):
            variables.update(extra)
        out = model.apply(variables, jnp.asarray(xs))

        idx = np.asarray(out.anomaly)
        counts = np.bincount(idx.reshape(-1),
                             minlength=int(cfg.codebook_size))
        probs = 1.0 / (1.0 + np.exp(-np.asarray(out.z, np.float64)))
        zq = np.asarray(out.z_q, np.float64)
        # spatial variance of the classifier's input, averaged over chans
        zq_tok_std = float(zq.std(axis=(1, 3, 4, 5)).mean())

        row.update(
            index_hist=counts.tolist(),
            index_nonzero_frac=float((idx != 0).mean()),
            zq_token_std=zq_tok_std,
            extreme_prob_max=float(probs.max()),
            extreme_prob_mean=float(probs.mean()),
            pred_pos_rate_at_0p5=float((probs > 0.5).mean()),
            true_pos_rate=float(me.mean()),
        )
        report[run] = row
        print(f"[{run}] {json.dumps(row)}")

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
