#!/usr/bin/env python
# ------------------------------------------------------------------
"""Batch-inference / artifact-export CLI for the real-world pipelines.

Companion of predict_synthetic.py for CERRA / ERA5-Land: the reference's
test_CERRA.py:95-127 prints the drought evaluator and discards the maps.
This CLI restores a trained run and writes, per test sample (= target
week), the model outputs downstream users actually consume:

  drought_prob  [N, H, W] float32  sigmoid joint logits
  drought_mask  [N, H, W] uint8    prob > 0.35 (the real-world decision
                                   rule, train_CERRA.py:212) AND valid
  anomaly       [N, V, T, H, W] u8 the model's driver bits over the
                                   delta_t input window (chronological)
  valid_mask    [N, H, W] uint8    1 - sea - cold - no_vegetation
                                   (test_CERRA.py:112-113)
  name_code     [N] int64          <year><www> code of the target week file

It also prints the standard 2-class evaluator over valid pixels.

Usage:
  python scripts/predict_real.py --run_dir log/cerra_run --family CERRA \
      [--years "['2020','2021']"] [--checkpoint best_F1_model] \
      [--out predictions_real.npz] [--platform cpu]
"""
# ------------------------------------------------------------------

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def predict_real(cfg, family: str, ckpt_path: str, out_path: str,
                 test_ds=None):
    """Restore params from ckpt_path and export prediction maps for
    cfg.years_test. Returns the payload dict that was written."""
    import jax
    import numpy as np

    from idee_tpu.data.loader import DataLoader
    from idee_tpu.models import build_model
    from idee_tpu.train.checkpoint import load_pretrained_params
    from idee_tpu.train.driver_real import make_reanalysis_dataset
    from idee_tpu.train.metrics import Evaluator
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps_real import (init_epoch_metrics_real,
                                           make_eval_step_real)
    from idee_tpu.utils.logging import get_logger, log_string

    logger = get_logger(cfg)
    if test_ds is None:
        test_ds = make_reanalysis_dataset(cfg, family, cfg.years_test, False)
    log_string(logger, "# prediction samples: %d" % len(test_ds))

    model = build_model(cfg)
    sample_x = test_ds[0]["x"][None].repeat(cfg.batch_size, 0)
    state = create_train_state(cfg, model, sample_x)
    params = load_pretrained_params(ckpt_path, state.params)
    variables = {"params": params, **(state.extra_vars or {})}

    step = make_eval_step_real(model, cfg, test_mode=True, return_preds=True)
    loader = DataLoader(test_ds, cfg.batch_size, shuffle=False,
                        drop_last=False, seed=cfg.seed)

    probs, masks, anomalies, valids, names = [], [], [], [], []
    metrics = init_epoch_metrics_real()
    for batch in loader:
        metrics, preds = step(variables, metrics, batch)
        valid = np.clip(1.0 - np.asarray(batch["mask_sea"])
                        - np.asarray(batch["mask_cold_surface"])
                        - np.asarray(batch["mask_no_vegetation"]), 0, None)
        p = np.asarray(preds["pred"], np.float32)
        if p.ndim == 4:        # [B, 1, H, W] -> [B, H, W]
            p = p[:, 0]
        probs.append(p)
        masks.append(((p > 0.35) & (valid > 0)).astype(np.uint8))
        # driver bits, time-reflipped to chronological order (the input
        # window is time-reversed, Synthetic_dataset.py:331 convention)
        anomalies.append(np.flip(np.asarray(preds["anomaly"], np.uint8),
                                 axis=2))
        valids.append(valid.astype(np.uint8))
        names.append(np.asarray(batch["name_code"], np.int64))

    m = jax.device_get(metrics)
    ev = Evaluator(logger, "Prediction", cfg)
    ev.update_counts(m["counts"])
    ev.get_results(0, 0)

    payload = {
        "drought_prob": np.concatenate(probs),
        "drought_mask": np.concatenate(masks),
        "anomaly": np.concatenate(anomalies),
        "valid_mask": np.concatenate(valids),
        "name_code": np.concatenate(names),
        "variables": np.asarray(cfg.variables),
    }
    np.savez_compressed(out_path, **payload)
    log_string(logger, "wrote %s" % out_path)
    return payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--family", default="CERRA",
                    choices=["CERRA", "ERA5_Land"])
    ap.add_argument("--checkpoint", default="best_F1_model")
    ap.add_argument("--years", default=None,
                    help="override years_test, e.g. \"['2020','2021']\"")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from idee_tpu.config import load_config

    snap = os.path.join(args.run_dir, "config.json")
    if not os.path.exists(snap):
        snap = os.path.join(args.run_dir, "config.pkl")
    cfg = load_config(snap)
    over = {"is_aug": False}
    if args.years:
        over["years_test"] = list(ast.literal_eval(args.years))
    if args.batch_size:
        over["batch_size"] = args.batch_size
    cfg = cfg.replace(**over)

    ckpt = os.path.join(args.run_dir, "model_checkpoints", args.checkpoint)
    out = args.out or os.path.join(args.run_dir, "predictions_real.npz")
    predict_real(cfg, args.family, ckpt, out)


if __name__ == "__main__":
    main()
