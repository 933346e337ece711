#!/usr/bin/env python
# ------------------------------------------------------------------
"""Batch-inference / artifact-export CLI for the synthetic benchmark.

Beyond-parity serving surface: the reference's test_synthetic.py:27-129
computes metrics and TensorBoard panels but never EXPORTS the model's
predictions; downstream use (visualization, post-hoc driver analysis,
product serving) needs the maps themselves. This CLI restores a trained
run directory (config snapshot + orbax checkpoint) and writes one npz:

  extreme_prob  [T, H, W] float32  sigmoid joint logits at each target
                                   week (NaN for the delta_t-1 warmup
                                   weeks that are never a target)
  extreme_mask  [T, H, W] uint8    extreme_prob > threshold (0.5, the
                                   reference synthetic decision rule,
                                   train_synthetic.py:211)
  anomaly       [V, T, H, W] f32   majority-vote driver timeline, the
                                   anomaly_collector semantics
                                   (utils/utils_train.py:529-554);
                                   NaN = timeline slot never covered
  timestep      [T] int32          absolute week index

It also prints the evaluator tables (same metrics path as evaluation).

Usage:
  python scripts/predict_synthetic.py --run_dir log/exp1 \
      [--checkpoint best_F1_model] [--times "(2081,2132)"] \
      [--root_synthetic <dir>] [--out predictions.npz] [--platform cpu]
"""
# ------------------------------------------------------------------

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def predict_synthetic(cfg, ckpt_path: str, out_path: str, cube=None):
    """Restore params from ckpt_path and export prediction maps for
    cfg.times_test. Returns the payload dict that was written.

    With an in-memory ``cube=`` the caller must pre-slice it to the
    prediction window (``cube.time_slice``) — times_test then only sets
    the absolute-timestep offset (SyntheticCube.time_slice docstring)."""
    import jax
    import numpy as np

    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu.models import build_model
    from idee_tpu.train.checkpoint import load_pretrained_params
    from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                        EvaluatorSynthetic,
                                        majority_vote_from_device)
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps import init_epoch_metrics, make_eval_step
    from idee_tpu.utils.logging import get_logger, log_string

    logger = get_logger(cfg)
    ds = SyntheticDataset(
        cube=cube, root_datacube=None if cube is not None
        else cfg.root_synthetic,
        times=cfg.times_test, is_aug=False, is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale, variables=list(cfg.variables),
        variables_static=list(cfg.variables_static), delta_t=cfg.delta_t,
        window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max)
    log_string(logger, "# prediction samples: %d" % len(ds))

    model = build_model(cfg)
    sample_x = ds[0]["x"][None].repeat(cfg.batch_size, 0)
    state = create_train_state(cfg, model, sample_x)
    params = load_pretrained_params(ckpt_path, state.params)
    variables = {"params": params, **(state.extra_vars or {})}

    t0 = float(ds.timestep[0])
    step = make_eval_step(model, cfg, t0=t0, return_preds=True)
    loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=False,
                        seed=cfg.seed)

    V, T, H, W = ds.anomaly.shape
    prob = np.full((T, H, W), np.nan, np.float32)
    metrics = init_epoch_metrics(ds.anomaly.shape)
    for batch in loader:
        metrics, preds = step(variables, metrics, batch)
        p = np.asarray(preds["pred"][:, 0], np.float32)   # [B, H, W]
        t_idx = (np.asarray(batch["timestep"])[:, 0] - t0).astype(int)
        prob[t_idx] = p

    m = jax.device_get(metrics)
    anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])

    # evaluator tables (the standard metrics; get_results self-logs)
    ev = EvaluatorSynthetic(logger, "Prediction")
    covered = ~np.isnan(prob[:, 0, 0])
    ev((prob[covered] > 0.5).astype(np.float32)[:, None],
       ds.extreme[covered][:, None])
    ev.get_results()
    ev_a = EvaluatorAnomalySynthetic(logger, "Prediction", cfg.variables)
    ev_a(np.swapaxes(anomaly, 0, 1), np.swapaxes(ds.anomaly, 0, 1))
    ev_a.get_results()

    payload = {
        "extreme_prob": prob,
        "extreme_mask": (np.nan_to_num(prob) > 0.5).astype(np.uint8),
        "anomaly": anomaly.astype(np.float32),
        "timestep": np.asarray(ds.timestep, np.int32),
        "variables": np.asarray(cfg.variables),
    }
    np.savez_compressed(out_path, **payload)
    log_string(logger, "wrote %s" % out_path)
    return payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="training log dir (config snapshot + checkpoints)")
    ap.add_argument("--checkpoint", default="best_F1_model")
    ap.add_argument("--times", default=None,
                    help='override times_test, e.g. "(2081,2132)"')
    ap.add_argument("--root_synthetic", default=None)
    ap.add_argument("--cube_npz", default=None,
                    help="generated-cube cache (train_benchmark_accuracy's "
                    "--cube_npz) for runs trained on in-memory cubes; "
                    "sliced to times_test here")
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
    if args.times:
        over["times_test"] = tuple(ast.literal_eval(args.times))
    if args.root_synthetic:
        over["root_synthetic"] = args.root_synthetic
    if args.batch_size:
        over["batch_size"] = args.batch_size
    cfg = cfg.replace(**over)

    cube = None
    if args.cube_npz:
        from idee_tpu.data.fake import load_cube_npz

        cube = load_cube_npz(args.cube_npz).time_slice(*cfg.times_test)

    ckpt = os.path.join(args.run_dir, "model_checkpoints", args.checkpoint)
    out = args.out or os.path.join(args.run_dir, "predictions.npz")
    predict_synthetic(cfg, ckpt, out, cube=cube)


if __name__ == "__main__":
    main()
