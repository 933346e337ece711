#!/usr/bin/env python
# ------------------------------------------------------------------
"""Torch-side control for the training-collapse claim (VERDICT r2 #4).

BASELINE.md concludes from JAX-side experiments that (a) the reference's
published recipe does not train from scratch, and (b) the root cause is
the reference's weight init Normal(mean=0.02, std=0.02)
(reference models/build.py:110 -- mean == std, ~84% of weights share a
sign), with the anomaly-L1/commitment losses as secondary collapse
attractors. Those experiments ran only in the JAX rebuild; this script
runs the REFERENCE'S OWN torch implementation on the same generated
benchmark cube so the claim is evidenced in the original code.

Four arms (init x losses), each a few hundred Adam steps at 48x48:

  A  reference init + reference losses   (the published recipe)
  B  zero-mean init + reference losses   (isolates the loss attractors)
  C  reference init + stable losses      (isolates the init)
  D  zero-mean init + stable losses      (minimal init fix)
  E  lecun init + stable losses          (the JAX stable recipe's exact
                                          torch analogue; run this longer)

"stable losses" = lambda_anomaly=0, lambda_commitment=0 (entropy aux kept
at reference values) -- the round-2 stable recipe. "zero-mean init" =
trunc_normal(0, 0.02) on conv/linear weights, the minimal fix of the
suspected typo (normal_(0.02, 0.02) -> mean 0).

Batches come from idee_tpu's SyntheticDataset (item-equal to the
reference dataset, tests/test_data.py) over make_benchmark_cube data --
identical arrays to the JAX runs. The model, losses, optimizer, and the
train-step composition are the reference's own
(train_synthetic.py:170-215).

Reported per arm: extremes F1 (streaming, reference evaluator_synthetic
semantics at threshold 0.5), positive-prediction rate, anomaly-bit rate,
and |project_out W| -- the collapse signatures.

Usage: python scripts/reference_collapse_control.py [--steps 300]
       [--hw 48] [--arms ABCD] [--out /tmp/collapse_control.json]
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = "/root/reference"


def run_arm(arm: str, steps: int, hw: int, log_every: int = 50):
    import numpy as np
    import torch

    from scripts.bench_reference_torch import _install_timm_stub

    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import config as ref_config
    from models.build import VQ_model
    from models.losses import Anomaly_L1_loss_synthetic, BCE_loss_synthetic

    from idee_tpu.data.fake import make_benchmark_cube
    from idee_tpu.data.synthetic import SyntheticDataset

    zero_mean = arm in ("B", "D")
    lecun = arm == "E"  # fan-in-scaled init, the JAX stable recipe's exact
    #                     torch analogue (BASELINE.md "Training dynamics")
    stable_losses = arm in ("C", "D", "E")

    argv, sys.argv = sys.argv, [sys.argv[0]]
    try:
        cfg = ref_config.read_arguments(train=True, print=False, save=False)
    finally:
        sys.argv = argv
    cfg.encoder = "CNN_3D"
    cfg.batch_size = 1
    cfg.in_channels = 1  # synthetic: 1 channel/var (reference config.py:94)
    if stable_losses:
        cfg.lambda_anomaly = 0.0
        cfg.lambda_commitment = 0.0

    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    model = VQ_model(cfg)  # applies the reference init sweep
    if zero_mean or lecun:
        for m in model.modules():
            cls = m.__class__.__name__
            if hasattr(m, "weight") and ("Conv" in cls or "Linear" in cls):
                if lecun:
                    # fan-in-scaled trunc normal (jax lecun_normal analogue)
                    fan_in = m.weight.data[0].numel()
                    torch.nn.init.trunc_normal_(
                        m.weight.data, 0.0, (1.0 / max(fan_in, 1)) ** 0.5)
                else:
                    # minimal typo fix: same sweep, mean 0.02 -> 0
                    # (build.py:110)
                    torch.nn.init.trunc_normal_(m.weight.data, 0.0, 0.02)
                if getattr(m, "bias", None) is not None:
                    torch.nn.init.constant_(m.bias.data, 0.0)
    model.train()

    criterion = BCE_loss_synthetic()
    criterion_anomaly = Anomaly_L1_loss_synthetic(
        n_dynamic=cfg.in_channels_dynamic, delta_t=cfg.delta_t,
        dim=cfg.en_embed_dim[-1])
    optimizer = torch.optim.Adam(model.parameters(), lr=cfg.lr,
                                 weight_decay=cfg.weight_decay,
                                 betas=(cfg.beta1, cfg.beta2))

    n_time = 520  # 10 years of weeks
    cube = make_benchmark_cube(n_vars=6, n_time=n_time, height=hw, width=hw,
                               seed=0)
    ds = SyntheticDataset(cube=cube, times=(1, n_time),
                          variables=cube.variables,
                          variables_static=[], delta_t=cfg.delta_t,
                          is_aug=True, is_norm=True, is_clima_scale=False,
                          x_min=0, x_max=hw, y_min=0, y_max=hw, seed=0)

    # Sample only target weeks that contain extreme pixels. The reference's
    # inverse-frequency weighting (models/losses.py:115-118) calls
    # torch.histc(target, bins=2) -- on an ALL-ZERO target histc's
    # degenerate [0, 0] range puts every pixel in the LAST bin, the class-0
    # count reads as 0, and the class-0 weight becomes log(inf): the
    # published implementation yields an INFINITE loss on any week without
    # extremes (verified 2026-08-17; the rebuild computes true class counts
    # and guards zero fractions, idee_tpu/losses.py:27-34). Real reanalysis
    # weeks essentially always contain extremes, so the control conditions
    # on that regime instead of measuring this degeneracy.
    rng = np.random.default_rng(0)
    dt = cfg.delta_t
    has_extreme = np.array([
        (np.clip(ds.extreme[i + dt - 1], 0, 1).sum() > 0)
        for i in range(len(ds))])
    valid = np.flatnonzero(has_extreme)
    order = valid[rng.permutation(len(valid))]

    def get_batch(i):
        item = ds[int(order[i % len(order)])]
        x = torch.from_numpy(np.ascontiguousarray(item["x"]))[None].float()
        me = torch.from_numpy(np.ascontiguousarray(
            item["mask_extreme"]))[None].float().unsqueeze(1)
        mel = torch.from_numpy(np.ascontiguousarray(
            item["mask_extreme_loss"]))[None].float()
        return x, me, mel

    # streaming F1 counters over the trailing half of training
    # (evaluator_synthetic semantics: threshold 0.5, extreme class)
    tp = fp = fn = 0
    pos_rate = []
    anom_rate = []
    history = []
    t_start = time.perf_counter()

    for step_i in range(steps):
        x, mask_extreme, mask_extreme_loss = get_batch(step_i)
        optimizer.zero_grad(set_to_none=True)
        pred, pred_y, anomaly, z_q, loss_z_q = model(x)
        loss = criterion(pred, mask_extreme)
        loss_anomaly = criterion_anomaly(
            z_q, mask_extreme_loss,
            model.vq.indices_to_codes(
                torch.Tensor([0]).long()).clone().detach())
        loss_var = 0
        for k in range(cfg.in_channels_dynamic):
            loss_var += criterion(pred_y[k], mask_extreme)
        total = (loss + loss_anomaly * cfg.lambda_anomaly + loss_var
                 + loss_z_q)
        total.backward()
        optimizer.step()

        with torch.no_grad():
            p = (torch.sigmoid(pred) > 0.5).float()
            t = mask_extreme
            if step_i >= steps // 2:
                tp += float((p * t).sum())
                fp += float((p * (1 - t)).sum())
                fn += float(((1 - p) * t).sum())
            pos_rate.append(float(p.mean()))
            anom_rate.append(float(anomaly.float().mean()))
            if (step_i + 1) % log_every == 0:
                w_out = model.vq.project_out.weight.detach()
                history.append({
                    "step": step_i + 1,
                    "loss": round(float(total), 3),
                    "pos_rate": round(float(np.mean(pos_rate[-log_every:])), 4),
                    "anom_rate": round(float(np.mean(anom_rate[-log_every:])), 4),
                    "w_out_absmean": float(w_out.abs().mean()),
                })
                print(f"[{arm}] {history[-1]}", flush=True)

    f1 = 2 * tp / max(2 * tp + fp + fn, 1e-9)
    return {
        "arm": arm,
        "init": ("lecun" if lecun
                 else "zero_mean" if zero_mean else "reference"),
        "losses": "stable" if stable_losses else "reference",
        "steps": steps,
        "extremes_f1_trailing_half": round(f1, 4),
        "final_pos_rate": round(float(np.mean(pos_rate[-50:])), 4),
        "final_anom_rate": round(float(np.mean(anom_rate[-50:])), 4),
        "history": history,
        "secs": round(time.perf_counter() - t_start, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--arms", default="ABCD")
    ap.add_argument("--out", default="/tmp/collapse_control.json")
    args = ap.parse_args()

    results = []
    for arm in args.arms:
        res = run_arm(arm, args.steps, args.hw)
        results.append(res)
        print(json.dumps({k: v for k, v in res.items() if k != "history"}),
              flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
