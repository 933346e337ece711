#!/usr/bin/env python
# ------------------------------------------------------------------
"""Analytic FLOP counts for the train step, per encoder, via XLA.

Lowers the full train step (fwd+bwd+update+metrics) at the bench geometry
and reads jax's cost_analysis WITHOUT executing -- runs on CPU, no TPU
needed. Answers VERDICT r2 weak #3/#4: how many FLOPs a step really is
(so measured step times convert to honest MFU) and whether Swin_3D's
longer step is explained by its FLOP count or by lost efficiency.

Usage: python scripts/flops_report.py [--hw 200] [--batch 1]
       [--encoders CNN_3D,Swin_3D,Mamba]
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--encoders", default="CNN_3D,Swin_3D,Mamba")
    ap.add_argument("--out", default="/tmp/flops_report.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # lowering only; no TPU

    import jax.numpy as jnp

    from idee_tpu.config import synthetic_config
    from idee_tpu.kernels.runtime import set_force_xla
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps import init_epoch_metrics, make_train_step

    # count the XLA-composition FLOPs (the Pallas kernels' cost isn't
    # visible to cost_analysis anyway; the XLA fallback is the same math)
    set_force_xla(True)

    rows = {}
    for enc in args.encoders.split(","):
        enc = enc.strip()
        cfg = synthetic_config(encoder=enc, dtype="bfloat16",
                               batch_size=args.batch,
                               x_max=args.hw, y_max=args.hw, is_aug=False)
        model = build_model(cfg)
        x = jnp.zeros((args.batch, 6, 1, cfg.delta_t, args.hw, args.hw),
                      jnp.bfloat16)
        state = create_train_state(cfg, model, x)
        metrics = init_epoch_metrics((6, 64, args.hw, args.hw))
        batch = {
            "x": x,
            "mask_extreme": jnp.zeros((args.batch, args.hw, args.hw),
                                      jnp.float32),
            "mask_extreme_loss": jnp.zeros((args.batch, args.hw, args.hw),
                                           jnp.float32),
            "timestep": jnp.full((args.batch, 1), 8.0, jnp.float32),
        }
        step = make_train_step(model, cfg, t0=0.0, donate=False)
        cost = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
            state, metrics, batch).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
        rows[enc] = {"step_gflops": round(flops / 1e9, 1),
                     "bytes_accessed_gb": round(bytes_ / 2**30, 2)}
        print(f"{enc:8s} step: {flops/1e12:7.3f} TFLOP  "
              f"{bytes_/2**30:7.2f} GiB accessed", flush=True)

    with open(args.out, "w") as f:
        json.dump({"hw": args.hw, "batch": args.batch, "rows": rows}, f,
                  indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
