#!/usr/bin/env python
# ------------------------------------------------------------------
"""Device-compute step time for the real-family train step (VERDICT r4
weak #4: is CERRA 512x832's 0.401 steps/s upload-bound or compute-bound?).

Stages ONE batch on the device, then times N train steps against it with
a device_get sync (the only reliable barrier over the axon tunnel —
CLAUDE.md). The difference between this number and the end-to-end driver
rate is the host pipeline's share (per-step numpy assembly + 82 MB
upload, scripts/round4_cerra.sh:19-22).

Usage: python scripts/bench_real_step.py --encoder CNN_3D --hw 512x832
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="CNN_3D")
    ap.add_argument("--hw", default="512x832")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from idee_tpu.config import Config
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps_real import (init_epoch_metrics_real,
                                           make_train_step_real)

    H, W = (int(v) for v in args.hw.split("x"))
    cfg = Config(encoder=args.encoder, dtype="bfloat16",
                 batch_size=args.batch, in_channels=2,
                 in_channels_dynamic=6, delta_t=8,
                 en_use_checkpoint=args.remat,
                 lambda_commitment=0.0, lambda_anomaly=0.0,
                 init_scheme="lecun", codebook_freeze_out=True)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(args.batch, 6, 2, cfg.delta_t,
                                          H, W)).astype(np.float32),
                         jnp.bfloat16),
        "mask_extreme": jnp.asarray(
            (rng.random((args.batch, H, W)) < 0.03).astype(np.float32)),
        "mask_extreme_loss": jnp.asarray(
            (rng.random((args.batch, H, W)) < 0.05).astype(np.float32)),
        "mask_cold_surface": jnp.asarray(
            (rng.random((args.batch, H, W)) < 0.1).astype(np.float32)),
        "mask_cold_surface_loss": jnp.asarray(
            (rng.random((args.batch, H, W)) < 0.1).astype(np.float32)),
    }
    model = build_model(cfg)
    state = create_train_state(cfg, model, np.zeros_like(batch["x"]),
                               steps_per_epoch=100)
    metrics = init_epoch_metrics_real()
    step = make_train_step_real(model, cfg, donate=False)

    t0 = time.perf_counter()
    state, metrics = step(state, metrics, batch)
    _ = jax.device_get(metrics["n_steps"])  # barrier incl. compile
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, metrics, batch)
    n = jax.device_get(metrics["n_steps"])  # dependent-scalar barrier
    wall = time.perf_counter() - t0
    out = {
        "encoder": args.encoder, "hw": args.hw, "batch": args.batch,
        "iters": args.iters, "compile_s": round(compile_s, 1),
        "device_step_ms": round(1000.0 * wall / args.iters, 1),
        "device_steps_per_sec": round(args.iters / wall, 3),
        "n_steps_check": int(n),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
