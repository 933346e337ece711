#!/usr/bin/env python
# ------------------------------------------------------------------
"""Benchmark: synthetic-CERRA 200x200 train steps/sec/chip.

The BASELINE.json north-star workload: 6 variables x 1 channel x delta_t=8
weeks on a 200x200 grid, full train step (fwd+bwd+update+metric counters),
batch_size 1 (the reference default, config.py:25).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the divisor below is this repo's recorded round-1 measurement so later
rounds report relative progress. Until a real A100 reference measurement
exists, vs_baseline is progress-vs-round-1, not vs-torch.
"""
# ------------------------------------------------------------------

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# First recorded measurement on one TPU v5e chip (round 1, v0 host-synced
# loop): 9.856 steps/sec. vs_baseline reports progress against this.
# Round-1 final: 49.3 steps/sec (device-resident metrics + filtered bf16
# upload; host->device transfer over the tunnel was the dominant cost).
ROUND1_BASELINE = 9.856


def main():
    import jax
    import numpy as np

    from idee_tpu.config import synthetic_config
    from idee_tpu.data.fake import make_fake_cube
    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps import init_epoch_metrics, make_train_step

    encoder = os.environ.get("BENCH_ENCODER", "CNN_3D")
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    hw = int(os.environ.get("BENCH_HW", "200"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))

    cfg = synthetic_config(
        encoder=encoder, dtype=dtype, batch_size=batch,
        x_max=hw, y_max=hw, is_aug=False,
        times_train=(1, 64),
        en_use_checkpoint=os.environ.get("BENCH_REMAT", "0") == "1",
    )

    cube = make_fake_cube(n_vars=6, n_time=64, height=hw, width=hw, seed=0)
    ds = SyntheticDataset(cube=cube, times=(1, 64),
                          variables=cube.variables, variables_static=[],
                          delta_t=cfg.delta_t, is_aug=False, is_norm=True,
                          is_clima_scale=False,
                          x_min=0, x_max=hw, y_min=0, y_max=hw)
    import jax.numpy as jnp

    # upload only what the train step consumes, in the compute dtype --
    # host->device bandwidth over the TPU tunnel is a first-order cost
    cast = {"x": jnp.bfloat16} if dtype == "bfloat16" else None
    loader = DataLoader(ds, batch, shuffle=True, drop_last=True, seed=0,
                        prefetch=3,
                        keys=["x", "mask_extreme", "mask_extreme_loss",
                              "timestep"],
                        cast=cast)

    model = build_model(cfg)
    first = next(iter(loader))
    state = create_train_state(cfg, model, first["x"],
                               steps_per_epoch=len(loader))
    step = make_train_step(model, cfg, t0=float(ds.timestep[0]))
    metrics = init_epoch_metrics(ds.anomaly.shape)

    # compile
    state, metrics = step(state, metrics, first)
    jax.block_until_ready(metrics["n_steps"])

    it = iter(loader)

    def next_batch():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(loader)
            return next(it)

    done = 0
    t0 = None
    while done < n_steps:
        b = next_batch()
        state, metrics = step(state, metrics, b)
        done += 1
        if done == warmup:
            jax.block_until_ready(metrics["n_steps"])
            t0 = time.perf_counter()
    jax.block_until_ready(metrics["n_steps"])
    dt = time.perf_counter() - t0
    sps = (n_steps - warmup) / dt
    it.close()  # stop the prefetch thread before interpreter teardown

    vs = sps / ROUND1_BASELINE if ROUND1_BASELINE else 1.0
    print(json.dumps({
        "metric": f"synthetic 200x200 train steps/sec/chip ({encoder}, "
                  f"batch {batch}, {dtype})",
        "value": round(sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
