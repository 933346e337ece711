#!/usr/bin/env python
# ------------------------------------------------------------------
"""Where does the train-step time go? Segment timings + MFU on real TPU.

VERDICT r2 #5: the full train step was ~135 ms (CNN_3D) / ~359 ms (Swin_3D)
at the bench geometry with no breakdown. This harness times each pipeline
segment separately -- encoder forward, quantizer, classifier, loss algebra,
metrics/vote scatter, optimizer update, and the full fwd-only vs fwd+bwd
step -- using the only reliable barrier on this tunnel (a host fetch of a
dependent scalar; jax.block_until_ready returns early, BASELINE.md TIMING
NOTE). Each timed loop threads a scalar dependency through the iterations
so the final fetch forces the whole chain.

MFU: achieved FLOP/s = XLA cost_analysis flops / measured time, reported
against the v5e bf16 peak (197 TFLOPS) and the measured matmul ceiling on
this chip (125 TFLOPS, BASELINE.md calibration).

Reference context: the torch train loop is train_synthetic.py:170-215; it
was never profiled upstream either.

Usage: python scripts/profile_step.py [--encoder CNN_3D] [--hw 200]
       [--batch 1] [--iters 30] [--out /tmp/profile.json]
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_TFLOPS = 197.0     # bf16 systolic peak, one v5e chip
MEASURED_CEILING_TFLOPS = 125.0  # chained 4096^3 bf16 matmuls on this chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="CNN_3D")
    ap.add_argument("--hw", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from idee_tpu.config import synthetic_config
    from idee_tpu.data.fake import make_fake_cube
    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu.models.vq_model import build_model
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps import init_epoch_metrics, make_train_step
    from idee_tpu import losses

    if jax.default_backend() == "cpu":
        from idee_tpu.kernels.runtime import set_force_xla
        set_force_xla(True)

    hw, batch = args.hw, args.batch
    cfg = synthetic_config(encoder=args.encoder, dtype="bfloat16",
                           batch_size=batch, x_max=hw, y_max=hw,
                           is_aug=False)
    cube = make_fake_cube(n_vars=6, n_time=64, height=hw, width=hw, seed=0)
    ds = SyntheticDataset(cube=cube, times=(1, 64),
                          variables=cube.variables, variables_static=[],
                          delta_t=cfg.delta_t, is_aug=False, is_norm=True,
                          is_clima_scale=False,
                          x_min=0, x_max=hw, y_min=0, y_max=hw)
    dl = DataLoader(ds, batch_size=batch, shuffle=False,
                    keys=("x", "mask_extreme", "mask_extreme_loss",
                          "timestep"),
                    cast={"x": cfg.dtype})
    batch_np = next(iter(dl))
    batch_dev = jax.device_put(
        {k: jnp.asarray(v) for k, v in batch_np.items()})

    model = build_model(cfg)
    state = create_train_state(cfg, model, batch_dev["x"])
    metrics = init_epoch_metrics(ds.anomaly.shape)
    variables = {"params": state.params, **(state.extra_vars or {})}

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"# {args.encoder} {hw}x{hw} batch {batch}  params={n_params:,}",
          flush=True)

    # ---------- timed segments ----------
    # every segment is jitted as carry-in/carry-out of one f32 scalar so
    # the loop iterations chain and one device_get forces them all
    def timed(name, make_fn, *fn_args):
        # compile ONCE (lower+compile) and reuse the executable for both
        # the timing loop and the flops readout -- calling jit(fn) AND
        # fn.lower().compile() doubles the (minutes-long, remote) compile
        c = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        compiled = jax.jit(make_fn).lower(c, *fn_args).compile()
        print(f"# compiled {name} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        c = compiled(c, *fn_args)    # warmup
        float(jax.device_get(c))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = compiled(c, *fn_args)
        float(jax.device_get(c))     # the real barrier
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):  # older jax returns [dict]
                cost = cost[0] if cost else {}
            flops = float(cost.get("flops", 0.0)) if cost else 0.0
        except Exception:
            flops = 0.0
        rows.append({"segment": name, "ms": round(ms, 3),
                     "gflops": round(flops / 1e9, 2),
                     "tflops_per_s": round(flops / (ms * 1e-3) / 1e12, 2)
                     if ms > 0 else None})
        print(f"{name:34s} {ms:9.3f} ms  {flops/1e9:9.2f} GFLOP "
              f"{flops/(ms*1e-3)/1e12:7.2f} TFLOP/s", flush=True)
        return ms

    rows = []
    x = batch_dev["x"]
    mel = batch_dev["mask_extreme_loss"]

    # (1) full train step, fwd+bwd+update+metrics (no donation: the same
    # buffers are reused every iteration)
    step = make_train_step(model, cfg, t0=0.0, donate=False)

    # IMPORTANT: every timed fn must return a scalar that REALLY depends on
    # the work being timed -- a dependency like `x * 0` or a bare step
    # counter lets XLA dead-code-eliminate the whole computation (first
    # version of this harness measured "train_step == forward" that way)
    def _all_leaves(tree):
        # consume ONE element of EVERY leaf: depending on a single param
        # leaf lets XLA dead-code-eliminate the updates (and the backward
        # slices) of all the others -- the first version of this row
        # measured "train_step == forward" exactly that way (its
        # cost_analysis flops equalled the fwd-only row's)
        return sum(jnp.asarray(l).ravel()[0].astype(jnp.float32)
                   for l in jax.tree.leaves(tree)
                   if hasattr(l, "size") and l.size)

    def full_step(c, state, metrics, b):
        s2, m2 = step(state, metrics, b)
        return (c + m2["loss_sums"]["loss"] + _all_leaves(s2.params)
                + m2["vote_sum"][0, 0, 0, 0].astype(jnp.float32))

    t_step = timed("train_step (fwd+bwd+upd+metrics)", full_step,
                   state, metrics, batch_dev)

    # (2) loss fwd only (model fwd + total loss)
    def fwd_loss(c, params, b):
        out = model.apply({"params": params, **(state.extra_vars or {})},
                          b["x"], train=False,
                          mask_extreme_loss=b["mask_extreme_loss"])
        loss, _ = losses.total_loss_synthetic(
            out, b["mask_extreme"], b["mask_extreme_loss"],
            cfg.lambda_anomaly)
        return c + loss

    t_fwd = timed("model fwd + loss", fwd_loss, state.params, batch_dev)

    # (3) encoder forward only
    supports_packed = getattr(
        type(model.bind(variables).encoder), "supports_packed_out", False)

    def enc_only(c, params, xx):
        def run(m, xx):
            if supports_packed:
                return m.encoder(xx, train=False, packed_out=True)
            return m.encoder(xx, train=False)
        z = model.apply({"params": params, **(state.extra_vars or {})},
                        xx, method=run)
        return c + jnp.sum(z.astype(jnp.float32) * 0) + z.astype(
            jnp.float32).ravel()[0]

    t_enc = timed("encoder fwd", enc_only, state.params, x)

    # (4) quantizer + classifier + losses = fwd minus encoder (derived)
    rows.append({"segment": "quant+cls+loss (fwd - encoder, derived)",
                 "ms": round(t_fwd - t_enc, 3)})
    print(f"{'quant+cls+loss (derived)':34s} {t_fwd - t_enc:9.3f} ms",
          flush=True)

    # (5) backward+update = step minus fwd minus metrics (derived below)
    # (6) metrics/vote scatter only
    from idee_tpu.train.steps import _accumulate

    out0 = jax.jit(lambda p, b: model.apply(
        {"params": p, **(state.extra_vars or {})}, b["x"], train=False,
        mask_extreme_loss=b["mask_extreme_loss"]))(state.params, batch_dev)
    comps0 = {k: jnp.zeros((), jnp.float32) for k in
              ("loss", "loss_bce", "loss_anomaly", "loss_var", "loss_z_q")}

    def metrics_only(c, m, b, out):
        m2, _, _ = _accumulate(m, comps0, out, b, 0.0, cfg.delta_t)
        return (c + m2["loss_sums"]["loss"]
                + m2["vote_sum"][0, 0, 0, 0].astype(jnp.float32)
                + m2["vote_cnt"][0].astype(jnp.float32)
                + m2["counts"]["correct"].astype(jnp.float32)
                + m2["n_steps"].astype(jnp.float32))

    t_met = timed("metrics+vote scatter", metrics_only, metrics, batch_dev,
                  out0)

    # (7) optimizer update only (adamw on precomputed zero grads)
    grads0 = jax.tree.map(jnp.zeros_like, state.params)

    def opt_only(c, s):
        s2 = s.apply_gradients(grads=grads0)
        return (c + _all_leaves(s2.params) + _all_leaves(s2.opt_state)
                + s2.step.astype(jnp.float32))

    t_opt = timed("optimizer update (adamw)", opt_only, state)

    t_bwd = t_step - t_fwd - t_met - t_opt
    rows.append({"segment": "backward (step - fwd - metrics - opt, derived)",
                 "ms": round(t_bwd, 3)})
    print(f"{'backward (derived)':34s} {t_bwd:9.3f} ms", flush=True)

    # ---------- MFU ----------
    step_row = rows[0]
    mfu_peak = (step_row["tflops_per_s"] or 0) / V5E_PEAK_TFLOPS * 100
    mfu_ceil = (step_row["tflops_per_s"] or 0) / MEASURED_CEILING_TFLOPS * 100
    summary = {
        "encoder": args.encoder, "hw": hw, "batch": batch,
        "iters": args.iters, "params": n_params,
        "segments": rows,
        "step_ms": step_row["ms"],
        "step_tflops_per_s": step_row["tflops_per_s"],
        "mfu_vs_peak_pct": round(mfu_peak, 2),
        "mfu_vs_measured_ceiling_pct": round(mfu_ceil, 2),
    }
    print(json.dumps({k: summary[k] for k in
                      ("encoder", "step_ms", "step_tflops_per_s",
                       "mfu_vs_peak_pct", "mfu_vs_measured_ceiling_pct")}),
          flush=True)
    out = args.out or f"/tmp/profile_{args.encoder}.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
