#!/usr/bin/env python
# ------------------------------------------------------------------
"""Microbenchmark: fused window-attention kernel vs XLA composition, on
silicon, at the REAL stage geometries of the bench workload.

The full-bench A/B (BENCH_FORCE_XLA) costs ~3 min per side; this times the
attention op alone (fwd and fwd+bwd) with the device_get sync so kernel
iterations take seconds. Stage geometries from the default Swin config at
200x200 (config.py en_window_size, nn/swin3d.py):

  stage1: window (2,4,4) -> n=32, nW=4*50*50, G=V*heads=12, hd=8
  stage1s: same, shifted (mask bank from compute_shift_mask)
  stage2: window (8,1,1) -> n=8, nW=200*200 in the 98-pad... (1,200,200)
          spatial windows over D=8 -> nW=40000? windows = Dp/8*H*W

Usage: python scripts/bench_attention.py [--iters 20] [--hw 200]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from idee_tpu.kernels import runtime
    from idee_tpu.kernels.window_attention import window_attention
    from idee_tpu.nn.swin3d import compute_shift_mask

    B, hw = args.batch, args.hw
    V, heads, hd = 6, 2, 8
    G = V * heads
    D = 8

    def geometry(ws, shifted):
        ss = tuple(w // 2 for w in ws) if shifted else (0, 0, 0)
        ss = tuple(0 if ws[i] >= (D, hw, hw)[i] else ss[i]
                   for i in range(3))
        Dp = -(-D // ws[0]) * ws[0]
        Hp = -(-hw // ws[1]) * ws[1]
        Wp = -(-hw // ws[2]) * ws[2]
        nW = (Dp // ws[0]) * (Hp // ws[1]) * (Wp // ws[2])
        n = ws[0] * ws[1] * ws[2]
        mask = compute_shift_mask(Dp, Hp, Wp, ws, ss) if any(ss) else None
        return B * nW, n, mask

    cases = {
        "stage1 (2,4,4)": geometry((2, 4, 4), False),
        "stage1 shifted": geometry((2, 4, 4), True),
        "stage2 (8,1,1)": geometry((8, 1, 1), False),
    }

    rng = np.random.default_rng(0)
    results = {}
    for name, (BW, n, mask) in cases.items():
        q, k, v = (jnp.asarray(rng.normal(size=(BW, n, G, hd)),
                               jnp.bfloat16) for _ in range(3))
        bias = jnp.asarray(rng.normal(size=(G, n, n)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(BW, n, G, hd)), jnp.float32)
        scale = hd ** -0.5

        def fwd_loss(q, k, v, b):
            out = window_attention(q, k, v, b, mask, scale)
            return jnp.sum(out.astype(jnp.float32) * w)

        grad_fn = jax.grad(fwd_loss, argnums=(0, 1, 2, 3))

        def timed(fn, *a):
            c = fn(*a)  # compile+warm
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = fn(*a)
            jax.device_get(jax.tree.leaves(last)[0].ravel()[0])
            return (time.perf_counter() - t0) / args.iters * 1e3

        row = {}
        for mode, force in (("pallas", runtime.set_force_pallas),
                            ("xla", runtime.set_force_xla)):
            force(True)
            try:
                # distinct wrappers -> distinct traces per dispatch mode
                f1 = jax.jit(lambda *a: fwd_loss(*a))
                f2 = jax.jit(lambda *a: grad_fn(*a))
                row[f"{mode}_fwd_ms"] = round(timed(f1, q, k, v, bias), 3)
                row[f"{mode}_fwdbwd_ms"] = round(timed(f2, q, k, v, bias),
                                                 3)
            finally:
                force(False)
        row["BW"], row["n"] = BW, n
        results[name] = row
        print(f"{name:16s} {json.dumps(row)}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
