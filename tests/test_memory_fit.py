# ------------------------------------------------------------------
"""Regression pin on the CERRA real-world program's HBM demand.

VERDICT r3 next-#1 asked for "a regression test pinning the 512x832
program's HBM demand": the reference's headline real-world configuration
(CERRA Europe 512x832 crop, delta_t=8, 6 vars x (mean,std), batch 1 --
reference dataset/CERRA_dataset.py:100-101, train_CERRA.py:30-334) fits a
16 GB v5e ONLY for the CNN_3D backbone, at a measured 15.01 GiB with <1 GB
headroom (BASELINE.md "CERRA real-world geometry").  Any layout or remat
regression that grows the program past ~15.7 GiB silently kills the only
single-chip real-world training configuration, so this test AOT-compiles
the full train step at that geometry (scripts/memory_fit.py, compile-only
-- no device execution, safe while a training run owns the chip) and pins
the envelope.

The suite's conftest forces the CPU platform in-process, so the probe runs
in a SUBPROCESS where the axon TPU platform is still the default.  Skips
(not fails) when the TPU tunnel is unreachable or the single-core box is
too contended to finish the compile.
"""
# ------------------------------------------------------------------

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.golden  # slow path: excluded from `-m "not golden"`


def test_cerra_512x832_cnn_program_fits_v5e():
    cmd = [sys.executable, os.path.join(REPO, "scripts", "memory_fit.py"),
           "--family", "real", "--encoder", "CNN_3D", "--batch", "1",
           "--hw", "512x832", "--remat"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=900, cwd=REPO)
    except subprocess.TimeoutExpired:
        pytest.skip("memory-fit compile did not finish in 15 min "
                    "(contended single-core box or slow tunnel)")
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        row = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        pytest.skip("memory-fit probe produced no JSON (TPU tunnel "
                    f"unreachable?): stdout={proc.stdout[-300:]!r} "
                    f"stderr={proc.stderr[-300:]!r}")
    if "error" in row:
        err = row["error"]
        if any(s in err for s in ("UNAVAILABLE", "DEADLINE", "Connection",
                                  "connect", "socket")):
            pytest.skip(f"TPU compile service unreachable: {err[:200]}")
        # a compile-helper crash at this geometry reads as "does not fit"
        # (scripts/memory_fit.py docstring) -- that IS the regression
        pytest.fail(f"512x832 CNN_3D train step no longer compiles "
                    f"within HBM: {err[:300]}")
    # measured 2026-08-19: temp 14.86 + args 0.15 = 15.01 GiB total.
    # fits_16gb uses a 15.0 threshold on temp+args+code; allow the pin a
    # little float (usable HBM is ~15.75 GiB) but fail well before OOM.
    assert row["total_gb"] < 15.6, row
    # sanity floor: the probe really compiled the big geometry (a config
    # regression that shrinks the crop would pass the ceiling trivially)
    assert row["total_gb"] > 8.0, row
    assert row["hw"] == "512x832", row
