"""Guards the graded driver artifacts in __graft_entry__.py.

Round-1 failure mode: dryrun_multichip built state/buffers on the default
backend (the remote TPU) before device_put-ing to the CPU mesh, so an
unhealthy TPU client turned the multi-chip artifact red (MULTICHIP_r01.json
ok:false). The dryrun must be CPU-hermetic: it may never initialize the TPU
backend, regardless of the caller's environment.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_is_cpu_hermetic():
    """Run the dryrun in a clean subprocess (no JAX_PLATFORMS, no XLA_FLAGS
    pre-set -- the driver's environment) and assert both mesh layouts pass.
    The in-function `jax.default_backend() == "cpu"` assert plus the probe
    below prove the TPU plugin was never initialized."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "import jax; "
        "assert jax.default_backend() == 'cpu', jax.default_backend(); "
        # every live backend must be CPU -- TPU never came up
        "from jax._src import xla_bridge as xb; "
        "assert all(p == 'cpu' for p in xb.backends()), list(xb.backends())"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "data mesh [8]" in proc.stdout, proc.stdout
    assert "space mesh [2,4]" in proc.stdout, proc.stdout
