import os

# 8 virtual CPU devices for multi-chip sharding tests. NOTE: this container
# pre-registers a TPU PJRT plugin via sitecustomize, so JAX_PLATFORMS in
# os.environ can be too late -- use jax.config.update before any backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fake_cube():
    from idee_tpu.data.fake import make_fake_cube

    return make_fake_cube(n_vars=3, n_time=64, height=16, width=16, seed=0)


@pytest.fixture(scope="session")
def tiny_config():
    from idee_tpu.config import synthetic_config

    return synthetic_config(
        in_channels_dynamic=3,
        variables=["var_01", "var_02", "var_03"],
        x_max=16, y_max=16,
        times_train=(1, 40), times_val=(41, 56),
        en_embed_dim=[8, 8], en_depths=[1, 1],
        codebook_dim=8, cls_dim=8,
        batch_size=2, n_epochs=2,
    )


REFERENCE = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE)


# The torch-golden modules dominate suite runtime (they rebuild reference
# torch models per test); auto-mark them so the review loop can deselect
# with `-m "not golden"` while CI-style full runs keep them (pytest.ini).
_GOLDEN_MODULES_PREFIXES = ("tests.test_golden_", "test_golden_",
                            "tests.test_interop", "test_interop")


# Third tier (VERDICT r4 weak #8): the multi-minute integration hogs —
# full driver runs, multi-device CPU-mesh equality, fused-epoch equality,
# dryrun — measured >60s each on this 1-core box (--durations, round 5).
# The fast review loop deselects them (`-m "not golden and not heavy"`);
# run `-m "not golden"` before committing driver/parallel/baseline
# changes, and the full suite before encoder/classifier/quantizer ones.
_HEAVY_TESTS = (
    "test_baselines.py::TestRecon::test_train_step",
    "test_baselines.py::TestMILTraining::test_train_step[rtfm",
    "test_baselines.py::TestMILTraining::test_train_step[mgfn",
    "test_reanalysis.py::test_real_fused_epoch_matches_per_step",
    "test_graft_entry.py::test_dryrun_multichip_is_cpu_hermetic",
    "test_fused_epoch.py::test_fused_epoch_matches_per_step",
    "test_history.py::test_driver_history_spans_resume_sessions",
    "test_parallel.py::test_window_batch_constraint_matches_unsharded",
    "test_parallel.py::test_spatial_sharding_matches_unsharded",
    "test_predict_real.py::test_predict_real_export",
    "test_predict.py::test_predict_export_roundtrip",
    "test_reanalysis.py::test_real_train_driver_writes_panels",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item.module, "__name__", "")
        if mod.startswith(_GOLDEN_MODULES_PREFIXES):
            item.add_marker(pytest.mark.golden)
        if any(h in item.nodeid for h in _HEAVY_TESTS):
            item.add_marker(pytest.mark.heavy)
