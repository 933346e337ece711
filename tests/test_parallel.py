"""Multi-device data parallelism on the 8-device virtual CPU mesh:
sharded train step compiles, runs, and matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.models import build_model
from idee_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding
from idee_tpu.train.state import create_train_state
from idee_tpu.train.steps import init_epoch_metrics, make_train_step

ANOM_SHAPE = (3, 24, 16, 16)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh([8], ("data",))


def _make(cfg, batch_size):
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(batch_size, 3, 1, 8, 16, 16)),
                         jnp.float32),
        "mask_extreme": jnp.asarray(
            (rng.random((batch_size, 16, 16)) < 0.2), jnp.float32),
        "mask_extreme_loss": jnp.asarray(
            (rng.random((batch_size, 16, 16)) < 0.3), jnp.float32),
        "timestep": jnp.full((batch_size, 1), 8.0),
    }
    state = create_train_state(cfg, model, batch["x"], steps_per_epoch=10)
    return model, state, batch


def test_sharded_step_matches_single_device(tiny_config, mesh):
    cfg = tiny_config.replace(is_aug=False, en_drop_rate=0.0,
                              cls_drop_rate=0.0)
    model, state, batch = _make(cfg, batch_size=8)
    step = make_train_step(model, cfg, t0=1.0, donate=False)

    # single device
    s1, m1 = step(state, init_epoch_metrics(ANOM_SHAPE), batch)

    # sharded batch over the mesh, replicated params
    bshard = batch_sharding(mesh)
    rep = replicate_sharding(mesh)
    batch_sh = jax.tree.map(lambda a: jax.device_put(a, bshard), batch)
    state_sh = jax.device_put(state, rep)
    metrics_sh = jax.device_put(init_epoch_metrics(ANOM_SHAPE), rep)
    s2, m2 = step(state_sh, metrics_sh, batch_sh)

    np.testing.assert_allclose(float(m1["loss_sums"]["loss"]),
                               float(m2["loss_sums"]["loss"]), rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(m1["vote_cnt"]),
                                  np.asarray(m2["vote_cnt"]))
    # params after one update must match (GSPMD grad reduction correct)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_counts_are_global(tiny_config, mesh):
    cfg = tiny_config
    model, state, batch = _make(cfg, batch_size=8)
    step = make_train_step(model, cfg, t0=1.0, donate=False)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh)), batch)
    rep = replicate_sharding(mesh)
    state_sh = jax.device_put(state, rep)
    metrics_sh = jax.device_put(init_epoch_metrics(ANOM_SHAPE), rep)
    _, m = step(state_sh, metrics_sh, batch_sh)
    assert int(m["counts"]["seen_all"]) == 8 * 16 * 16


def test_spatial_sharding_matches_unsharded(fake_cube, tiny_config):
    """2-way data x 4-way height sharding: XLA's spatial partitioner
    inserts the conv halo exchanges; loss matches the unsharded step
    (SURVEY.md 2.9 optional extension -- the reference has no spatial
    parallelism)."""
    import jax
    import numpy as np

    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu.models import build_model
    from idee_tpu.parallel.mesh import (make_mesh, replicate_sharding,
                                        shard_batch_spatial)
    from idee_tpu.train.state import create_train_state
    from idee_tpu.train.steps import init_epoch_metrics, make_train_step

    cfg = tiny_config
    mesh = make_mesh([2, 4], ("data", "space"))
    ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                          variables=list(cfg.variables), delta_t=cfg.delta_t,
                          is_aug=False)
    loader = DataLoader(ds, 2, shuffle=False, drop_last=True, prefetch=0)
    host = {k: np.asarray(v) for k, v in next(iter(loader)).items()}

    model = build_model(cfg)
    step = make_train_step(model, cfg, t0=float(ds.timestep[0]),
                           donate=False)

    state = create_train_state(cfg, model, np.zeros_like(host["x"]),
                               steps_per_epoch=4)
    sharded = shard_batch_spatial(host, mesh)
    assert "space" in str(sharded["x"].sharding.spec)
    s1 = jax.device_put(state, replicate_sharding(mesh))
    m1 = jax.device_put(init_epoch_metrics(ds.anomaly.shape),
                        replicate_sharding(mesh))
    _, m1 = step(s1, m1, sharded)
    loss_spatial = float(jax.device_get(m1["loss_sums"]["loss"]))

    m0 = init_epoch_metrics(ds.anomaly.shape)
    _, m0 = step(state, m0, jax.device_put(host))
    loss_ref = float(jax.device_get(m0["loss_sums"]["loss"]))
    np.testing.assert_allclose(loss_spatial, loss_ref, rtol=1e-3)


def test_window_batch_constraint_matches_unsharded(fake_cube, tiny_config):
    """Swin under the spatial mesh WITH runtime.set_spatial_mesh: the
    window-batch with_sharding_constraint (the round-5 fix that makes
    512x832 Swin per-device memory scale — BASELINE.md memory fit) must
    not change the math. CPU mesh: the dispatch takes the unfolded XLA
    path, but the constraint is applied at the window_attention dispatch
    level, so this pins exactly the production program structure."""
    import jax
    import numpy as np

    from idee_tpu.data.loader import DataLoader
    from idee_tpu.data.synthetic import SyntheticDataset
    from idee_tpu.kernels.runtime import set_spatial_mesh
    from idee_tpu.parallel.mesh import (make_mesh, replicate_sharding,
                                        shard_batch_spatial)
    from idee_tpu.train.steps import init_epoch_metrics, make_train_step

    cfg = tiny_config.replace(encoder="Swin_3D", is_aug=False,
                              en_drop_rate=0.0, cls_drop_rate=0.0,
                              en_attn_drop_rate=0.0)
    mesh = make_mesh([2, 4], ("data", "space"))
    ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                          variables=list(cfg.variables),
                          delta_t=cfg.delta_t, is_aug=False)
    loader = DataLoader(ds, 2, shuffle=False, drop_last=True, prefetch=0)
    host = {k: np.asarray(v) for k, v in next(iter(loader)).items()}

    model = build_model(cfg)
    state = create_train_state(cfg, model, np.zeros_like(host["x"]),
                               steps_per_epoch=4)

    # unsharded reference (no constraint registered)
    step0 = make_train_step(model, cfg, t0=float(ds.timestep[0]),
                            donate=False)
    m0 = init_epoch_metrics(ds.anomaly.shape)
    _, m0 = step0(state, m0, jax.device_put(host))
    loss_ref = float(jax.device_get(m0["loss_sums"]["loss"]))

    set_spatial_mesh(mesh)
    try:
        # fresh jit so the constraint is traced into the program
        step1 = make_train_step(model, cfg, t0=float(ds.timestep[0]),
                                donate=False)
        sharded = shard_batch_spatial(host, mesh)
        s1 = jax.device_put(state, replicate_sharding(mesh))
        m1 = jax.device_put(init_epoch_metrics(ds.anomaly.shape),
                            replicate_sharding(mesh))
        _, m1 = step1(s1, m1, sharded)
        loss_spatial = float(jax.device_get(m1["loss_sums"]["loss"]))
    finally:
        set_spatial_mesh(None)
    np.testing.assert_allclose(loss_spatial, loss_ref, rtol=2e-3)
