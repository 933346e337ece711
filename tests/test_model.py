"""Composite VQ model: shapes, jit, gradient flow, learning smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.models import build_model
from idee_tpu.train.state import count_parameters, create_train_state
from idee_tpu.train.steps import (init_epoch_metrics, make_eval_step,
                                  make_train_step)


def _batch_from(ds, idxs):
    from idee_tpu.data.loader import collate

    return jax.tree.map(jnp.asarray, collate([ds[i] for i in idxs]))


def test_forward_shapes(tiny_config):
    cfg = tiny_config
    model = build_model(cfg)
    N, V, C, T, H, W = 2, 3, 1, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (N, V, C, T, H, W))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.z.shape == (N, 1, H, W)
    assert out.y.shape == (N, V, 1, H, W)
    assert out.anomaly.shape == (N, V, T, H, W)
    assert out.z_q.shape == (N, V, cfg.codebook_dim, T, H, W)
    assert out.vq0.shape == (cfg.codebook_dim,)
    assert out.loss_z_q.shape == ()
    assert count_parameters(variables["params"]) > 0


def test_anomaly_is_binary(tiny_config):
    model = build_model(tiny_config)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 1, 8, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert set(np.unique(np.asarray(out.anomaly))) <= {0, 1}


def test_train_step_runs_and_loss_decreases(tiny_config, fake_cube):
    from idee_tpu.data.synthetic import SyntheticDataset

    cfg = tiny_config
    ds = SyntheticDataset(cube=fake_cube, times=(1, 40),
                          variables=list(fake_cube.variables),
                          variables_static=[], delta_t=8,
                          is_aug=False, is_norm=True, is_clima_scale=False,
                          x_min=0, x_max=16, y_min=0, y_max=16)
    model = build_model(cfg)
    batch = _batch_from(ds, [0, 1])
    state = create_train_state(cfg, model, batch["x"],
                               steps_per_epoch=10)
    step = make_train_step(model, cfg, t0=float(ds.timestep[0]), donate=False)

    losses = []
    for i in range(8):
        metrics = init_epoch_metrics(ds.anomaly.shape)
        state, metrics = step(state, metrics, batch)
        losses.append(float(metrics["loss_sums"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert metrics["vote_sum"].shape == ds.anomaly.shape
    assert int(metrics["counts"]["seen_all"]) == 2 * 16 * 16
    # both samples' windows scattered onto the timeline
    assert int(np.asarray(metrics["vote_cnt"]).sum()) == 2 * 8


def test_eval_step_deterministic(tiny_config, fake_cube):
    from idee_tpu.data.synthetic import SyntheticDataset

    cfg = tiny_config
    ds = SyntheticDataset(cube=fake_cube, times=(1, 40),
                          variables=list(fake_cube.variables),
                          variables_static=[], delta_t=8,
                          is_aug=False, is_norm=True, is_clima_scale=False,
                          x_min=0, x_max=16, y_min=0, y_max=16)
    model = build_model(cfg)
    batch = _batch_from(ds, [0, 1])
    state = create_train_state(cfg, model, batch["x"])
    estep = make_eval_step(model, cfg, t0=float(ds.timestep[0]),
                           return_preds=True)
    m1 = init_epoch_metrics(ds.anomaly.shape)
    m2 = init_epoch_metrics(ds.anomaly.shape)
    m1, h1 = estep(state.params, m1, batch)
    m2, h2 = estep(state.params, m2, batch)
    np.testing.assert_array_equal(np.asarray(h1["pred"]), np.asarray(h2["pred"]))
    assert float(m1["loss_sums"]["loss_z_q"]) == 0.0  # eval: aux is zero


def test_gradients_reach_all_params(tiny_config):
    cfg = tiny_config
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 8, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    me = jnp.zeros((2, 16, 16))
    me = me.at[:, 4:8, 4:8].set(1.0)

    def loss_fn(params):
        from idee_tpu import losses as L

        out = model.apply({"params": params}, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1),
                                "droppath": jax.random.PRNGKey(2)})
        loss, _ = L.total_loss_synthetic(out, me, me, cfg.lambda_anomaly)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero_paths = [jax.tree_util.keystr(p) for p, g in flat
                  if not np.any(np.asarray(g))]
    # every parameter should receive gradient signal
    assert not zero_paths, f"zero grads at: {zero_paths[:10]}"


@pytest.mark.parametrize("encoder", ["CNN_3D", "Swin_3D", "Mamba"])
@pytest.mark.parametrize("scheme", ["reference", "zero_mean", "lecun"])
def test_init_schemes_all_encoders(tiny_config, encoder, scheme):
    """Every init_scheme must initialize every backbone (regression: the
    lecun scheme passes kernel_init=None down the towers and raw
    self.param sites must fall back to a fan-in default -- the Mamba
    conv1d_kernel crashed with 'NoneType is not callable')."""
    cfg = tiny_config.replace(encoder=encoder, init_scheme=scheme)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 1, 8, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert count_parameters(variables["params"]) > 0
