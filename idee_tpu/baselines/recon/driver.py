# ------------------------------------------------------------------
"""Reconstruction train / test drivers (STEAL, UniAD) for the synthetic
benchmark.

Parity targets: Baselines_Reconstruction/train_{steal,uniad}_synthetic.py
and test_{steal,uniad}_synthetic.py. Both train on the anomaly-replaced
cube; anomaly at eval = per-pixel squared error above the midpoint of the
normal/extreme mean errors (train_steal_synthetic.py:186-200,
train_uniad_synthetic.py:244-254), majority-voted over the timeline.
"""
# ------------------------------------------------------------------

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.baselines.config import ReconConfig
from idee_tpu.baselines.recon.steal import RecModel, steal_loss
from idee_tpu.baselines.recon.uniad import UniAD
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.train.checkpoint import (CheckpointManager,
                                       load_pretrained_params)
from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                    majority_vote_from_device)
from idee_tpu.train.state import (count_parameters, create_train_state,
                                  model_variables)
from idee_tpu.train.steps import _scatter_votes
from idee_tpu.utils.logging import StepTimer, fix_seed, get_logger, log_string


def _nanmean(a):
    a = np.asarray(a, float)
    m = ~np.isnan(a)
    return float(a[m].mean()) if m.any() else float("nan")


def init_recon_metrics(anomaly_shape):
    V, T, H, W = anomaly_shape
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "n_steps": jnp.zeros((), jnp.int32),
        "vote_sum": jnp.zeros((V, T, H, W), jnp.uint8),
        "vote_cnt": jnp.zeros((T,), jnp.int32),
    }


def _midpoint_anomaly(err, mask):
    """anomaly = err > (mean_normal + mean_extreme) / 2
    (reference: train_steal_synthetic.py:186-200). err [N,V,T,H,W];
    mask [N,T,H,W]."""
    sel_p = jnp.broadcast_to(mask[:, None] != 0, err.shape)
    sel_n = ~sel_p
    p_n = jnp.sum(err * sel_n) / jnp.maximum(sel_n.sum(), 1)
    p_p = jnp.sum(err * sel_p) / jnp.maximum(sel_p.sum(), 1)
    thr = (p_n + p_p) / 2.0
    return (err > thr).astype(jnp.uint8)


def _scatter(metrics, loss, anomaly, batch, t0, delta_t):
    metrics = dict(metrics)
    metrics["loss_sum"] = metrics["loss_sum"] + loss
    metrics["n_steps"] = metrics["n_steps"] + 1
    t_index = (batch["timestep"][:, 0] - t0).astype(jnp.int32)
    vs, vc = _scatter_votes(metrics["vote_sum"], metrics["vote_cnt"],
                            anomaly, t_index, delta_t)
    metrics["vote_sum"], metrics["vote_cnt"] = vs, vc
    return metrics


# ------------------------------------------------------------------
# STEAL


def make_steal_train_step(model, cfg: ReconConfig, t0: float,
                          donate: bool = True):
    def step(state, metrics, batch):
        x = batch["x"][:, :, 0]                 # [N, V, T, H, W]
        mask = batch["mask_extreme_loss_t"]     # [N, T, H, W]
        extra = state.extra_vars or {}
        mutable = [c for c in ("batch_stats",) if c in extra]

        def loss_fn(params):
            variables = {"params": params, **extra}
            if mutable:
                out, upd = model.apply(variables, x, train=True,
                                       mutable=mutable)
            else:
                out = model.apply(variables, x, train=True)
                upd = {}
            return steal_loss(out.pred, x, mask), (out, upd)

        (loss, (out, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if mutable:
            new_state = new_state.replace(extra_vars={**extra, **upd})
        err = (out.pred - x) ** 2
        anomaly = _midpoint_anomaly(err, mask)
        return new_state, _scatter(metrics, loss, anomaly, batch, t0,
                                   cfg.delta_t)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_steal_eval_step(model, cfg: ReconConfig, t0: float):
    def step(variables, metrics, batch):
        x = batch["x"][:, :, 0]
        mask = batch["mask_extreme_loss_t"]
        out = model.apply(variables, x, train=False)
        loss = steal_loss(out.pred, x, mask)
        err = (out.pred - x) ** 2
        anomaly = _midpoint_anomaly(err, mask)
        return _scatter(metrics, loss, anomaly, batch, t0, cfg.delta_t)

    return jax.jit(step, donate_argnums=(1,))


# ------------------------------------------------------------------
# UniAD


def make_uniad_train_step(model, cfg: ReconConfig, t0: float,
                          donate: bool = True):
    def step(state, metrics, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        r1, r2, r3 = jax.random.split(rng, 3)
        x = batch["x"][:, :, 0, 0]              # [N, V, H, W], delta_t == 1

        def loss_fn(params):
            out = model.apply(
                {"params": params}, x, None, train=True,
                rngs={"jitter": r1, "jitter_noise": r2, "dropout": r3})
            return jnp.mean(out.loss_map)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["loss_sum"] = metrics["loss_sum"] + loss
        metrics["n_steps"] = metrics["n_steps"] + 1
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_uniad_eval_step(model, cfg: ReconConfig, t0: float):
    def step(variables, metrics, batch):
        x = batch["x"][:, :, 0, 0]
        mask = batch["mask_extreme_loss_t"][:, 0]   # [N, H, W]
        out = model.apply(variables, x, mask, train=False)
        # out.loss_map is sign-flipped on extremes; its mean is the val
        # loss, |.| restores the raw error for thresholding
        # (train_uniad_synthetic.py:234-254)
        loss = jnp.mean(out.loss_map)
        raw = jnp.abs(out.loss_map)[:, :, None]     # [N, V, 1, H, W]
        anomaly = _midpoint_anomaly(raw, mask[:, None])
        return _scatter(metrics, loss, anomaly, batch, t0, cfg.delta_t)

    return jax.jit(step, donate_argnums=(1,))


# ------------------------------------------------------------------
# shared driver scaffold


def _datasets(cfg, train_cube, val_cube):
    common = dict(
        variables=list(cfg.variables), variables_static=[],
        delta_t=cfg.delta_t, is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale, window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max,
        seed=cfg.seed,
    )
    root = None if train_cube is not None else cfg.root_synthetic
    train_ds = SyntheticDataset(
        cube=train_cube, root_datacube=root, times=cfg.times_train,
        is_aug=cfg.is_aug, is_replace_anomaly=cfg.is_replace_anomaly,
        **common)
    root = None if val_cube is not None else cfg.root_synthetic
    val_ds = SyntheticDataset(cube=val_cube, root_datacube=root,
                              times=cfg.times_val, is_aug=False, **common)
    return train_ds, val_ds


def _build(cfg: ReconConfig, which: str):
    if which == "steal":
        model = RecModel(chnum_in=cfg.in_channels_dynamic,
                         en_embed_dim=list(cfg.en_embed_dim_steal),
                         de_embed_dim=list(cfg.de_embed_dim_steal))
        return model, make_steal_train_step, make_steal_eval_step
    if which == "uniad":
        return UniAD(config=cfg), make_uniad_train_step, make_uniad_eval_step
    raise NotImplementedError(which)


def train_recon_synthetic(cfg: ReconConfig, which: str,
                          train_cube: Optional[SyntheticCube] = None,
                          val_cube: Optional[SyntheticCube] = None) -> Dict:
    logger = get_logger(cfg)
    fix_seed(cfg.seed)
    train_ds, val_ds = _datasets(cfg, train_cube, val_cube)
    log_string(logger, "# training samples: %d" % len(train_ds))

    keys = ["x", "mask_extreme_loss_t", "timestep"]
    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed, keys=keys)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                            drop_last=True, seed=cfg.seed, keys=keys)

    model, make_train, make_eval = _build(cfg, which)
    sample = train_ds[0]
    sample_x = sample["x"][None].repeat(cfg.batch_size, 0)
    x0 = (jnp.asarray(sample_x[:, :, 0]) if which == "steal"
          else jnp.asarray(sample_x[:, :, 0, 0]))
    state = create_train_state(cfg, model, x0,
                               steps_per_epoch=len(train_loader))
    log_string(logger, "all parameters: %d\n" % count_parameters(state.params))
    if cfg.en_de_pretrained:
        state = state.replace(params=load_pretrained_params(
            cfg.en_de_pretrained, state.params))

    ckpt = CheckpointManager(cfg.log_dir)
    train_step = make_train(model, cfg, t0=float(train_ds.timestep[0]))
    eval_step = make_eval(model, cfg, t0=float(val_ds.timestep[0]))
    eval_val = EvaluatorAnomalySynthetic(logger, "Validation", cfg.variables)

    best_loss_val = np.inf
    history = {"train_loss": [], "val_loss": [], "val_anom_f1": [],
               "steps_per_sec": []}

    for epoch in range(cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()
        metrics = init_recon_metrics(train_ds.anomaly.shape)
        for batch in train_loader:
            state, metrics = train_step(state, metrics, batch)
            timer.tick()
        m = jax.device_get(metrics)
        mean_loss_train = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        log_string(logger, "%s mean loss     : %.6f" % ("Training",
                                                        mean_loss_train))

        metrics = init_recon_metrics(val_ds.anomaly.shape)
        for batch in val_loader:
            metrics = eval_step(model_variables(state), metrics, batch)
        m = jax.device_get(metrics)
        mean_loss_val = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
        eval_val(np.swapaxes(anomaly, 0, 1),
                 np.swapaxes(val_ds.anomaly, 0, 1))
        eval_val.get_results()
        log_string(logger, "%s mean loss     : %.6f" % ("Validation",
                                                        mean_loss_val))

        if mean_loss_val <= best_loss_val:
            best_loss_val = mean_loss_val
            ckpt.save("best_loss_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        ckpt.save("latest", state, epoch, mean_loss_train, mean_loss_val)

        history["train_loss"].append(mean_loss_train)
        history["val_loss"].append(mean_loss_val)
        history["val_anom_f1"].append(_nanmean(eval_val.F1_pos))
        history["steps_per_sec"].append(timer.steps_per_sec)
        eval_val.reset()

    history["state"] = state
    return history


def test_recon_synthetic(cfg: ReconConfig, which: str,
                         cube: Optional[SyntheticCube] = None,
                         params=None) -> Dict:
    logger = get_logger(cfg)
    fix_seed(cfg.seed)
    ds = SyntheticDataset(
        cube=cube, root_datacube=None if cube is not None else
        cfg.root_synthetic,
        times=cfg.times_test, is_aug=False, is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale, variables=list(cfg.variables),
        variables_static=[], delta_t=cfg.delta_t,
        window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max)
    log_string(logger, "# testing samples: %d" % len(ds))

    model, _, make_eval = _build(cfg, which)
    if params is None:
        sample_x = ds[0]["x"][None].repeat(cfg.batch_size, 0)
        x0 = (jnp.asarray(sample_x[:, :, 0]) if which == "steal"
              else jnp.asarray(sample_x[:, :, 0, 0]))
        state = create_train_state(cfg, model, x0)
        if cfg.en_de_pretrained:
            state = state.replace(params=load_pretrained_params(
                cfg.en_de_pretrained, state.params))
        else:
            log_string(logger, "WARNING: evaluating a random initialization")
        variables = model_variables(state)
    else:
        variables = params if "params" in params else {"params": params}

    loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=True,
                        seed=cfg.seed)
    eval_step = make_eval(model, cfg, t0=float(ds.timestep[0]))
    evaluator = EvaluatorAnomalySynthetic(logger, "Testing", cfg.variables)

    metrics = init_recon_metrics(ds.anomaly.shape)
    for batch in loader:
        metrics = eval_step(variables, metrics, batch)
    m = jax.device_get(metrics)
    anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
    evaluator(np.swapaxes(anomaly, 0, 1), np.swapaxes(ds.anomaly, 0, 1))
    evaluator.get_results()
    return {
        "driver_f1_pos": _nanmean(evaluator.F1_pos),
        "driver_iou_pos": _nanmean(evaluator.iou_pos),
        "mean_loss": float(m["loss_sum"]) / max(int(m["n_steps"]), 1),
    }
