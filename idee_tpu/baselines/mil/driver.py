# ------------------------------------------------------------------
"""MIL training / testing drivers for the synthetic benchmark.

Parity targets: Baselines_MIL/train_{deepmil,arnet,rtfm,mgfn}_synthetic.py
and test_mil_synthetic.py -- per-epoch loss + anomaly-collector majority
vote scored by evaluator_anomaly_synthetic (the MIL drivers score only the
drivers, not the extremes). Same TPU-first structure as the core driver:
one jitted step, device-resident vote buffers, one host sync per epoch.

BatchNorm models (RTFM's Aggregate, MGFN's FOCUS) thread their
"batch_stats" collection through TrainState.extra_vars with
mutable=["batch_stats"], the functional analogue of torch running stats.
"""
# ------------------------------------------------------------------

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.baselines.config import MILConfig
from idee_tpu.baselines.mil import losses as L
from idee_tpu.baselines.mil.models import build_mil_model
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.train.checkpoint import CheckpointManager, load_pretrained_params
from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                    majority_vote_from_device)
from idee_tpu.train.state import (count_parameters, create_train_state,
                                  model_variables)
from idee_tpu.train.steps import _scatter_votes
from idee_tpu.utils.logging import StepTimer, fix_seed, get_logger, log_string

VARIANTS = ("deepmil", "arnet", "rtfm", "mgfn")


# ------------------------------------------------------------------
# loss aggregation (the reference's per-sample/per-variable Python loops,
# e.g. train_deepmil_synthetic.py:176-184, as one vmapped computation)


def mil_total_loss(cfg: MILConfig, variant: str, out, mask, train: bool,
                   rng):
    """mask: [N, H, W] mask_extreme_loss. Returns scalar loss."""
    scores = out.scores                       # [N, V, T, H, W]
    N, V, T, H, W = scores.shape
    s = jnp.transpose(scores, (0, 1, 3, 4, 2)).reshape(N, V, H * W, T)
    m = mask.reshape(N, H * W)
    mask_p = m != 0
    mask_n = m == 0
    rngs = jax.random.split(rng, N * V).reshape(N, V, 2)

    if variant == "deepmil":
        def fn(s_, mp_, mn_, r_):
            return L.ranking_loss(s_, mp_, mn_, k=cfg.loss_k_deepmil,
                                  drop_rate=cfg.instance_drop_rate,
                                  train=train, rng=r_)
        per = jax.vmap(jax.vmap(fn, in_axes=(0, None, None, 0)),
                       in_axes=(0, 0, 0, 0))(s, mask_p, mask_n, rngs)
        return jnp.sum(per) / N

    if variant == "arnet":
        # k = t // alpha with t = H*W (train_arnet_synthetic.py:121-122)
        k = max(int(H * W // cfg.loss_alpha_arnet), 1)
        def rank(s_, mp_, mn_, r_):
            return L.dmil_ranking_loss(s_, mp_, mn_, k=k,
                                       drop_rate=cfg.instance_drop_rate,
                                       train=train, rng=r_)
        per_r = jax.vmap(jax.vmap(rank, in_axes=(0, None, None, 0)),
                         in_axes=(0, 0, 0, 0))(s, mask_p, mask_n, rngs)
        cent = partial(L.center_loss, lambda_c=cfg.loss_lambda_c_arnet)
        per_c = jax.vmap(jax.vmap(cent, in_axes=(0, None)),
                         in_axes=(0, 0))(s, mask_n)
        return (jnp.sum(per_r) + jnp.sum(per_c)) / N

    feats = out.features                      # [N, V, T, H, W, C]
    f = jnp.transpose(feats, (0, 1, 3, 4, 2, 5)).reshape(
        N, V, H * W, T, feats.shape[-1])

    if variant == "rtfm":
        def fn(s_, f_, mp_, mn_, r_):
            return L.rtfm_loss(s_, f_, mp_, mn_, k=cfg.loss_k_rtfm,
                               margin=cfg.loss_margin_rtfm,
                               alpha=cfg.loss_alpha_rtfm,
                               drop_rate=cfg.instance_drop_rate,
                               train=train, rng=r_)
        per = jax.vmap(jax.vmap(fn, in_axes=(0, 0, None, None, 0)),
                       in_axes=(0, 0, 0, 0, 0))(s, f, mask_p, mask_n, rngs)
        return jnp.sum(per) / N

    if variant == "mgfn":
        v_rngs = jax.random.split(rng, V)
        total = 0.0
        for v in range(V):  # V small; the reference loops v too
            total += L.mgfn_loss(
                s[:, v], f[:, v], mask_p, mask_n, k=cfg.loss_k_mgfn,
                lambda_mgfn=cfg.loss_lambda_mgfn,
                margin=cfg.loss_margin_mgfn,
                drop_rate=cfg.instance_drop_rate, train=train,
                rng=v_rngs[v])
        return total

    raise NotImplementedError(variant)


# ------------------------------------------------------------------
# jitted steps


def init_mil_metrics(anomaly_shape):
    V, T, H, W = anomaly_shape
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "n_steps": jnp.zeros((), jnp.int32),
        "vote_sum": jnp.zeros((V, T, H, W), jnp.uint8),
        "vote_cnt": jnp.zeros((T,), jnp.int32),
    }


def _dense_anomaly(cfg, variant, scores):
    """Threshold dense scores into anomaly bits [N, V, delta_t, H, W]
    (train_deepmil_synthetic.py:191-207; MGFN broadcasts its single
    timestep over delta_t and thresholds at >= 0.5,
    train_mgfn_synthetic.py:181-196)."""
    if variant == "mgfn":
        scores = jnp.broadcast_to(
            scores, scores.shape[:2] + (cfg.delta_t,) + scores.shape[3:])
        return (scores >= 0.5).astype(jnp.uint8)
    return (scores > 0.5).astype(jnp.uint8)


def _accumulate(cfg, variant, metrics, loss, out, batch, t0):
    metrics = dict(metrics)
    metrics["loss_sum"] = metrics["loss_sum"] + loss
    metrics["n_steps"] = metrics["n_steps"] + 1
    anomaly = _dense_anomaly(cfg, variant, out.scores)
    t_index = (batch["timestep"][:, 0] - t0).astype(jnp.int32)
    vs, vc = _scatter_votes(metrics["vote_sum"], metrics["vote_cnt"],
                            anomaly, t_index, cfg.delta_t)
    metrics["vote_sum"], metrics["vote_cnt"] = vs, vc
    return metrics


def make_mil_train_step(model, cfg: MILConfig, variant: str, t0: float,
                        donate: bool = True):
    def step(state, metrics, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        d_rng, p_rng, l_rng = jax.random.split(rng, 3)
        extra = state.extra_vars or {}
        mutable = [c for c in ("batch_stats",) if c in extra]

        def loss_fn(params):
            variables = {"params": params, **extra}
            rngs = {"dropout": d_rng, "droppath": p_rng}
            if mutable:
                out, upd = model.apply(variables, batch["x"], train=True,
                                       rngs=rngs, mutable=mutable)
            else:
                out = model.apply(variables, batch["x"], train=True,
                                  rngs=rngs)
                upd = {}
            loss = mil_total_loss(cfg, variant, out,
                                  batch["mask_extreme_loss"], True, l_rng)
            return loss, (out, upd)

        (loss, (out, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if mutable:
            new_state = new_state.replace(extra_vars={**extra, **upd})
        metrics = _accumulate(cfg, variant, metrics, loss, out, batch, t0)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_mil_eval_step(model, cfg: MILConfig, variant: str, t0: float):
    def step(variables, metrics, batch, rng):
        out = model.apply(variables, batch["x"], train=False)
        loss = mil_total_loss(cfg, variant, out,
                              batch["mask_extreme_loss"], False, rng)
        return _accumulate(cfg, variant, metrics, loss, out, batch, t0)

    return jax.jit(step, donate_argnums=(1,))


# ------------------------------------------------------------------
# drivers


def _nanmean(a):
    a = np.asarray(a, float)
    m = ~np.isnan(a)
    return float(a[m].mean()) if m.any() else float("nan")


def _make_datasets(cfg, train_cube, val_cube):
    common = dict(
        variables=list(cfg.variables), variables_static=[],
        delta_t=cfg.delta_t, is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale, window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max,
        seed=cfg.seed,
    )
    root = None if train_cube is not None else cfg.root_synthetic
    train_ds = SyntheticDataset(cube=train_cube, root_datacube=root,
                                times=cfg.times_train, is_aug=cfg.is_aug,
                                **common)
    root = None if val_cube is not None else cfg.root_synthetic
    val_ds = SyntheticDataset(cube=val_cube, root_datacube=root,
                              times=cfg.times_val, is_aug=False, **common)
    return train_ds, val_ds


def train_mil_synthetic(cfg: MILConfig, variant: str,
                        train_cube: Optional[SyntheticCube] = None,
                        val_cube: Optional[SyntheticCube] = None) -> Dict:
    assert variant in VARIANTS, variant
    logger = get_logger(cfg)
    fix_seed(cfg.seed)

    train_ds, val_ds = _make_datasets(cfg, train_cube, val_cube)
    log_string(logger, "# training samples: %d" % len(train_ds))
    log_string(logger, "# evaluation samples: %d" % len(val_ds))

    keys = ["x", "mask_extreme_loss", "timestep"]
    cast = ({"x": jnp.bfloat16} if cfg.dtype == "bfloat16" else None)
    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed, keys=keys,
                              cast=cast)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                            drop_last=True, seed=cfg.seed, keys=keys,
                            cast=cast)

    model = build_mil_model(cfg, variant)
    sample_x = train_ds[0]["x"][None].repeat(cfg.batch_size, 0)
    state = create_train_state(cfg, model, sample_x,
                               steps_per_epoch=len(train_loader))
    log_string(logger, "all parameters: %d\n" % count_parameters(state.params))
    if cfg.en_de_pretrained:
        state = state.replace(params=load_pretrained_params(
            cfg.en_de_pretrained, state.params))

    ckpt = CheckpointManager(cfg.log_dir)
    train_step = make_mil_train_step(model, cfg, variant,
                                     t0=float(train_ds.timestep[0]))
    eval_step = make_mil_eval_step(model, cfg, variant,
                                   t0=float(val_ds.timestep[0]))

    eval_train = EvaluatorAnomalySynthetic(logger, "Training", cfg.variables)
    eval_val = EvaluatorAnomalySynthetic(logger, "Validation", cfg.variables)

    best_loss_train, best_loss_val = np.inf, np.inf
    history = {"train_loss": [], "val_loss": [], "train_anom_f1": [],
               "val_anom_f1": [], "val_pred_rate": [], "steps_per_sec": []}
    eval_rng = jax.random.PRNGKey(cfg.seed + 1)

    for epoch in range(cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()
        metrics = init_mil_metrics(train_ds.anomaly.shape)
        for batch in train_loader:
            state, metrics = train_step(state, metrics, batch)
            timer.tick()
        m = jax.device_get(metrics)
        mean_loss_train = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
        eval_train(np.swapaxes(anomaly, 0, 1),
                   np.swapaxes(train_ds.anomaly, 0, 1))
        eval_train.get_results()
        log_string(logger, "%s mean loss     : %.4f" % ("Training",
                                                        mean_loss_train))
        best_loss_train = min(best_loss_train, mean_loss_train)

        metrics = init_mil_metrics(val_ds.anomaly.shape)
        for batch in val_loader:
            metrics = eval_step(model_variables(state), metrics, batch,
                                eval_rng)
        m = jax.device_get(metrics)
        mean_loss_val = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
        # predicted-positive rate over voted timesteps: separates "scores
        # never cross 0.5" (rate ~ 0, F1 undefined/0) from genuinely poor
        # ranking -- the key diagnostic for the ARNet zoo anomaly
        voted = np.asarray(m["vote_cnt"]) > 0
        history["val_pred_rate"].append(
            float(anomaly[:, voted].mean()) if voted.any() else float("nan"))
        eval_val(np.swapaxes(anomaly, 0, 1),
                 np.swapaxes(val_ds.anomaly, 0, 1))
        eval_val.get_results()
        log_string(logger, "%s mean loss     : %.4f" % ("Validation",
                                                        mean_loss_val))

        if mean_loss_val <= best_loss_val:
            best_loss_val = mean_loss_val
            ckpt.save("best_loss_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        ckpt.save("latest", state, epoch, mean_loss_train, mean_loss_val)

        history["train_loss"].append(mean_loss_train)
        history["val_loss"].append(mean_loss_val)
        history["train_anom_f1"].append(_nanmean(eval_train.F1_pos))
        history["val_anom_f1"].append(_nanmean(eval_val.F1_pos))
        history["steps_per_sec"].append(timer.steps_per_sec)
        eval_train.reset()
        eval_val.reset()

    history["state"] = state
    return history


def test_mil_synthetic(cfg: MILConfig, variant: str,
                       cube: Optional[SyntheticCube] = None,
                       params=None) -> Dict:
    """reference: Baselines_MIL/test_mil_synthetic.py."""
    assert variant in VARIANTS, variant
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

    model = build_mil_model(cfg, variant)
    if params is None:
        sample_x = ds[0]["x"][None].repeat(cfg.batch_size, 0)
        state = create_train_state(cfg, model, sample_x)
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
    eval_step = make_mil_eval_step(model, cfg, variant,
                                   t0=float(ds.timestep[0]))
    evaluator = EvaluatorAnomalySynthetic(logger, "Testing", cfg.variables)
    rng = jax.random.PRNGKey(cfg.seed)

    metrics = init_mil_metrics(ds.anomaly.shape)
    for batch in loader:
        metrics = eval_step(variables, metrics, batch, rng)
    m = jax.device_get(metrics)
    anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
    evaluator(np.swapaxes(anomaly, 0, 1), np.swapaxes(ds.anomaly, 0, 1))
    evaluator.get_results()
    return {
        "driver_f1_pos": _nanmean(evaluator.F1_pos),
        "driver_iou_pos": _nanmean(evaluator.iou_pos),
        "mean_loss": float(m["loss_sum"]) / max(int(m["n_steps"]), 1),
    }
