# ------------------------------------------------------------------
"""Training driver for the synthetic benchmark.

Parity target: reference train_synthetic.py:30-334 -- same data flow, same
loss composition, same evaluators and per-epoch majority-vote driver scoring,
same best-loss / best-F1 checkpoint policy -- restructured TPU-first:

* ONE jitted train step (forward+backward+update+thresholding+metric
  counters on device); the host only accumulates tiny counters and the
  [N,V,T,H,W] anomaly bits for the timeline collector,
* the input pipeline prefetches batches to device memory ahead of compute,
* multi-chip: batch sharded over the mesh 'data' axis (GSPMD).
"""
# ------------------------------------------------------------------

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from idee_tpu.config import Config
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.models import build_model
from idee_tpu.parallel.mesh import batch_sharding, make_mesh
from idee_tpu.train.checkpoint import CheckpointManager, load_pretrained_params
from idee_tpu.train.metrics import (AnomalyCollector, EvaluatorAnomalySynthetic,
                                    EvaluatorSynthetic)
from idee_tpu.train.state import count_parameters, create_train_state
from idee_tpu.train.steps import make_eval_step, make_train_step
from idee_tpu.utils.logging import StepTimer, fix_seed, get_logger, log_string


def _make_datasets(cfg: Config, train_cube=None, val_cube=None):
    common = dict(
        variables=list(cfg.variables),
        variables_static=list(cfg.variables_static),
        delta_t=cfg.delta_t,
        is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale,
        window_size=cfg.window_size,
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


def train_synthetic(cfg: Config,
                    train_cube: Optional[SyntheticCube] = None,
                    val_cube: Optional[SyntheticCube] = None,
                    mesh=None) -> Dict:
    """Train on the synthetic benchmark; returns a history dict."""
    logger = get_logger(cfg)
    fix_seed(cfg.seed)

    log_string(logger, "loading training dataset ...")
    train_ds, val_ds = _make_datasets(cfg, train_cube, val_cube)
    log_string(logger, "# training samples: %d" % len(train_ds))
    log_string(logger, "# evaluation samples: %d" % len(val_ds))

    if mesh is None and cfg.mesh_shape:
        mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axes))
    sharding = batch_sharding(mesh) if mesh is not None else None

    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed,
                              sharding=sharding)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                            drop_last=False, seed=cfg.seed,
                            sharding=sharding)

    log_string(logger, "\nloading the model ...")
    model = build_model(cfg)
    sample = train_ds[0]
    sample_x = sample["x"][None].repeat(cfg.batch_size, 0)
    state = create_train_state(cfg, model, sample_x,
                               rng=jax.random.PRNGKey(cfg.seed),
                               steps_per_epoch=len(train_loader))
    log_string(logger, "all parameters: %d\n" % count_parameters(state.params))

    if cfg.en_de_pretrained:
        log_string(logger, f"initialize weights from {cfg.en_de_pretrained} ...")
        state = state.replace(
            params=load_pretrained_params(cfg.en_de_pretrained, state.params))

    ckpt = CheckpointManager(cfg.log_dir)
    start_epoch = 0
    restored = ckpt.restore("latest", state) if ckpt.has("latest") else None
    if restored is not None:
        state = restored["state"]
        start_epoch = int(restored["meta"]["epoch"]) + 1
        log_string(logger, f"auto-resumed from epoch {start_epoch}")

    train_step = make_train_step(model, cfg)
    eval_step = make_eval_step(model, cfg)

    eval_train = EvaluatorSynthetic(logger, "Training")
    eval_val = EvaluatorSynthetic(logger, "Validation")
    col_train = AnomalyCollector(train_ds.anomaly.shape, train_ds.timestep,
                                 cfg.delta_t)
    col_val = AnomalyCollector(val_ds.anomaly.shape, val_ds.timestep,
                               cfg.delta_t)
    eval_train_anom = EvaluatorAnomalySynthetic(logger, "Training",
                                                cfg.variables)
    eval_val_anom = EvaluatorAnomalySynthetic(logger, "Validation",
                                              cfg.variables)

    best_loss_train, best_loss_val = np.inf, np.inf
    best_f1_val = 0.0
    history = {"train_loss": [], "val_loss": [], "train_f1": [], "val_f1": [],
               "train_anom_f1": [], "val_anom_f1": [],
               "steps_per_sec": []}

    for epoch in range(start_epoch, cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()
        loss_sum, n_steps = 0.0, 0

        # -- train epoch: device compute + async counter accumulation --
        pending = []  # (logs, host) pairs awaiting host sync
        for batch in train_loader:
            state, logs, host = train_step(state, batch)
            pending.append((logs, host))
            n_steps += 1
            timer.tick()
            if len(pending) >= 2:  # lag host sync one step behind compute
                loss_sum += _drain(pending.pop(0), eval_train, col_train)
        for item in pending:
            loss_sum += _drain(item, eval_train, col_train)

        mean_loss_train = loss_sum / max(n_steps, 1)
        col_train.majority_vote()
        eval_train_anom(np.swapaxes(col_train.anomaly, 0, 1),
                        np.swapaxes(train_ds.anomaly, 0, 1))
        eval_train_anom.get_results()
        eval_train.get_results(mean_loss_train, best_loss_train)
        best_loss_train = min(best_loss_train, mean_loss_train)

        # -- validation --
        loss_sum, n_val = 0.0, 0
        for batch in val_loader:
            logs, host = eval_step(state.params, batch)
            loss_sum += _drain((logs, host), eval_val, col_val)
            n_val += 1
        mean_loss_val = loss_sum / max(n_val, 1)
        col_val.majority_vote()
        eval_val_anom(np.swapaxes(col_val.anomaly, 0, 1),
                      np.swapaxes(val_ds.anomaly, 0, 1))
        eval_val_anom.get_results()
        eval_val.get_results(mean_loss_val, best_loss_val)

        # -- checkpoints (reference policy: train_synthetic.py:302-308) --
        if mean_loss_val <= best_loss_val:
            best_loss_val = mean_loss_val
            ckpt.save("best_loss_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        f1_val = float(np.nanmean(eval_val.F1))
        if f1_val >= best_f1_val:
            best_f1_val = f1_val
            ckpt.save("best_F1_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        ckpt.save("latest", state, epoch, mean_loss_train, mean_loss_val)

        history["train_loss"].append(mean_loss_train)
        history["val_loss"].append(mean_loss_val)
        history["train_f1"].append(float(np.nanmean(eval_train.F1)))
        history["val_f1"].append(f1_val)
        history["train_anom_f1"].append(float(np.nanmean(eval_train_anom.F1_pos)))
        history["val_anom_f1"].append(float(np.nanmean(eval_val_anom.F1_pos)))
        history["steps_per_sec"].append(timer.steps_per_sec)
        log_string(logger, "steps/sec: %.3f" % timer.steps_per_sec)

        for ev in (eval_train, eval_val, eval_train_anom, eval_val_anom):
            ev.reset()
        col_train.reset()
        col_val.reset()

    history["state"] = state
    return history


def _drain(item, evaluator, collector) -> float:
    """Host-sync one step's logs: accumulate counters + timeline votes."""
    logs, host = item
    evaluator.update_counts(jax.device_get(logs["counts"]))
    collector(np.asarray(host["anomaly"]), np.asarray(host["timestep"]))
    return float(logs["loss"])
