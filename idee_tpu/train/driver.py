# ------------------------------------------------------------------
"""Training driver for the synthetic benchmark.

Parity target: reference train_synthetic.py:30-334 -- same data flow, same
loss composition, same evaluators and per-epoch majority-vote driver scoring,
same best-loss / best-F1 checkpoint policy -- restructured TPU-first:

* ONE jitted train step (forward+backward+update+thresholding+metric
  counters+vote scatter all on device); the host syncs ONE small metrics
  pytree per epoch instead of full tensors per step (the reference stalls
  on .cpu() every step, train_synthetic.py:209-215),
* the input pipeline prefetches batches to device memory ahead of compute,
* multi-chip: batch sharded over the mesh 'data' axis (GSPMD).
"""
# ------------------------------------------------------------------

from typing import Dict, Optional

import jax
import numpy as np

from idee_tpu.config import Config
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.models import build_model
from idee_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    spatial_sharding)
from idee_tpu.train.checkpoint import CheckpointManager, load_pretrained_params
from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                    EvaluatorSynthetic,
                                    majority_vote_from_device)
from idee_tpu.train.state import (count_parameters, create_train_state,
                                  model_variables)
from idee_tpu.train.steps import (init_epoch_metrics, make_eval_step,
                                  make_train_step)
from idee_tpu.utils.logging import (StepTimer, SummaryWriter, fix_seed,
                                    get_logger, log_string)
from idee_tpu.utils.vis import generate_anomaly, generate_images_synthetic


def _nanmean(a) -> float:
    """np.nanmean without the all-NaN RuntimeWarning."""
    a = np.asarray(a, dtype=float)
    m = ~np.isnan(a)
    return float(a[m].mean()) if m.any() else float("nan")


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


def _epoch_results(metrics_host, evaluator, eval_anom, gt_anomaly):
    """Fold one epoch's device metrics into the host evaluators."""
    evaluator.update_counts(metrics_host["counts"])
    anomaly = majority_vote_from_device(metrics_host["vote_sum"],
                                        metrics_host["vote_cnt"])
    eval_anom(np.swapaxes(anomaly, 0, 1), np.swapaxes(gt_anomaly, 0, 1))
    n = max(int(metrics_host["n_steps"]), 1)
    return float(metrics_host["loss_sums"]["loss"]) / n


def train_synthetic(cfg: Config,
                    train_cube: Optional[SyntheticCube] = None,
                    val_cube: Optional[SyntheticCube] = None,
                    mesh=None) -> Dict:
    """Train on the synthetic benchmark; returns a history dict."""
    logger = get_logger(cfg)
    # snapshot config.txt/pkl/json even when the caller bypassed the CLI's
    # read_arguments (e.g. the accuracy harness) — diagnosis scripts
    # rebuild models from these (reference: config.py:206-248 saves on
    # parse; saving in the driver covers every entry path)
    from idee_tpu.config import save_options
    save_options(cfg)
    fix_seed(cfg.seed)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)  # SURVEY.md 5: sanitizer

    log_string(logger, "loading training dataset ...")
    train_ds, val_ds = _make_datasets(cfg, train_cube, val_cube)
    log_string(logger, "# training samples: %d" % len(train_ds))
    log_string(logger, "# evaluation samples: %d" % len(val_ds))

    if mesh is None and cfg.mesh_shape:
        mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axes))
    if mesh is not None:
        # Pallas kernels are not auto-partitionable; route dispatch to the
        # shardable XLA compositions for mesh programs (kernels/runtime.py)
        from idee_tpu.kernels.runtime import set_gspmd_mesh
        set_gspmd_mesh(mesh)
    if mesh is not None and "space" in cfg.mesh_axes:
        # batch + height sharding: XLA's spatial partitioner handles the
        # conv/window halo exchange over ICI (SURVEY.md 2.9, optional ext);
        # window_attention additionally re-establishes the sharding across
        # the window-partition reshape (runtime.set_spatial_mesh)
        from idee_tpu.kernels.runtime import set_spatial_mesh
        set_spatial_mesh(mesh)
        sharding = spatial_sharding(mesh)["batch"]
    elif mesh is not None:
        sharding = batch_sharding(mesh)
    else:
        sharding = None

    # upload only what the jitted steps + TB panels consume, in compact
    # dtypes -- host->device bandwidth is a first-order cost per step
    # (mask_anomaly is {0,1} and only feeds the epoch-end image panel)
    import jax.numpy as jnp

    keys = ["x", "mask_extreme", "mask_extreme_loss", "mask_anomaly",
            "timestep"]
    cast = {"mask_anomaly": np.uint8}
    x_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    if x_dtype is not None:
        cast["x"] = x_dtype
    if cfg.device_data:
        # cube lives on the chip; per-step host traffic = a [B] index vector
        from idee_tpu.data.device import DeviceLoader

        train_loader = DeviceLoader(train_ds, cfg.batch_size, shuffle=True,
                                    drop_last=True, seed=cfg.seed,
                                    dtype=x_dtype)
        val_loader = DeviceLoader(val_ds, cfg.batch_size, shuffle=True,
                                  drop_last=True, seed=cfg.seed,
                                  dtype=x_dtype, with_anomaly=True)
    else:
        train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                                  drop_last=True, seed=cfg.seed,
                                  sharding=sharding, keys=keys, cast=cast)
        val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                                drop_last=True, seed=cfg.seed,
                                sharding=sharding, keys=keys, cast=cast)

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

    # fused epochs: with a device-resident cube, one jitted lax.scan runs
    # the whole epoch (fetch+step) in a single dispatch -- per-step Python
    # dispatch costs ~2x the step's compute over the remote-TPU transport
    # (profile_step.py). Per-step mode remains for profiling (step
    # boundaries) and as an opt-out (cfg.fused_epoch=False).
    use_fused = (cfg.device_data and getattr(cfg, "fused_epoch", True)
                 and not cfg.profile_dir)
    if use_fused:
        from idee_tpu.train.steps import make_eval_epoch, make_train_epoch

        train_epoch = make_train_epoch(model, cfg, train_loader,
                                       t0=float(train_ds.timestep[0]),
                                       steps_per_epoch=len(train_loader))
        eval_epoch = make_eval_epoch(model, cfg, val_loader,
                                     t0=float(val_ds.timestep[0]))
    train_step = make_train_step(model, cfg, t0=float(train_ds.timestep[0]),
                                 steps_per_epoch=len(train_loader))
    eval_step = make_eval_step(model, cfg, t0=float(val_ds.timestep[0]))
    eval_step_preds = make_eval_step(model, cfg, t0=float(val_ds.timestep[0]),
                                     return_preds=True)
    writer = SummaryWriter(cfg.log_dir)

    eval_train = EvaluatorSynthetic(logger, "Training")
    eval_val = EvaluatorSynthetic(logger, "Validation")
    eval_train_anom = EvaluatorAnomalySynthetic(logger, "Training",
                                                cfg.variables)
    eval_val_anom = EvaluatorAnomalySynthetic(logger, "Validation",
                                              cfg.variables)

    best_loss_train, best_loss_val = np.inf, np.inf
    best_f1_val = 0.0
    from idee_tpu.train.history import flush_history, seed_history
    history = seed_history(cfg.log_dir,
                           ["train_loss", "val_loss", "train_f1", "val_f1",
                            "train_anom_f1", "val_anom_f1",
                            "steps_per_sec"], start_epoch)

    for epoch in range(start_epoch, cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()

        # -- train epoch: fully device-resident accumulation --
        profiling = cfg.profile_dir and epoch == start_epoch
        metrics = init_epoch_metrics(train_ds.anomaly.shape)
        if use_fused:
            import time as _time

            from idee_tpu.train.steps import epoch_chunks

            dyn, ext, anom = train_loader.arrays
            order, ep = train_loader.epoch_order()
            t_ep = _time.perf_counter()
            # bounded dispatches (axon watchdog; see Config.fused_chunk),
            # rng-identical to one full-epoch scan via the start offsets
            for sl, start in epoch_chunks(order.shape[0],
                                          getattr(cfg, "fused_chunk", 16)):
                state, metrics = train_epoch(state, metrics, dyn, ext,
                                             anom, order[sl], np.int32(ep),
                                             np.int32(start))
            m = jax.device_get(metrics)  # the only reliable barrier here
            sps = order.shape[0] / (_time.perf_counter() - t_ep)
        else:
            for i, batch in enumerate(train_loader):
                if profiling and i == 2:  # skip compile steps
                    jax.profiler.start_trace(cfg.profile_dir)
                state, metrics = train_step(state, metrics, batch)
                timer.tick()
                if profiling and i == 7:
                    jax.block_until_ready(metrics["n_steps"])
                    jax.profiler.stop_trace()
                    profiling = False
                    log_string(logger, f"profiler trace -> {cfg.profile_dir}")
            if profiling:  # short epoch: close the trace
                jax.block_until_ready(metrics["n_steps"])
                jax.profiler.stop_trace()
            m = jax.device_get(metrics)
            sps = timer.steps_per_sec
        mean_loss_train = _epoch_results(m, eval_train, eval_train_anom,
                                         train_ds.anomaly)
        eval_train_anom.get_results()
        eval_train.get_results(mean_loss_train, best_loss_train)
        best_loss_train = min(best_loss_train, mean_loss_train)

        # -- validation --
        metrics = init_epoch_metrics(val_ds.anomaly.shape)
        last_batch = None
        if use_fused:
            from idee_tpu.train.steps import epoch_chunks

            dyn, ext, anom = val_loader.arrays
            order, ep = val_loader.epoch_order()
            for sl, start in epoch_chunks(order.shape[0],
                                          getattr(cfg, "fused_chunk", 16)):
                metrics = eval_epoch(model_variables(state), metrics,
                                     dyn, ext, anom, order[sl],
                                     np.int32(ep), np.int32(start))
            # one extra fetch for the TensorBoard image panels below
            last_batch = val_loader._fetch(
                order[-1], jax.random.fold_in(val_loader._key, ep))
        else:
            for batch in val_loader:
                metrics = eval_step(model_variables(state), metrics, batch)
                last_batch = batch
        m = jax.device_get(metrics)
        mean_loss_val = _epoch_results(m, eval_val, eval_val_anom,
                                       val_ds.anomaly)
        eval_val_anom.get_results()
        eval_val.get_results(mean_loss_val, best_loss_val)

        # -- checkpoints (reference policy: train_synthetic.py:302-308) --
        if mean_loss_val <= best_loss_val:
            best_loss_val = mean_loss_val
            ckpt.save("best_loss_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        f1_val = _nanmean(eval_val.F1)
        if f1_val >= best_f1_val:
            best_f1_val = f1_val
            ckpt.save("best_F1_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        ckpt.save("latest", state, epoch, mean_loss_train, mean_loss_val)

        history["train_loss"].append(mean_loss_train)
        history["val_loss"].append(mean_loss_val)
        history["train_f1"].append(_nanmean(eval_train.F1))
        history["val_f1"].append(f1_val)
        history["train_anom_f1"].append(_nanmean(eval_train_anom.F1_pos))
        history["val_anom_f1"].append(_nanmean(eval_val_anom.F1_pos))
        history["steps_per_sec"].append(sps)
        log_string(logger, "steps/sec: %.3f" % sps)

        # Per-epoch atomic flush so a wall-clock kill loses at most the
        # epoch in flight (the queue scripts run under `timeout`); resume
        # seeding + torn-write protection in train/history.py.
        flush_history(cfg.log_dir, history)

        # -- TensorBoard: scalars + last-batch image panels (reference:
        # train_synthetic.py:283-299,310-319) --
        writer.add_scalars("Loss", {"train": mean_loss_train,
                                    "val": mean_loss_val}, epoch + 1)
        writer.add_scalars("F1", {"train": history["train_f1"][-1],
                                  "val": f1_val}, epoch + 1)
        writer.add_scalars("IOU", {"train": _nanmean(eval_train.iou),
                                   "val": _nanmean(eval_val.iou)}, epoch + 1)
        if last_batch is not None:
            _, preds = eval_step_preds(model_variables(state),
                                       init_epoch_metrics(
                                           val_ds.anomaly.shape),
                                       last_batch)
            preds = jax.device_get(preds)
            im_p, im_c, im_t = generate_images_synthetic(
                preds["pred"][:, 0], preds["pred_c"][:, 0],
                np.asarray(last_batch["mask_extreme"]))
            panel = np.concatenate([im_p, im_c, im_t], axis=2)
            writer.add_images("extremes", panel, epoch + 1,
                              dataformats="NHWC")
            im_a = generate_anomaly(preds["anomaly"])
            im_a_gt = generate_anomaly(
                np.asarray(last_batch["mask_anomaly"]))
            im_a = np.concatenate([im_a, im_a_gt], axis=2)
            for v, var in enumerate(cfg.variables):
                writer.add_images(var, im_a[0, v], epoch + 1,
                                  dataformats="HWC")
        writer.flush()

        for ev in (eval_train, eval_val, eval_train_anom, eval_val_anom):
            ev.reset()

    history["state"] = state
    return history
