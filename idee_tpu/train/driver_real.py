# ------------------------------------------------------------------
"""Training / testing drivers for the real-world CERRA and ERA5-Land
pipelines.

Parity targets: reference train_CERRA.py / train_ERA5_Land.py /
test_CERRA.py / test_ERA5_Land.py. Same loop structure as driver.py but:
2-class {normal, drought} evaluator over valid pixels, threshold 0.35, no
driver GT (no anomaly collector -- the real world has no labeled drivers),
best-F1 tracked on the drought class F1 (train_CERRA.py:303-305).
"""
# ------------------------------------------------------------------

import os
from typing import Dict, Optional

import jax
import numpy as np

from idee_tpu.config import Config
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.reanalysis import (ReanalysisDataset, cerra_spec,
                                      era5_land_spec)
from idee_tpu.models import build_model
from idee_tpu.parallel.mesh import batch_sharding, make_mesh
from idee_tpu.train.checkpoint import CheckpointManager, load_pretrained_params
from idee_tpu.train.metrics import Evaluator
from idee_tpu.train.state import (count_parameters, create_train_state,
                                  model_variables)
from idee_tpu.train.steps_real import (init_epoch_metrics_real,
                                       make_eval_step_real,
                                       make_train_step_real)
from idee_tpu.utils.logging import (StepTimer, SummaryWriter, fix_seed,
                                    get_logger, log_string)


def make_reanalysis_dataset(cfg: Config, family: str, years, is_aug: bool,
                            seed: Optional[int] = None) -> ReanalysisDataset:
    if family == "CERRA":
        spec = cerra_spec(cfg.delta_t)
        root_main, root_noaa = cfg.root_CERRA, cfg.root_NOAA_CERRA
    elif family == "ERA5_Land":
        import os

        spec = era5_land_spec(cfg.region, cfg.delta_t)
        root_main = os.path.join(cfg.root_ERA5_Land, cfg.region)
        root_noaa = os.path.join(cfg.root_NOAA, cfg.region)
    else:
        raise ValueError(family)
    if cfg.grid_override:
        spec.grid_height, spec.grid_width = cfg.grid_override
    return ReanalysisDataset(
        spec, root_main, root_noaa, nan_fill=cfg.nan_fill,
        delta_t=cfg.delta_t, is_aug=is_aug, is_shuffle=cfg.is_shuffle,
        is_clima_scale=cfg.is_clima_scale, is_norm=cfg.is_norm,
        variables=list(cfg.variables),
        variables_static=list(cfg.variables_static),
        years=list(years), threshold=cfg.threshold, alpha=cfg.alpha,
        window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max,
        seed=cfg.seed if seed is None else seed,
        cache_root=cfg.cache_root,
    )


def train_real(cfg: Config, family: str, mesh=None,
               train_ds=None, val_ds=None) -> Dict:
    logger = get_logger(cfg)
    # snapshot config even when the caller bypassed the CLI's
    # read_arguments — see train/driver.py
    from idee_tpu.config import save_options
    save_options(cfg)
    fix_seed(cfg.seed)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)  # SURVEY.md 5: sanitizer

    log_string(logger, f"loading {family} training dataset ...")
    if train_ds is None:
        train_ds = make_reanalysis_dataset(cfg, family, cfg.years_train,
                                           cfg.is_aug)
    if val_ds is None:
        val_ds = make_reanalysis_dataset(cfg, family, cfg.years_val, False)
    log_string(logger, "# training samples: %d" % len(train_ds))
    log_string(logger, "# evaluation samples: %d" % len(val_ds))

    if mesh is None and cfg.mesh_shape:
        mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axes))
    if mesh is not None:
        # Pallas kernels are not auto-partitionable; route dispatch to the
        # shardable XLA compositions for mesh programs (kernels/runtime.py)
        from idee_tpu.kernels.runtime import set_gspmd_mesh
        set_gspmd_mesh(mesh)
    if mesh is not None and "space" in tuple(cfg.mesh_axes):
        # height-sharded real-world training (the only way the reference's
        # CERRA 512x832 Swin lineup fits 16 GB parts — BASELINE.md memory
        # fit); window_attention needs the mesh to re-establish the
        # sharding across the window-partition reshape
        from idee_tpu.kernels.runtime import set_spatial_mesh
        from idee_tpu.parallel.mesh import spatial_sharding
        set_spatial_mesh(mesh)
        sharding = spatial_sharding(mesh)["batch"]
    elif mesh is not None:
        sharding = batch_sharding(mesh)
    else:
        sharding = None

    # upload only what the jitted steps consume; x in the compute dtype
    # (host->device bandwidth is a first-order per-step cost)
    import jax.numpy as jnp

    keys = ["x", "mask_extreme", "mask_extreme_loss", "mask_cold_surface",
            "mask_cold_surface_loss"]
    # the val loader also carries the sea / no-vegetation masks that only
    # the epoch-end TensorBoard panels consume (train_CERRA.py:285-291)
    keys_val = keys + ["mask_sea", "mask_no_vegetation"]
    cast = {"x": jnp.bfloat16} if cfg.dtype == "bfloat16" else None
    if cfg.device_data:
        # per-week slabs live on the chip; per-step host traffic = a [B]
        # index vector (see data/device.py RealDeviceLoader -- at the CERRA
        # 512x832 geometry the host path uploads ~82 MB/step)
        from idee_tpu.data.device import RealDeviceLoader

        x_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        train_loader = RealDeviceLoader(train_ds, cfg.batch_size,
                                        shuffle=True, drop_last=True,
                                        seed=cfg.seed, dtype=x_dtype)
        val_loader = RealDeviceLoader(val_ds, cfg.batch_size, shuffle=True,
                                      drop_last=True, seed=cfg.seed,
                                      dtype=x_dtype, with_eval_masks=True)
    else:
        train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                                  drop_last=True, seed=cfg.seed,
                                  sharding=sharding, keys=keys, cast=cast,
                                  workers=cfg.loader_workers)
        val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                                drop_last=True, seed=cfg.seed,
                                sharding=sharding, keys=keys_val, cast=cast,
                                workers=cfg.loader_workers)

    log_string(logger, "\nloading the model ...")
    model = build_model(cfg)
    sample_x = train_ds[0]["x"][None].repeat(cfg.batch_size, 0)
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

    # fused epochs (device-resident data only): one jitted lax.scan per
    # fused_chunk steps -- see train/driver.py for the dispatch-cost
    # rationale; per-step mode remains for profiling and as the opt-out
    use_fused = (cfg.device_data and getattr(cfg, "fused_epoch", True)
                 and not cfg.profile_dir)
    if use_fused:
        from idee_tpu.train.steps_real import (make_eval_epoch_real,
                                               make_train_epoch_real)

        train_epoch = make_train_epoch_real(model, cfg, train_loader)
        eval_epoch = make_eval_epoch_real(model, cfg, val_loader)
    train_step = make_train_step_real(model, cfg)
    eval_step = make_eval_step_real(model, cfg)
    eval_step_preds = make_eval_step_real(model, cfg, return_preds=True)

    eval_train = Evaluator(logger, "Training", cfg)
    eval_val = Evaluator(logger, "Validation", cfg)
    writer = SummaryWriter(cfg.log_dir)

    best_loss_train, best_loss_val, best_f1_val = np.inf, np.inf, 0.0
    from idee_tpu.train.history import flush_history, seed_history
    history = seed_history(cfg.log_dir,
                           ["train_loss", "val_loss", "train_f1", "val_f1",
                            "steps_per_sec"], start_epoch)

    for epoch in range(start_epoch, cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()

        metrics = init_epoch_metrics_real()
        if use_fused:
            import time as _time

            from idee_tpu.train.steps import epoch_chunks

            arrays = train_loader.arrays
            order, ep = train_loader.epoch_order()
            t_ep = _time.perf_counter()
            for sl, start in epoch_chunks(order.shape[0],
                                          getattr(cfg, "fused_chunk", 16)):
                state, metrics = train_epoch(state, metrics, arrays,
                                             order[sl], np.int32(ep),
                                             np.int32(start))
            m = jax.device_get(metrics)  # the only reliable barrier here
            sps = order.shape[0] / (_time.perf_counter() - t_ep)
        else:
            for batch in train_loader:
                state, metrics = train_step(state, metrics, batch)
                timer.tick()
            m = jax.device_get(metrics)
            sps = timer.steps_per_sec
        eval_train.update_counts(m["counts"])
        mean_loss_train = (float(m["loss_sums"]["loss"])
                           / max(int(m["n_steps"]), 1))
        eval_train.get_results(mean_loss_train, best_loss_train)
        best_loss_train = min(best_loss_train, mean_loss_train)

        metrics = init_epoch_metrics_real()
        last_batch = None
        if use_fused:
            from idee_tpu.train.steps import epoch_chunks

            arrays = val_loader.arrays
            order, ep = val_loader.epoch_order()
            for sl, start in epoch_chunks(order.shape[0],
                                          getattr(cfg, "fused_chunk", 16)):
                metrics = eval_epoch(model_variables(state), metrics,
                                     arrays, order[sl], np.int32(ep),
                                     np.int32(start))
            # one extra fetch for the TensorBoard image panels below
            last_batch = val_loader._fetch(
                order[-1], jax.random.fold_in(val_loader._key, ep))
        else:
            for batch in val_loader:
                metrics = eval_step(model_variables(state), metrics, batch)
                last_batch = batch
        m = jax.device_get(metrics)
        eval_val.update_counts(m["counts"])
        mean_loss_val = (float(m["loss_sums"]["loss"])
                         / max(int(m["n_steps"]), 1))
        eval_val.get_results(mean_loss_val, best_loss_val)

        if mean_loss_val <= best_loss_val:
            best_loss_val = mean_loss_val
            ckpt.save("best_loss_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        # best F1 on the drought class (train_CERRA.py:303-305)
        f1_val = float(eval_val.F1[1]) if np.isfinite(eval_val.F1[1]) else 0.0
        if f1_val >= best_f1_val:
            best_f1_val = f1_val
            ckpt.save("best_F1_model", state, epoch, mean_loss_train,
                      mean_loss_val)
        ckpt.save("latest", state, epoch, mean_loss_train, mean_loss_val)

        # TensorBoard scalars (reference: train_CERRA.py:313-315)
        writer.add_scalars("Loss", {"train": mean_loss_train,
                                    "val": mean_loss_val}, epoch + 1)
        writer.add_scalars("IOU", {"train": float(eval_train.iou[1]),
                                   "val": float(eval_val.iou[1])}, epoch + 1)
        writer.add_scalars("F1", {
            "train": float(eval_train.F1[1]),
            "val": f1_val}, epoch + 1)

        # probability / prediction / target panels with sea, no-vegetation
        # and cold-surface overlays, plus per-variable anomaly maps
        # (reference: train_CERRA.py:283-310)
        if last_batch is not None:
            from idee_tpu.utils.vis import generate_anomaly, generate_images

            _, preds = eval_step_preds(model_variables(state),
                                       init_epoch_metrics_real(), last_batch)
            preds = jax.device_get(preds)
            mask_valid = np.clip(
                1.0 - np.asarray(last_batch["mask_cold_surface"]), 0.0, None)
            im_pred, im_pred_c, im_target = generate_images(
                preds["pred"], preds["pred_c"],
                np.asarray(last_batch["mask_extreme"]),
                np.asarray(last_batch["mask_cold_surface"]),
                np.asarray(last_batch["mask_sea"]),
                np.asarray(last_batch["mask_no_vegetation"]),
                mask_valid)
            writer.add_images("probability", im_pred, epoch + 1,
                              dataformats="NHWC")
            writer.add_images("prediction", im_pred_c, epoch + 1,
                              dataformats="NHWC")
            writer.add_images("target", im_target, epoch + 1,
                              dataformats="NHWC")
            im_anom = generate_anomaly(preds["anomaly"])
            for v, var in enumerate(cfg.variables):
                writer.add_images(var, im_anom[0, v], epoch + 1,
                                  dataformats="HWC")
        writer.flush()

        history["train_loss"].append(mean_loss_train)
        history["val_loss"].append(mean_loss_val)
        history["train_f1"].append(float(eval_train.F1[1]))
        history["val_f1"].append(f1_val)
        history["steps_per_sec"].append(sps)
        log_string(logger, "steps/sec: %.3f" % sps)

        # Per-epoch atomic flush so a wall-clock kill loses at most the
        # epoch in flight; resume seeding + torn-write protection in
        # train/history.py (the round-4 CERRA run lost epochs 1-2 to the
        # pre-seeding clobber — VERDICT r4 weak #3).
        flush_history(cfg.log_dir, history)

        eval_train.reset()
        eval_val.reset()

    history["state"] = state
    return history


def test_real(cfg: Config, family: str, params=None, test_ds=None) -> Dict:
    """Test protocol (reference: test_CERRA.py:95-127): valid mask excludes
    sea + cold surface + no-vegetation; threshold 0.35."""
    logger = get_logger(cfg)
    fix_seed(cfg.seed)

    if test_ds is None:
        test_ds = make_reanalysis_dataset(cfg, family, cfg.years_test, False)
    log_string(logger, "# testing samples: %d" % len(test_ds))

    model = build_model(cfg)
    if params is None:
        sample_x = test_ds[0]["x"][None].repeat(cfg.batch_size, 0)
        state = create_train_state(cfg, model, sample_x)
        if cfg.en_de_pretrained:
            state = state.replace(params=load_pretrained_params(
                cfg.en_de_pretrained, state.params))
        else:
            log_string(logger, "WARNING: evaluating a random initialization "
                               "(en_de_pretrained unset)")

    loader = DataLoader(test_ds, cfg.batch_size, shuffle=False,
                        drop_last=True, seed=cfg.seed)
    eval_step = make_eval_step_real(model, cfg, test_mode=True)
    evaluator = Evaluator(logger, "Testing", cfg)

    variables = params if params is not None else model_variables(state)
    metrics = init_epoch_metrics_real()
    for batch in loader:
        metrics = eval_step(variables, metrics, batch)
    m = jax.device_get(metrics)
    evaluator.update_counts(m["counts"])
    evaluator.get_results(0, 0)

    return {
        "drought_f1": float(evaluator.F1[1]),
        "drought_iou": float(evaluator.iou[1]),
        "mean_f1": float(np.nanmean(evaluator.F1)),
        "mean_iou": float(np.nanmean(evaluator.iou)),
    }
