# ------------------------------------------------------------------
"""Jitted train / eval steps for the real-world (CERRA / ERA5-Land)
pipelines.

Parity target: reference train_CERRA.py:166-282 / train_ERA5_Land.py --
masked weighted BCE on the joint + per-variable heads, the real-world
anomaly L1 (cold-surface pixels unconstrained), threshold 0.35 for metrics,
and the 2-class {normal, drought} evaluator over valid pixels
(utils/utils_train.py:175-266). mask_valid in training = 1 - cold_surface
(train_CERRA.py:174-176); at test time sea and no-vegetation pixels are also
excluded (test_CERRA.py:112-113).

Same TPU-first structure as steps.py: all counters accumulate on device,
one host sync per epoch.
"""
# ------------------------------------------------------------------

from typing import Any, Dict

import jax
import jax.numpy as jnp

from idee_tpu import losses
from idee_tpu.config import Config


def drought_counts(pred_c, gt, mask) -> Dict[str, jnp.ndarray]:
    """Per-class counters over valid pixels
    (reference: utils/utils_train.py:246-266). pred_c/gt/mask: [N, H, W]."""
    sel = mask > 0
    per_label = {k: [] for k in ("correct", "seen", "iou_de", "predicted")}
    for label in (0, 1):
        p = (pred_c == label) & sel
        g = (gt == label) & sel
        per_label["correct"].append(jnp.sum((p & g).astype(jnp.int32)))
        per_label["seen"].append(jnp.sum(g.astype(jnp.int32)))
        per_label["iou_de"].append(jnp.sum((p | g).astype(jnp.int32)))
        per_label["predicted"].append(jnp.sum(p.astype(jnp.int32)))
    out = {k: jnp.stack(v) for k, v in per_label.items()}
    out["correct_all"] = jnp.sum(((pred_c == gt) & sel).astype(jnp.int32))
    out["seen_all"] = jnp.sum(sel.astype(jnp.int32))
    return out


def init_epoch_metrics_real() -> Dict[str, Any]:
    return {
        "counts": {
            "correct": jnp.zeros((2,), jnp.int32),
            "seen": jnp.zeros((2,), jnp.int32),
            "iou_de": jnp.zeros((2,), jnp.int32),
            "predicted": jnp.zeros((2,), jnp.int32),
            "correct_all": jnp.zeros((), jnp.int32),
            "seen_all": jnp.zeros((), jnp.int32),
        },
        "loss_sums": {k: jnp.zeros((), jnp.float32) for k in
                      ("loss", "loss_bce", "loss_anomaly", "loss_var",
                       "loss_z_q")},
        "n_steps": jnp.zeros((), jnp.int32),
    }


def total_loss_real(out, batch, lambda_anomaly):
    """Training objective (reference: train_CERRA.py:181-202)."""
    mask_valid = jnp.clip(1.0 - batch["mask_cold_surface"], 0.0, None)
    drought = batch["mask_extreme"]

    loss_bce = losses.bce_loss(out.z[:, 0], drought, mask_valid)
    if getattr(out, "loss_anomaly", None) is not None:
        loss_anom = out.loss_anomaly  # fused in-model path
    else:
        loss_anom = losses.anomaly_l1_loss(
            out.z_q, batch["mask_extreme_loss"],
            batch["mask_cold_surface_loss"], out.vq0)
    loss_var = jnp.sum(jax.vmap(
        lambda yv: losses.bce_loss(yv[:, 0], drought, mask_valid),
        in_axes=1)(out.y))
    loss = loss_bce + lambda_anomaly * loss_anom + loss_var + out.loss_z_q
    return loss, {
        "loss": loss, "loss_bce": loss_bce, "loss_anomaly": loss_anom,
        "loss_var": loss_var, "loss_z_q": out.loss_z_q,
    }, mask_valid


def _accumulate_real(metrics, comps, out, batch, mask_valid,
                     threshold: float = 0.35):
    pred = jax.nn.sigmoid(out.z[:, 0])
    pred_c = (pred > threshold).astype(jnp.float32)  # thr 0.35,
    # train_CERRA.py:212-213
    counts = drought_counts(pred_c, batch["mask_extreme"], mask_valid)
    metrics = dict(metrics)
    metrics["counts"] = jax.tree.map(jnp.add, metrics["counts"], counts)
    metrics["loss_sums"] = {
        k: metrics["loss_sums"][k] + comps[k] for k in metrics["loss_sums"]
    }
    metrics["n_steps"] = metrics["n_steps"] + 1
    return metrics, pred, pred_c


def _train_step_body_real(model, cfg: Config):
    """Unjitted step(state, metrics, batch) -> (state, metrics); jitted
    per-step by make_train_step_real, scanned by make_train_epoch_real."""

    def step(state, metrics, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        d_rng, p_rng, c_rng = jax.random.split(rng, 3)
        extra = state.extra_vars or {}
        has_cb = "codebook" in extra

        def loss_fn(params):
            variables = {"params": params, **extra}
            rngs = {"dropout": d_rng, "droppath": p_rng, "codebook": c_rng}
            kw = dict(train=True, rngs=rngs,
                      mask_extreme_loss=batch["mask_extreme_loss"],
                      mask_exclude=batch["mask_cold_surface_loss"])
            if has_cb:
                out, updated = model.apply(variables, batch["x"],
                                           mutable=["codebook"], **kw)
            else:
                out = model.apply(variables, batch["x"], **kw)
                updated = {}
            loss, comps, mask_valid = total_loss_real(out, batch,
                                                      cfg.lambda_anomaly)
            return loss, (out, comps, mask_valid, updated)

        (loss, (out, comps, mask_valid, updated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if has_cb:
            new_state = new_state.replace(extra_vars={**extra, **updated})
        metrics, _, _ = _accumulate_real(metrics, comps, out, batch,
                                         mask_valid)
        return new_state, metrics

    return step


def make_train_step_real(model, cfg: Config, donate: bool = True):
    step = _train_step_body_real(model, cfg)
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_train_epoch_real(model, cfg: Config, loader):
    """Fused real-world epoch: ONE jitted lax.scan over the epoch's batches
    with the device-resident batch assembly (data/device.py
    RealDeviceLoader) inlined into the scan body -- the real-pipeline
    analogue of steps.py::make_train_epoch (same chunked-dispatch `start`
    contract, see that docstring for the axon-watchdog rationale).

    epoch_fn(state, metrics, arrays, order, epoch, start) -> (state,
    metrics); arrays is loader.arrays (a dict pytree of device arrays)."""
    step = _train_step_body_real(model, cfg)

    def epoch_fn(state, metrics, arrays, order, epoch, start):
        def body(carry, inp):
            b, idx = inp
            batch = loader.traced_batch(arrays, idx, epoch, b)
            return step(*carry, batch), None

        nb = order.shape[0]
        carry, _ = jax.lax.scan(body, (state, metrics),
                                (jnp.arange(nb) + start, order))
        return carry

    return jax.jit(epoch_fn, donate_argnums=(0, 1))


def make_eval_epoch_real(model, cfg: Config, loader):
    """Fused real-world validation epoch (see make_train_epoch_real)."""

    def one(variables, metrics, batch):
        out = model.apply(variables, batch["x"], train=False,
                          mask_extreme_loss=batch["mask_extreme_loss"],
                          mask_exclude=batch["mask_cold_surface_loss"])
        loss, comps, mask_valid = total_loss_real(out, batch,
                                                  cfg.lambda_anomaly)
        metrics, _, _ = _accumulate_real(metrics, comps, out, batch,
                                         mask_valid)
        return metrics

    def epoch_fn(variables, metrics, arrays, order, epoch, start):
        def body(metrics, inp):
            b, idx = inp
            batch = loader.traced_batch(arrays, idx, epoch, b)
            return one(variables, metrics, batch), None

        nb = order.shape[0]
        metrics, _ = jax.lax.scan(body, metrics,
                                  (jnp.arange(nb) + start, order))
        return metrics

    return jax.jit(epoch_fn, donate_argnums=(1,))


def make_eval_step_real(model, cfg: Config, test_mode: bool = False,
                        return_preds: bool = False):
    """test_mode=True uses the test-time valid mask
    1 - sea - cold - no_vegetation (test_CERRA.py:112-113)."""

    def step(params, metrics, batch):
        # accepts bare params or a full variables dict (static-structure check)
        variables = params if "params" in params else {"params": params}
        out = model.apply(variables, batch["x"], train=False,
                          mask_extreme_loss=batch["mask_extreme_loss"],
                          mask_exclude=batch["mask_cold_surface_loss"])
        loss, comps, mask_valid = total_loss_real(out, batch,
                                                  cfg.lambda_anomaly)
        if test_mode:
            mask_valid = jnp.clip(
                1.0 - batch["mask_sea"] - batch["mask_cold_surface"]
                - batch["mask_no_vegetation"], 0.0, None)
        metrics, pred, pred_c = _accumulate_real(metrics, comps, out, batch,
                                                 mask_valid)
        if return_preds:
            return metrics, {"pred": pred, "pred_c": pred_c,
                             "anomaly": out.anomaly}
        return metrics

    return jax.jit(step, donate_argnums=(1,))
