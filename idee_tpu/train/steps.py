# ------------------------------------------------------------------
"""Jitted train / eval steps.

TPU-first restructure of the reference hot loop (train_synthetic.py:170-215):
the forward, loss, backward, optimizer update, sigmoid-threshold and the
extreme-evaluator *counter updates* all run on device inside one jit; only
tiny counter vectors and the [N,V,T,H,W] anomaly bits return to the host
(the reference syncs full tensors to CPU every step at :209-215).
"""
# ------------------------------------------------------------------

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from idee_tpu import losses
from idee_tpu.config import Config


def extreme_counts(pred_c, gt) -> Dict[str, jnp.ndarray]:
    """Streaming counters for evaluator_synthetic
    (reference: utils/utils_train.py:339-347). pred_c/gt: [N, 1, H, W]."""
    pred1 = pred_c == 1
    gt1 = gt == 1
    return {
        "correct": jnp.sum((pred1 & gt1).astype(jnp.int32)),
        "seen": jnp.sum(gt1.astype(jnp.int32)),
        "iou_de": jnp.sum((pred1 | gt1).astype(jnp.int32)),
        "predicted": jnp.sum(pred1.astype(jnp.int32)),
        "seen_all": jnp.asarray(gt.size, jnp.int32),
    }


def make_train_step(model, cfg: Config, tx=None, donate: bool = True):
    """Returns jitted train_step(state, batch) -> (state, logs, host_outs)."""

    def step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        d_rng, p_rng = jax.random.split(rng)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch["x"], train=True,
                rngs={"dropout": d_rng, "droppath": p_rng},
            )
            loss, comps = losses.total_loss_synthetic(
                out, batch["mask_extreme"], batch["mask_extreme_loss"],
                cfg.lambda_anomaly,
            )
            return loss, (out, comps)

        (loss, (out, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)

        pred = jax.nn.sigmoid(out.z)
        pred_c = (pred > 0.5).astype(jnp.float32)  # thr 0.5, train_synthetic.py:211
        target = batch["mask_extreme"][:, None]
        logs = dict(comps)
        logs["counts"] = extreme_counts(pred_c, target)
        host = {"anomaly": out.anomaly, "timestep": batch["timestep"]}
        return new_state, logs, host

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: Config):
    """Jitted eval step (reference validation loop, train_synthetic.py:235-282)."""

    def step(params, batch):
        out = model.apply({"params": params}, batch["x"], train=False)
        # eval-time loss: quantizer aux is 0 in eval (reference LFQ returns
        # dummy zero when not training, models/codebook/LFQ.py:264-266)
        loss, comps = losses.total_loss_synthetic(
            out, batch["mask_extreme"], batch["mask_extreme_loss"],
            cfg.lambda_anomaly,
        )
        pred = jax.nn.sigmoid(out.z)
        pred_c = (pred > 0.5).astype(jnp.float32)
        target = batch["mask_extreme"][:, None]
        logs = dict(comps)
        logs["counts"] = extreme_counts(pred_c, target)
        host = {
            "anomaly": out.anomaly,
            "timestep": batch["timestep"],
            "pred": pred,
            "pred_c": pred_c,
        }
        return logs, host

    return jax.jit(step)
