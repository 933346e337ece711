# ------------------------------------------------------------------
"""Jitted train / eval steps with device-resident epoch metrics.

TPU-first restructure of the reference hot loop (train_synthetic.py:170-215):
the reference syncs full tensors to the CPU every step (`.detach().cpu()` at
:209-215) -- on TPU that stalls the pipeline once per step. Here EVERYTHING
accumulates on device across the epoch:

* extreme-evaluator counters (evaluator_synthetic semantics,
  utils/utils_train.py:339-347),
* loss component sums,
* the anomaly majority-vote timeline (anomaly_collector semantics,
  utils/utils_train.py:529-554) as a [V, T, H, W] vote-sum buffer plus a
  [T] coverage counter (the reference's full-shape counter only varies along
  time, so a vector suffices),

and the host syncs ONE metrics pytree per epoch.
"""
# ------------------------------------------------------------------

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu import losses
from idee_tpu.config import Config


def _bce_kwargs(cfg: Config) -> Dict[str, Any]:
    """BCE weighting-variant kwargs from cfg (getattr: configs pickled
    before the fields existed load without them)."""
    return {
        "weighting": getattr(cfg, "bce_weighting", "reference"),
        "weight_cap": getattr(cfg, "bce_weight_cap", 100.0),
        "focal_gamma": getattr(cfg, "bce_focal_gamma", 2.0),
    }


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


def init_epoch_metrics(anomaly_shape: Tuple[int, int, int, int]) -> Dict[str, Any]:
    """Device-resident epoch accumulator. anomaly_shape = [V, T, H, W]
    (the dataset's full timeline)."""
    V, T, H, W = anomaly_shape
    # NOTE: each entry must be a DISTINCT buffer -- the step donates the
    # whole metrics tree and XLA rejects donating one buffer twice
    return {
        "counts": {k: jnp.zeros((), jnp.int32) for k in
                   ("correct", "seen", "iou_de", "predicted", "seen_all")},
        "loss_sums": {k: jnp.zeros((), jnp.float32) for k in
                      ("loss", "loss_bce", "loss_anomaly", "loss_var",
                       "loss_z_q")},
        "n_steps": jnp.zeros((), jnp.int32),
        # vote sums fit uint8: each timeline slot is covered by at most
        # delta_t windows per epoch, and delta_t << 255
        "vote_sum": jnp.zeros((V, T, H, W), jnp.uint8),
        "vote_cnt": jnp.zeros((T,), jnp.int32),
    }


def _scatter_votes(vote_sum, vote_cnt, anomaly, t_index, delta_t: int):
    """Scatter each sample's time-reversed [V, dt, H, W] anomaly bits onto
    the absolute timeline at [t_index - dt + 1, t_index]
    (anomaly_collector.__call__ semantics, utils/utils_train.py:547-554)."""
    N = anomaly.shape[0]
    V, T, H, W = vote_sum.shape
    # each timeline slot is covered by at most delta_t windows per epoch
    # (one per window that overlaps it), so uint8 vote sums cannot wrap
    assert delta_t <= 255, "uint8 vote_sum would overflow; widen the dtype"

    def body(i, carry):
        vs, vc = carry
        a = jnp.flip(anomaly[i], axis=1).astype(vs.dtype)  # chronological
        start = t_index[i] - (delta_t - 1)
        cur = jax.lax.dynamic_slice(vs, (0, start, 0, 0), (V, delta_t, H, W))
        vs = jax.lax.dynamic_update_slice(vs, cur + a, (0, start, 0, 0))
        cc = jax.lax.dynamic_slice(vc, (start,), (delta_t,))
        vc = jax.lax.dynamic_update_slice(vc, cc + 1, (start,))
        return vs, vc

    return jax.lax.fori_loop(0, N, body, (vote_sum, vote_cnt))


def _accumulate(metrics, comps, out, batch, t0: float, delta_t: int,
                threshold: float = 0.5):
    pred = jax.nn.sigmoid(out.z)
    pred_c = (pred > threshold).astype(jnp.float32)
    target = batch["mask_extreme"][:, None]

    counts = extreme_counts(pred_c, target)
    metrics = dict(metrics)
    metrics["counts"] = jax.tree.map(jnp.add, metrics["counts"], counts)
    metrics["loss_sums"] = {
        k: metrics["loss_sums"][k] + comps[k] for k in metrics["loss_sums"]
    }
    metrics["n_steps"] = metrics["n_steps"] + 1

    t_index = (batch["timestep"][:, 0] - t0).astype(jnp.int32)
    vs, vc = _scatter_votes(metrics["vote_sum"], metrics["vote_cnt"],
                            out.anomaly, t_index, delta_t)
    metrics["vote_sum"], metrics["vote_cnt"] = vs, vc
    return metrics, pred, pred_c


def _train_step_body(model, cfg: Config, t0: float = 0.0,
                     steps_per_epoch: int = 0):
    """Unjitted step(state, metrics, batch) -> (state, metrics); jitted
    per-step by make_train_step, scanned per-epoch by make_train_epoch."""
    warm = getattr(cfg, "anomaly_warmup_epochs", 0) * steps_per_epoch
    ramp = max(getattr(cfg, "anomaly_ramp_epochs", 0) * steps_per_epoch, 1)
    use_ramp = warm > 0 or getattr(cfg, "anomaly_ramp_epochs", 0) > 0

    def step(state, metrics, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        d_rng, p_rng, c_rng = jax.random.split(rng, 3)
        extra = state.extra_vars or {}
        # stateful quantizers (VQ-EMA, Random_VQ) thread their "codebook"
        # collection through the step (the functional analogue of the
        # reference's in-place buffer updates, VQ.py:524-548)
        has_cb = "codebook" in extra

        def loss_fn(params):
            variables = {"params": params, **extra}
            rngs = {"dropout": d_rng, "droppath": p_rng, "codebook": c_rng}
            # the mask rides into the model so the anomaly L1 can fuse with
            # the quantizer (z_q never materializes on the LFQ path)
            kw = dict(train=True, rngs=rngs,
                      mask_extreme_loss=batch["mask_extreme_loss"])
            if has_cb:
                out, updated = model.apply(variables, batch["x"],
                                           mutable=["codebook"], **kw)
            else:
                out = model.apply(variables, batch["x"], **kw)
                updated = {}
            lam = cfg.lambda_anomaly
            if use_ramp:
                lam = lam * jnp.clip(
                    (state.step - warm) / ramp, 0.0, 1.0)
            loss, comps = losses.total_loss_synthetic(
                out, batch["mask_extreme"], batch["mask_extreme_loss"],
                lam, **_bce_kwargs(cfg),
            )
            return loss, (out, comps, updated)

        (loss, (out, comps, updated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if has_cb:
            new_state = new_state.replace(extra_vars={**extra, **updated})
        metrics, _, _ = _accumulate(metrics, comps, out, batch, t0,
                                    cfg.delta_t)
        return new_state, metrics

    return step


def make_train_step(model, cfg: Config, t0: float = 0.0, donate: bool = True,
                    steps_per_epoch: int = 0):
    """Returns jitted step(state, metrics, batch) -> (state, metrics).

    t0: absolute timestep of the dataset's first timeline slot
    (dataset.timestep[0]). steps_per_epoch enables the anomaly-L1
    curriculum (cfg.anomaly_warmup_epochs / anomaly_ramp_epochs)."""
    step = _train_step_body(model, cfg, t0, steps_per_epoch)
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_train_epoch(model, cfg: Config, loader, t0: float = 0.0,
                     steps_per_epoch: int = 0):
    """Fused epoch: ONE jitted lax.scan over the epoch's batches, with the
    device-resident batch fetch (data/device.py) inlined into the scan body.

    The reference dispatches every optimizer step from Python
    (train_synthetic.py:170-215); over a remote-TPU transport each dispatch
    costs ~2x the step's compute (measured: 135 ms wall vs 43 ms compute
    for CNN_3D at the bench geometry, scripts/profile_step.py). Scanning
    the epoch on device leaves ONE dispatch + ONE metrics fetch per epoch.

    Returns epoch_fn(state, metrics, dyn, ext, anom, order, epoch, start)
    -> (state, metrics); order is the loader's [nb, B] int32 index matrix
    and epoch the (1-based) epoch number driving the per-batch rng fold,
    both from loader.epoch_order(). `start` is the in-epoch position of
    order's first row: the axon TPU worker KILLS programs that execute
    longer than ~30-60 s (observed: a 27 s dispatch survives, a 67 s one
    crashes the worker), so the driver slices the epoch into
    cfg.fused_chunk-step dispatches — passing the running offset keeps the
    per-batch rng fold (epoch, position) identical to the unchunked scan,
    which keeps the fused==per-step equality tests exact.
    """
    step = _train_step_body(model, cfg, t0, steps_per_epoch)

    def epoch_fn(state, metrics, dyn, ext, anom, order, epoch, start):
        def body(carry, inp):
            b, idx = inp
            batch = loader.traced_batch(dyn, ext, anom, idx, epoch, b)
            return step(*carry, batch), None

        nb = order.shape[0]
        carry, _ = jax.lax.scan(body, (state, metrics),
                                (jnp.arange(nb) + start, order))
        return carry

    return jax.jit(epoch_fn, donate_argnums=(0, 1))


def epoch_chunks(nb: int, chunk: int):
    """Yield (slice, start) pairs covering an nb-step epoch in bounded
    dispatches of at most `chunk` steps (chunk<=0 means one dispatch).

    Rationale: one dispatch per epoch is the round-2 design, but the axon
    TPU worker kills programs that execute longer than ~30-60 s (observed:
    a 27 s dispatch survives, a 67 s one crashes the worker and wedges the
    chip), which a real epoch (hundreds of steps x 100-500 ms) always
    exceeds. Callers pass each start offset into the epoch_fn so the
    chunked composition reproduces the unchunked scan's rng folds exactly.
    The remainder chunk leads, so its (smaller) program compiles first and
    every later dispatch reuses the single full-chunk executable.
    """
    chunk = int(chunk) if chunk and chunk > 0 else nb
    rem = nb % chunk
    pos = 0
    if rem and nb > chunk:
        yield slice(0, rem), 0
        pos = rem
    while pos < nb:
        n = min(chunk, nb - pos)
        yield slice(pos, pos + n), pos
        pos += n


def make_eval_step(model, cfg: Config, t0: float = 0.0,
                   return_preds: bool = False):
    """Jitted eval step(params, metrics, batch) -> metrics [, preds]
    (reference validation loop, train_synthetic.py:235-282)."""

    def step(params, metrics, batch):
        # accepts either bare params or a full variables dict (with extra
        # collections such as "codebook"); the check is on the static pytree
        # structure, so it resolves at trace time
        variables = params if "params" in params else {"params": params}
        out = model.apply(variables, batch["x"], train=False,
                          mask_extreme_loss=batch["mask_extreme_loss"])
        loss, comps = losses.total_loss_synthetic(
            out, batch["mask_extreme"], batch["mask_extreme_loss"],
            cfg.lambda_anomaly, **_bce_kwargs(cfg),
        )
        metrics, pred, pred_c = _accumulate(metrics, comps, out, batch, t0,
                                            cfg.delta_t)
        if return_preds:
            return metrics, {"pred": pred, "pred_c": pred_c,
                             "anomaly": out.anomaly}
        return metrics

    return jax.jit(step, donate_argnums=(1,))


def make_eval_epoch(model, cfg: Config, loader, t0: float = 0.0):
    """Fused validation epoch (see make_train_epoch): one jitted scan over
    the val batches, params held constant across the scan.

    Returns epoch_fn(variables, metrics, dyn, ext, anom, order, epoch,
    start) -> metrics; see make_train_epoch for the chunked-dispatch
    `start` contract."""

    def one(variables, metrics, batch):
        out = model.apply(variables, batch["x"], train=False,
                          mask_extreme_loss=batch["mask_extreme_loss"])
        loss, comps = losses.total_loss_synthetic(
            out, batch["mask_extreme"], batch["mask_extreme_loss"],
            cfg.lambda_anomaly, **_bce_kwargs(cfg),
        )
        metrics, _, _ = _accumulate(metrics, comps, out, batch, t0,
                                    cfg.delta_t)
        return metrics

    def epoch_fn(variables, metrics, dyn, ext, anom, order, epoch, start):
        def body(metrics, inp):
            b, idx = inp
            batch = loader.traced_batch(dyn, ext, anom, idx, epoch, b)
            return one(variables, metrics, batch), None

        nb = order.shape[0]
        metrics, _ = jax.lax.scan(body, metrics,
                                  (jnp.arange(nb) + start, order))
        return metrics

    return jax.jit(epoch_fn, donate_argnums=(1,))
