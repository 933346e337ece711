# ------------------------------------------------------------------
"""SimpleNet train / test drivers for the synthetic benchmark.

Parity targets: Baselines_OneClass/train_simplenet_synthetic.py and
test_simplenet_synthetic.py. Training data is the anomaly-REPLACED cube
(extreme pixels overwritten by climatology draws, is_replace_anomaly);
the backbone encoder is frozen (stop_gradient); validation/test threshold
each variable at median(normal-pixel scores) - 0.001 and score the
resulting anomaly map with the majority-vote driver evaluator
(train_simplenet_synthetic.py:221-247, test_simplenet_synthetic.py:116-127).
"""
# ------------------------------------------------------------------

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.baselines.config import OneClassConfig
from idee_tpu.baselines.oneclass.simplenet import SimpleNet, simple_loss
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.models.vq_model import build_encoder
from idee_tpu.nn.layers import trunc_normal_init
from idee_tpu.train.checkpoint import (CheckpointManager,
                                       load_pretrained_params)
from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                    majority_vote_from_device)
from idee_tpu.train.state import (count_parameters, create_train_state,
                                  model_variables)
from idee_tpu.train.steps import _scatter_votes
from idee_tpu.utils.logging import StepTimer, fix_seed, get_logger, log_string


class Backbone(nn.Module):
    """Frozen feature extractor: the shared encoder only (reference:
    Baselines_OneClass/models/build_simplenet.py:86-183 -- pretrained
    VQ-model weights with cls/vq/classifier keys stripped)."""

    config: OneClassConfig

    def setup(self):
        cfg = self.config
        # no init sweep here: the encoder keeps its own trunc_normal init
        # (Backbone._init_weights only loads checkpoints,
        # build_simplenet.py:146-163)
        self.encoder = build_encoder(cfg, trunc_normal_init(0.02),
                                     jnp.dtype(cfg.dtype))

    def __call__(self, x_d, *, train: bool = False):
        return self.encoder(x_d, train=train)


def load_backbone_params(path: str, target_params):
    """Extract the encoder subtree from a core VQ-model checkpoint
    (the reference's filtered non-strict load, build_simplenet.py:149-163)."""
    full = load_pretrained_params(path, None)
    if "encoder" in full:
        return {"encoder": full["encoder"]}
    return full


# ------------------------------------------------------------------


def _val_anomaly(z_n_scores, mask):
    """Per-variable median thresholding -> anomaly bits
    (reference: test_simplenet_synthetic.py:116-127).

    z_n_scores [B, V, T, H, W]; mask [B, H, W] (extremes). Returns
    (anomaly uint8 [B,V,T,H,W], signed +-1 scores for the eval loss)."""
    B, V, T, H, W = z_n_scores.shape
    normal_sel = (mask[:, None, None] == 0)
    masked = jnp.where(jnp.broadcast_to(normal_sel, z_n_scores.shape),
                       z_n_scores, jnp.nan)
    thr = jnp.nanmedian(masked.transpose(1, 0, 2, 3, 4).reshape(V, -1),
                        axis=1) - 0.001  # [V]
    thr = thr[None, :, None, None, None]
    signed = jnp.where(z_n_scores >= thr, 1.0, -1.0)
    anomaly = (signed < 0).astype(jnp.uint8)
    return anomaly, signed


def init_oc_metrics(anomaly_shape):
    V, T, H, W = anomaly_shape
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "n_steps": jnp.zeros((), jnp.int32),
        "vote_sum": jnp.zeros((V, T, H, W), jnp.uint8),
        "vote_cnt": jnp.zeros((T,), jnp.int32),
    }


def make_oc_train_step(backbone, model, cfg: OneClassConfig, bb_variables,
                       donate: bool = True):
    def step(state, metrics, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        extra = state.extra_vars or {}
        mutable = [c for c in ("batch_stats",) if c in extra]

        z = jax.lax.stop_gradient(
            backbone.apply(bb_variables, batch["x"], train=False))

        def loss_fn(params):
            variables = {"params": params, **extra}
            rngs = {"noise": rng, "dropout": rng}
            if mutable:
                out, upd = model.apply(variables, z, train=True, rngs=rngs,
                                       mutable=mutable)
            else:
                out = model.apply(variables, z, train=True, rngs=rngs)
                upd = {}
            loss = simple_loss(out.z_n_scores, out.z_p_scores,
                               cfg.th_n, cfg.th_p, train=True)
            return loss, upd

        (loss, upd), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if mutable:
            new_state = new_state.replace(extra_vars={**extra, **upd})
        metrics = dict(metrics)
        metrics["loss_sum"] = metrics["loss_sum"] + loss
        metrics["n_steps"] = metrics["n_steps"] + 1
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_oc_eval_step(backbone, model, cfg: OneClassConfig, bb_variables,
                      t0: float):
    def step(variables, metrics, batch):
        z = backbone.apply(bb_variables, batch["x"], train=False)
        out = model.apply(variables, z, train=False)
        scores = out.z_n_scores[..., 0]  # [B, V, T, H, W]
        anomaly, signed = _val_anomaly(scores, batch["mask_extreme_loss"])
        # eval loss on the signed maps split by the extreme mask
        # (train_simplenet_synthetic.py:237-241)
        m = batch["mask_extreme_loss"][:, None, None]
        sel_n = jnp.broadcast_to(m == 0, signed.shape)
        sel_p = jnp.broadcast_to(m == 1, signed.shape)
        tl = jnp.clip(cfg.th_n - signed, 0.0, None) * sel_n
        fl = jnp.clip(signed + cfg.th_p, 0.0, None) * sel_p
        denom = jnp.maximum(sel_n.sum() + sel_p.sum(), 1)
        loss = (tl.sum() + fl.sum()) / denom

        metrics = dict(metrics)
        metrics["loss_sum"] = metrics["loss_sum"] + loss
        metrics["n_steps"] = metrics["n_steps"] + 1
        t_index = (batch["timestep"][:, 0] - t0).astype(jnp.int32)
        vs, vc = _scatter_votes(metrics["vote_sum"], metrics["vote_cnt"],
                                anomaly, t_index, cfg.delta_t)
        metrics["vote_sum"], metrics["vote_cnt"] = vs, vc
        return metrics

    return jax.jit(step, donate_argnums=(1,))


# ------------------------------------------------------------------


def _nanmean(a):
    a = np.asarray(a, float)
    m = ~np.isnan(a)
    return float(a[m].mean()) if m.any() else float("nan")


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


def train_simplenet_synthetic(cfg: OneClassConfig,
                              train_cube: Optional[SyntheticCube] = None,
                              val_cube: Optional[SyntheticCube] = None
                              ) -> Dict:
    logger = get_logger(cfg)
    fix_seed(cfg.seed)
    train_ds, val_ds = _datasets(cfg, train_cube, val_cube)
    log_string(logger, "# training samples: %d" % len(train_ds))

    keys = ["x", "mask_extreme_loss", "timestep"]
    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed, keys=keys)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=True,
                            drop_last=True, seed=cfg.seed, keys=keys)

    backbone = Backbone(config=cfg)
    model = SimpleNet(config=cfg)
    sample_x = jnp.asarray(train_ds[0]["x"][None].repeat(cfg.batch_size, 0))
    bb_variables = backbone.init(
        {"params": jax.random.PRNGKey(cfg.seed)}, sample_x, train=False)
    if cfg.model_pretrained:
        bb_variables = dict(bb_variables)
        bb_variables["params"] = load_backbone_params(
            cfg.model_pretrained, bb_variables["params"])
    else:
        log_string(logger, "WARNING: frozen backbone is randomly "
                            "initialized (model_pretrained unset)")

    z0 = backbone.apply(bb_variables, sample_x, train=False)
    state = create_train_state(cfg, model, z0,
                               steps_per_epoch=len(train_loader))
    log_string(logger, "all parameters: %d\n" % count_parameters(state.params))

    ckpt = CheckpointManager(cfg.log_dir)
    train_step = make_oc_train_step(backbone, model, cfg, bb_variables)
    eval_step = make_oc_eval_step(backbone, model, cfg, bb_variables,
                                  t0=float(val_ds.timestep[0]))
    eval_val = EvaluatorAnomalySynthetic(logger, "Validation", cfg.variables)

    best_loss_val = np.inf
    history = {"train_loss": [], "val_loss": [], "val_anom_f1": [],
               "steps_per_sec": []}

    for epoch in range(cfg.n_epochs):
        log_string(logger, "################# Epoch (%s/%s) #################"
                   % (epoch + 1, cfg.n_epochs))
        timer = StepTimer()
        metrics = init_oc_metrics(train_ds.anomaly.shape)
        for batch in train_loader:
            state, metrics = train_step(state, metrics, batch)
            timer.tick()
        m = jax.device_get(metrics)
        mean_loss_train = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        log_string(logger, "%s mean loss     : %.8f" % ("Training",
                                                        mean_loss_train))

        metrics = init_oc_metrics(val_ds.anomaly.shape)
        for batch in val_loader:
            metrics = eval_step(model_variables(state), metrics, batch)
        m = jax.device_get(metrics)
        mean_loss_val = float(m["loss_sum"]) / max(int(m["n_steps"]), 1)
        anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
        eval_val(np.swapaxes(anomaly, 0, 1),
                 np.swapaxes(val_ds.anomaly, 0, 1))
        eval_val.get_results()
        log_string(logger, "%s mean loss     : %.8f" % ("Validation",
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
    history["bb_variables"] = bb_variables
    return history


def test_simplenet_synthetic(cfg: OneClassConfig,
                             cube: Optional[SyntheticCube] = None,
                             params=None, bb_variables=None) -> Dict:
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

    backbone = Backbone(config=cfg)
    model = SimpleNet(config=cfg)
    sample_x = jnp.asarray(ds[0]["x"][None].repeat(cfg.batch_size, 0))
    if bb_variables is None:
        bb_variables = backbone.init(
            {"params": jax.random.PRNGKey(cfg.seed)}, sample_x, train=False)
        if cfg.model_pretrained:
            bb_variables = dict(bb_variables)
            bb_variables["params"] = load_backbone_params(
                cfg.model_pretrained, bb_variables["params"])
    if params is None:
        z0 = backbone.apply(bb_variables, sample_x, train=False)
        state = create_train_state(cfg, model, z0)
        if cfg.en_de_pretrained:
            state = state.replace(params=load_pretrained_params(
                cfg.en_de_pretrained, state.params))
        variables = model_variables(state)
    else:
        variables = params if "params" in params else {"params": params}

    loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=True,
                        seed=cfg.seed)
    eval_step = make_oc_eval_step(backbone, model, cfg, bb_variables,
                                  t0=float(ds.timestep[0]))
    evaluator = EvaluatorAnomalySynthetic(logger, "Testing", cfg.variables)

    metrics = init_oc_metrics(ds.anomaly.shape)
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
