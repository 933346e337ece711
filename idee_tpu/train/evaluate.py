# ------------------------------------------------------------------
"""Test/evaluation driver for the synthetic benchmark.

Parity target: reference test_synthetic.py:27-129 -- no-grad loop over the
test split, sigmoid > 0.5 thresholding, evaluator_synthetic + majority-vote
driver scoring vs the GT anomaly cube.
"""
# ------------------------------------------------------------------

from typing import Dict, Optional

import jax
import numpy as np

from idee_tpu.config import Config
from idee_tpu.data.loader import DataLoader
from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset
from idee_tpu.models import build_model
from idee_tpu.train.checkpoint import load_pretrained_params
from idee_tpu.train.metrics import (EvaluatorAnomalySynthetic,
                                    EvaluatorSynthetic,
                                    majority_vote_from_device)
from idee_tpu.train.state import create_train_state, model_variables
from idee_tpu.train.steps import init_epoch_metrics, make_eval_step
from idee_tpu.utils.logging import fix_seed, get_logger, log_string


def test_synthetic(cfg: Config, cube: Optional[SyntheticCube] = None,
                   params=None) -> Dict:
    logger = get_logger(cfg)
    fix_seed(cfg.seed)

    log_string(logger, "loading testing dataset ...")
    ds = SyntheticDataset(
        cube=cube, root_datacube=None if cube is not None else cfg.root_synthetic,
        times=cfg.times_test, is_aug=False, is_norm=cfg.is_norm,
        is_clima_scale=cfg.is_clima_scale,
        variables=list(cfg.variables),
        variables_static=list(cfg.variables_static),
        delta_t=cfg.delta_t, window_size=cfg.window_size,
        x_min=cfg.x_min, x_max=cfg.x_max, y_min=cfg.y_min, y_max=cfg.y_max,
    )
    log_string(logger, "# testing samples: %d" % len(ds))

    model = build_model(cfg)
    if params is None:
        sample_x = ds[0]["x"][None].repeat(cfg.batch_size, 0)
        state = create_train_state(cfg, model, sample_x)
        if cfg.en_de_pretrained:
            state = state.replace(params=load_pretrained_params(
                cfg.en_de_pretrained, state.params))
        else:
            log_string(logger, "WARNING: no pretrained model "
                                "(en_de_pretrained unset); evaluating a "
                                "random initialization")

    loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=True,
                        seed=cfg.seed)
    eval_step = make_eval_step(model, cfg, t0=float(ds.timestep[0]))

    evaluator = EvaluatorSynthetic(logger, "Testing")
    eval_anom = EvaluatorAnomalySynthetic(logger, "Testing", cfg.variables)

    variables = params if params is not None else model_variables(state)
    metrics = init_epoch_metrics(ds.anomaly.shape)
    for batch in loader:
        metrics = eval_step(variables, metrics, batch)
    m = jax.device_get(metrics)

    evaluator.update_counts(m["counts"])
    anomaly = majority_vote_from_device(m["vote_sum"], m["vote_cnt"])
    eval_anom(np.swapaxes(anomaly, 0, 1), np.swapaxes(ds.anomaly, 0, 1))
    eval_anom.get_results()
    n = max(int(m["n_steps"]), 1)
    loss_sum = float(m["loss_sums"]["loss"])
    evaluator.get_results(loss_sum / n, np.nan)

    return {
        "extreme_f1": float(np.nanmean(evaluator.F1)),
        "extreme_iou": float(np.nanmean(evaluator.iou)),
        "driver_f1_pos": float(np.nanmean(eval_anom.F1_pos)),
        "driver_iou_pos": float(np.nanmean(eval_anom.iou_pos)),
        "mean_loss": loss_sum / max(n, 1),
    }
