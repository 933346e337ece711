# ------------------------------------------------------------------
"""Train state + optimizer factory.

Optimizer parity: the reference uses torch.optim.Adam(lr, weight_decay,
betas) (reference: train_synthetic.py:127-129). torch Adam folds
weight_decay into the gradient *before* the moment updates (classic L2, not
AdamW), which in optax is add_decayed_weights -> scale_by_adam -> lr.
"""
# ------------------------------------------------------------------

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from idee_tpu.config import Config
from idee_tpu.train.schedule import make_epoch_schedule


class TrainState(train_state.TrainState):
    """apply_fn/params/tx/opt_state/step; rng for dropout/droppath.

    extra_vars holds non-trainable variable collections -- notably the VQ
    "codebook" collection (EMA embed/cluster stats, frozen random
    projections). Empty dict for the default LFQ path.
    """

    rng: Any = None
    extra_vars: Any = None


def decay_mask(params) -> Any:
    """minGPT-style decay / no-decay split (reference:
    utils/utils_train.py:73-124 -- defined there but commented out in the
    shipped drivers, train_synthetic.py:124-125): biases, norm affine
    parameters (scale/bias/LayerNorm g,b), relative-position-bias tables,
    and embeddings are exempt from weight decay; everything else decays.

    Returns a bool pytree matching ``params`` (True = decay)."""

    no_decay_names = {"bias", "scale", "g", "b",
                      "relative_position_bias_table", "learned_embed",
                      "row_embed", "col_embed", "A_log", "D",
                      "values_per_latent"}

    def walk(tree, out):
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = {}
                walk(v, out[k])
            else:
                out[k] = k not in no_decay_names
        return out

    return walk(params, {})


def make_optimizer(cfg: Config, steps_per_epoch: int,
                   params=None) -> optax.GradientTransformation:
    """torch Adam folds weight_decay into the gradient before the moment
    updates; AdamW decays after. ``params`` enables the optional minGPT
    decay-group split (cfg.use_optimizer_groups)."""
    schedule = make_epoch_schedule(cfg, steps_per_epoch)
    use_groups = getattr(cfg, "use_optimizer_groups", False) and (
        params is not None)
    decay = (optax.add_decayed_weights(cfg.weight_decay,
                                       mask=decay_mask(params))
             if use_groups else
             optax.add_decayed_weights(cfg.weight_decay))
    if cfg.optimizer == "Adam":
        parts = [
            decay,
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8),
        ]
    elif cfg.optimizer == "AdamW":
        parts = [
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8),
            decay,
        ]
    else:
        raise ValueError(
            f"Unexpected optimizer {cfg.optimizer}; supported: Adam, AdamW"
        )
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def create_train_state(cfg: Config, model, sample_x, rng=None,
                       steps_per_epoch: int = 1) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    p_rng, s_rng = jax.random.split(rng)

    # jit the init: eager flax init dispatches thousands of tiny ops, which
    # is pathologically slow on remote-dispatch TPU backends
    @jax.jit
    def _init(rngs, x):
        return model.init(rngs, x, train=False)

    variables = _init(
        {"params": p_rng, "dropout": p_rng, "droppath": p_rng},
        jnp.asarray(sample_x),
    )
    tx = make_optimizer(cfg, steps_per_epoch, params=variables["params"])
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, rng=s_rng,
        extra_vars=extra,
    )


def model_variables(state) -> dict:
    """Full variables dict ({"params", ...extra collections}) for apply."""
    extra = getattr(state, "extra_vars", None) or {}
    return {"params": state.params, **extra}


def count_parameters(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
