# ------------------------------------------------------------------
"""Learning-rate schedules with timm-equivalent semantics.

The reference steps its scheduler once per epoch via
``lr_scheduler.step_update(epoch)`` (reference: train_synthetic.py:331) with
timm CosineLRScheduler(t_initial=n_epochs, warmup_lr_init=1e-6, warmup_t=2,
warmup_prefix=False, cycle_limit=1) (reference: utils/utils_train.py:156-167).

Here the schedule is a pure function of the optimizer step; the per-epoch
granularity is reproduced by flooring step/steps_per_epoch, which keeps the
whole update jittable.

Reference quirk (documented, not reproduced): timm StepLRScheduler is built
with t_in_epochs=True but driven via step_update(), which makes it a no-op in
the reference -- 'step' here implements the *intended* staircase decay.
"""
# ------------------------------------------------------------------

import jax.numpy as jnp

from idee_tpu.config import Config


def cosine_epoch_lr(epoch, *, base_lr, lr_min, warmup_lr_init, warmup_t,
                    t_initial):
    """timm CosineLRScheduler._get_lr for one cycle, warmup_prefix=False."""
    epoch = jnp.asarray(epoch, jnp.float32)
    warm = warmup_lr_init + epoch * (
        (base_lr - warmup_lr_init) / jnp.maximum(warmup_t, 1)
    )
    cos = lr_min + 0.5 * (base_lr - lr_min) * (
        1.0 + jnp.cos(jnp.pi * epoch / t_initial)
    )
    return jnp.where(epoch < warmup_t, warm, cos)


def step_epoch_lr(epoch, *, base_lr, decay_t, decay_rate, warmup_lr_init,
                  warmup_t):
    epoch = jnp.asarray(epoch, jnp.float32)
    warm = warmup_lr_init + epoch * (
        (base_lr - warmup_lr_init) / jnp.maximum(warmup_t, 1)
    )
    stair = base_lr * decay_rate ** jnp.floor(epoch / decay_t)
    return jnp.where(epoch < warmup_t, warm, stair)


def make_epoch_schedule(cfg: Config, steps_per_epoch: int):
    """Returns optax-compatible schedule fn(step) -> lr, stepped per epoch."""
    spe = max(int(steps_per_epoch), 1)

    if cfg.lr_scheduler == "cosine":
        def fn(step):
            epoch = jnp.floor_divide(step, spe)
            return cosine_epoch_lr(
                epoch, base_lr=cfg.lr, lr_min=cfg.lr_min,
                warmup_lr_init=cfg.lr_warmup, warmup_t=cfg.lr_warmup_epochs,
                t_initial=cfg.n_epochs,
            )
        return fn
    if cfg.lr_scheduler == "step":
        def fn(step):
            epoch = jnp.floor_divide(step, spe)
            return step_epoch_lr(
                epoch, base_lr=cfg.lr, decay_t=cfg.lr_decay_step,
                decay_rate=cfg.lr_decay_rate, warmup_lr_init=cfg.lr_warmup,
                warmup_t=cfg.lr_warmup_epochs,
            )
        return fn
    raise ValueError(
        f"unsupported lr_scheduler {cfg.lr_scheduler!r} (step|cosine)"
    )
