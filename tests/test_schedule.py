"""LR schedule: timm CosineLRScheduler-equivalent values."""

import numpy as np

from idee_tpu.config import synthetic_config
from idee_tpu.train.schedule import make_epoch_schedule


def test_cosine_schedule_values():
    cfg = synthetic_config(lr=1e-3, lr_min=1e-5, lr_warmup=1e-6,
                           lr_warmup_epochs=2, n_epochs=100,
                           lr_scheduler="cosine")
    fn = make_epoch_schedule(cfg, steps_per_epoch=10)

    # epoch 0: warmup_lr_init
    np.testing.assert_allclose(float(fn(0)), 1e-6, rtol=1e-6)
    # epoch 1: warmup_init + (base - init)/2
    np.testing.assert_allclose(float(fn(10)), 1e-6 + (1e-3 - 1e-6) / 2,
                               rtol=1e-6)
    # epoch 2: cosine at t=2
    expected = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * 2 / 100))
    np.testing.assert_allclose(float(fn(20)), expected, rtol=1e-6)
    # epoch 100: lr_min
    expected = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi))
    np.testing.assert_allclose(float(fn(1000)), expected, rtol=1e-6)
    # constant within an epoch
    assert float(fn(25)) == float(fn(29))


def test_step_schedule_values():
    cfg = synthetic_config(lr=1e-3, lr_decay_step=20, lr_decay_rate=0.9,
                           lr_warmup=1e-6, lr_warmup_epochs=2,
                           lr_scheduler="step", n_epochs=100)
    fn = make_epoch_schedule(cfg, steps_per_epoch=1)
    np.testing.assert_allclose(float(fn(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(fn(25)), 1e-3 * 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(fn(45)), 1e-3 * 0.81, rtol=1e-5)


def test_optimizer_groups_mask():
    """minGPT decay split: biases/norm scales/rel-pos tables exempt
    (reference: utils/utils_train.py:73-124)."""
    import jax
    import jax.numpy as jnp

    from idee_tpu.config import synthetic_config
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state, decay_mask

    cfg = synthetic_config(
        in_channels_dynamic=2, variables=["var_01", "var_02"],
        encoder="Swin_3D", x_max=8, y_max=8, en_embed_dim=[4, 4],
        en_depths=[1, 1], en_n_heads=[2, 2], codebook_dim=4, cls_dim=4,
        use_optimizer_groups=True)
    model = build_model(cfg)
    import numpy as np

    x = np.zeros((1, 2, 1, 8, 8, 8), np.float32)
    state = create_train_state(cfg, model, x)
    mask = decay_mask(state.params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    by_name = {jax.tree_util.keystr(p): v for p, v in flat}
    kernels = [v for p, v in by_name.items() if p.endswith("['kernel']")]
    biases = [v for p, v in by_name.items() if p.endswith("['bias']")]
    tables = [v for p, v in by_name.items()
              if "relative_position_bias_table" in p]
    assert all(kernels) and kernels
    assert not any(biases) and biases
    assert not any(tables) and tables
