# ------------------------------------------------------------------
"""SimpleNet (https://arxiv.org/abs/2303.15140) one-class head.

Parity target: Baselines_OneClass/models/build_simplenet.py. A FROZEN
pretrained encoder produces features; SimpleNet scales them by 0.01
(build_simplenet.py:235), projects with a bias-free Linear stack
(:55-83), synthesises negatives by adding N(0, noise_std) gaussian noise
(:243-253), and scores both with a Linear-BatchNorm-LeakyReLU
discriminator (:31-52). Training loss is the hinge
clip(th_n - s_n) + clip(s_p + th_p) (models/losses.py:16-35).

The frozen backbone is NOT part of this module -- the driver applies the
shared encoder under stop_gradient (the functional analogue of
requires_grad=False + .eval(), train_simplenet_synthetic.py:114-118).

Init: xavier_normal for Linear (build_simplenet.py:23-27).
"""
# ------------------------------------------------------------------

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from idee_tpu.baselines.config import OneClassConfig

xavier_normal = nn.initializers.xavier_normal()


class Projection(nn.Module):
    """Bias-free Linear stack (reference: build_simplenet.py:55-83)."""

    out_planes: int
    n_layers: int = 1
    layer_type: int = 0

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = nn.Dense(self.out_planes, use_bias=False,
                         kernel_init=xavier_normal, name=f"{i}fc")(x)
            if i < self.n_layers - 1 and self.layer_type > 1:
                x = nn.leaky_relu(x, 0.2)
        return x


class Discriminator(nn.Module):
    """Linear-BN-LeakyReLU body + bias-free Linear tail
    (reference: build_simplenet.py:31-52)."""

    in_planes: int
    n_layers: int = 1
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_planes if self.hidden is None else self.hidden
        for i in range(self.n_layers - 1):
            hidden = (int(hidden // 1.5) if self.hidden is None
                      else self.hidden)
            x = nn.Dense(hidden, kernel_init=xavier_normal,
                         bias_init=nn.initializers.zeros_init(),
                         name=f"block{i + 1}_fc")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"block{i + 1}_bn")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, use_bias=False, kernel_init=xavier_normal,
                        name="tail")(x)


class SimpleNetOutput(NamedTuple):
    z_n_scores: jnp.ndarray            # [B, V, T, H, W, 1]
    z_p_scores: Optional[jnp.ndarray]  # same, only when training


class SimpleNet(nn.Module):
    """forward(z [B,V,C,T,H,W]) -> scores (reference:
    build_simplenet.py:225-265)."""

    config: OneClassConfig

    @nn.compact
    def __call__(self, z, *, train: bool = False) -> SimpleNetOutput:
        cfg = self.config
        z = z.astype(jnp.float32) * 0.01  # (reference: :235)
        B, V, C, T, H, W = z.shape
        z = jnp.transpose(z, (0, 1, 3, 4, 5, 2)).reshape(-1, C)

        z = Projection(out_planes=cfg.dim, n_layers=cfg.pre_proj,
                       layer_type=cfg.proj_layer_type,
                       name="pre_projection")(z)
        disc = Discriminator(in_planes=cfg.dim, n_layers=cfg.dsc_layers,
                             hidden=cfg.dsc_hidden, name="discriminator")

        z_p_scores = None
        if train:
            noise = cfg.noise_std * jax.random.normal(
                self.make_rng("noise"), z.shape)
            z_p_scores = disc(z + noise, train).reshape(B, V, T, H, W, 1)
        z_n_scores = disc(z, train).reshape(B, V, T, H, W, 1)
        return SimpleNetOutput(z_n_scores, z_p_scores)


def simple_loss(z_n_scores, z_p_scores, th_n: float, th_p: float,
                train: bool = True):
    """Hinge loss (reference: Baselines_OneClass/models/losses.py:16-35).
    Train: mean(clip(th_n - s_n, 0)) + mean(clip(s_p + th_p, 0));
    eval: joint-sum normalisation over both terms."""
    true_loss = jnp.clip(th_n - z_n_scores, 0.0, None)
    fake_loss = jnp.clip(z_p_scores + th_p, 0.0, None)
    if train:
        return true_loss.mean() + fake_loss.mean()
    return (true_loss.sum() + fake_loss.sum()) / (true_loss.size
                                                  + fake_loss.size)
