# ------------------------------------------------------------------
"""STEALNET: 3D conv autoencoder (https://arxiv.org/abs/2110.09768).

Parity target: Baselines_Reconstruction/models/build_steal.py. Encoder:
4x (Conv3d stride-(1,2,2)/(2,2,2)/(2,2,2)/(2,1,1), BatchNorm3d,
LeakyReLU 0.2); decoder mirrors with transposed convs and ends with
Tanh * 10 so outputs live in the clipped data range [-10, 10]
(build_steal.py:18-84). Input is [N, V, T, H, W] with the V variables as
channels (the dataset's channel dim squeezed, train_steal_synthetic.py:175).

Loss: signed MSE -- MSE on normal pixels minus MSE on extreme pixels
(pseudo-anomaly repulsion, models/losses.py:16-32).

Layout: channels-last [N, T, H, W, V]; torch's
ConvTranspose3d(k=3, s, p=1, output_padding=s-1) is exactly nn.ConvTranspose
with "SAME" padding (out = in * s). H and W must be divisible by 8, T by 4
(the reference has the same constraint implicitly). The reference's init
sweep is commented out (build_steal.py:102-124) => torch defaults; we match
with torch's kaiming-uniform fan-in init.
"""
# ------------------------------------------------------------------

from typing import List, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

# torch Conv default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")


def _bn(train, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Reconstruction3DEncoder(nn.Module):
    """reference: build_steal.py:18-47. [N, T, H, W, V] ->
    [N, T/4, H/8, W/8, E]."""

    chnum_in: int = 6
    embed_dim: Optional[List[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.embed_dim or [96, 128, 256])
        strides = [(1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 1, 1)]
        feats = [dims[0], dims[1], dims[2], dims[2]]
        for i, (f, s) in enumerate(zip(feats, strides)):
            x = nn.Conv(f, kernel_size=(3, 3, 3), strides=s, padding="SAME",
                        use_bias=False, kernel_init=torch_conv_init,
                        name=f"conv{i}")(x)
            x = _bn(train, f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class Reconstruction3DDecoder(nn.Module):
    """reference: build_steal.py:50-84. Mirrors the encoder; Tanh * 10."""

    chnum_in: int = 6
    embed_dim: Optional[List[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.embed_dim or [256, 128, 96])
        strides = [(2, 1, 1), (2, 2, 2), (2, 2, 2), (1, 2, 2)]
        feats = [dims[0], dims[1], dims[2], self.chnum_in]
        for i, (f, s) in enumerate(zip(feats, strides)):
            last = i == len(feats) - 1
            x = nn.ConvTranspose(f, kernel_size=(3, 3, 3), strides=s,
                                 padding="SAME", use_bias=last,
                                 kernel_init=torch_conv_init,
                                 bias_init=nn.initializers.zeros_init(),
                                 name=f"deconv{i}")(x)
            if not last:
                x = _bn(train, f"bn{i}")(x)
                x = nn.leaky_relu(x, 0.2)
        return jnp.tanh(x) * 10.0


class RecOutput(NamedTuple):
    pred: jnp.ndarray  # [N, V, T, H, W]


class RecModel(nn.Module):
    """reference: build_steal.py:87-157. forward [N,V,T,H,W] -> same."""

    chnum_in: int = 6
    en_embed_dim: Optional[List[int]] = None
    de_embed_dim: Optional[List[int]] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> RecOutput:
        y = jnp.transpose(x, (0, 2, 3, 4, 1))  # channels-last
        y = Reconstruction3DEncoder(chnum_in=self.chnum_in,
                                    embed_dim=self.en_embed_dim,
                                    name="encoder")(y, train)
        y = Reconstruction3DDecoder(chnum_in=self.chnum_in,
                                    embed_dim=self.de_embed_dim,
                                    name="decoder")(y, train)
        return RecOutput(jnp.transpose(y, (0, 4, 1, 2, 3)))


def steal_loss(pred, target, mask):
    """Signed MSE (reference: Baselines_Reconstruction/models/
    losses.py:16-32): + MSE on normal pixels, - MSE on extreme pixels.
    pred/target [N,V,T,H,W]; mask [N,T,H,W] (mask_extreme_loss over the
    full window)."""
    err = (pred - target) ** 2
    sel_p = jnp.broadcast_to(mask[:, None] != 0, err.shape)
    sel_n = ~sel_p
    loss_n = jnp.sum(err * sel_n) / jnp.maximum(sel_n.sum(), 1)
    loss_p = -jnp.sum(err * sel_p) / jnp.maximum(sel_p.sum(), 1)
    return loss_n + loss_p
