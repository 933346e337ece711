# ------------------------------------------------------------------
"""RTFM multi-scale temporal network: Aggregate + non-local block.

Parity target: Baselines_MIL/models/build_rtfm.py:24-195. Aggregate runs
three dilated 3x3 Conv2d branches (dilation 1/2/4) plus a 1x1 branch over
each [C, H, W] slice, fuses with a 3x3 conv and adds the residual
(build_rtfm.py:120-194). The reference defines _NonLocalBlockND but leaves
the call commented out ("not feasible to do attention for HxW",
build_rtfm.py:161,181-183) -- NonLocalBlock1D is provided here for
inventory parity and is likewise not wired into Aggregate.

Layout: channels-last [_, H, W, C]; BatchNorm statistics live in the
"batch_stats" collection (torch BatchNorm2d running stats); the MIL init
sweep sets conv weights N(0, 0.02) and BN scale 0.02.
"""
# ------------------------------------------------------------------

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.baselines.mil.classifiers import normal_init


def _bn(train: bool, name=None):
    # torch BatchNorm defaults: momentum 0.1 (flax: 0.9), eps 1e-5; the MIL
    # init sweep sets the affine weight to 0.02
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5,
                        scale_init=nn.initializers.constant(0.02),
                        bias_init=nn.initializers.zeros_init(), name=name)


class Aggregate(nn.Module):
    """[B, V, C, T, H, W] -> same shape (reference: build_rtfm.py:120-194)."""

    len_feature: int = 16
    dim: int = 32
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, V, C, T, H, W = x.shape
        out = jnp.transpose(x, (0, 1, 3, 4, 5, 2)).reshape(
            B * V * T, H, W, C)
        residual = out

        def conv(feat, k, dil, use_bias=True, name=None):
            pad = dil * (k - 1) // 2
            return nn.Conv(feat, kernel_size=(k, k),
                           kernel_dilation=(dil, dil),
                           padding=((pad, pad), (pad, pad)),
                           use_bias=use_bias, kernel_init=self.kernel_init,
                           bias_init=nn.initializers.zeros_init(),
                           dtype=self.dtype, name=name)

        out1 = _bn(train, "bn1")(nn.relu(conv(self.dim, 3, 1,
                                              name="conv_1")(out)))
        out2 = _bn(train, "bn2")(nn.relu(conv(self.dim, 3, 2,
                                              name="conv_2")(out)))
        out3 = _bn(train, "bn3")(nn.relu(conv(self.dim, 3, 4,
                                              name="conv_3")(out)))
        out4 = nn.relu(conv(self.dim, 1, 1, use_bias=False,
                            name="conv_4")(out))
        fused = jnp.concatenate([out1, out2, out3, out4], axis=-1)
        fused = _bn(train, "bn5")(nn.relu(conv(self.len_feature, 3, 1,
                                               use_bias=False,
                                               name="conv_5")(fused)))
        fused = fused + residual
        fused = fused.reshape(B, V, T, H, W, C)
        return jnp.transpose(fused, (0, 1, 5, 2, 3, 4))


class NonLocalBlock1D(nn.Module):
    """1D non-local self-attention block (reference: build_rtfm.py:24-117,
    dimension=1). x: [B, L, C] channels-last."""

    in_channels: int
    inter_channels: Optional[int] = None
    sub_sample: bool = True
    bn_layer: bool = True
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.inter_channels or max(self.in_channels // 2, 1)

        def conv1(feat, name):
            return nn.Conv(feat, kernel_size=(1,),
                           kernel_init=self.kernel_init,
                           bias_init=nn.initializers.zeros_init(),
                           dtype=self.dtype, name=name)

        g = conv1(inter, "g")(x)
        theta = conv1(inter, "theta")(x)
        phi = conv1(inter, "phi")(x)
        if self.sub_sample:
            g = nn.max_pool(g, (2,), strides=(2,))
            phi = nn.max_pool(phi, (2,), strides=(2,))

        f = jnp.einsum("bic,bjc->bij", theta, phi)
        f = f / f.shape[-1]
        y = jnp.einsum("bij,bjc->bic", f, g)
        # W projection is zero-init so the block starts as identity
        # (reference: build_rtfm.py:63-69)
        w = nn.Conv(self.in_channels, kernel_size=(1,),
                    kernel_init=nn.initializers.zeros_init(),
                    bias_init=nn.initializers.zeros_init(),
                    dtype=self.dtype, name="W")(y)
        if self.bn_layer:
            w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5,
                             scale_init=nn.initializers.zeros_init(),
                             name="W_bn")(w)
        return w + x
