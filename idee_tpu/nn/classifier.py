# ------------------------------------------------------------------
"""3D-CNN classifier heads: a joint extreme-event head over all variables
plus V per-variable heads.

Parity target: reference models/classifier/CNN_3D.py. Each head is three
Conv3d layers with kernel (2,3,3), stride (2,1,1), padding (0,1,1) that
collapse the temporal axis delta_t=8 -> 1 (reference:
models/classifier/CNN_3D.py:83-93; the reference notes the heads are
hard-wired for delta_t=8 at :34,:81 -- kept here, documented).

TPU-first: the V per-variable heads are one vmapped head with stacked
parameters instead of a Python loop (reference: :126-127).
"""
# ------------------------------------------------------------------

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.nn.layers import Conv3d, reference_init

_KSIZE = (2, 3, 3)
_STRIDE = (2, 1, 1)
_PAD = ((0, 0), (1, 1), (1, 1))


class ClassifierHead(nn.Module):
    """One classification head [N, T, H, W, C] -> [N, H, W, n_classes].

    Three strided convs collapse T=8 -> 1 (reference:
    models/classifier/CNN_3D.py:36-58).
    """

    dim: int
    n_classes: int = 1
    drop_rate: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3d(self.dim, _KSIZE, _STRIDE, _PAD,
                   kernel_init=self.kernel_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = Conv3d(self.dim, _KSIZE, _STRIDE, _PAD,
                   kernel_init=self.kernel_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv3d(self.n_classes, _KSIZE, _STRIDE, _PAD,
                   kernel_init=self.kernel_init, dtype=self.dtype)(x)
        return jnp.squeeze(x, axis=1)  # T collapsed to 1


class CNN_3D_Classifier(nn.Module):
    """Joint + multi-head classifier (reference: models/classifier/CNN_3D.py:61-139).

    Input  [N, V, C, T, H, W] (quantized codes)
    Output z [N, n_classes, H, W] from the joint head over V*C channels,
           y [N, V, n_classes, H, W] from the vmapped per-variable heads
           (the reference returns y as a length-V list).
    """

    in_var: int = 6
    embed_dim: int = 16
    dim: int = 16
    n_classes: int = 1
    drop_rate: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        N, V, C, T, H, W = x.shape

        # per-variable heads: vmap over V with unshared stacked params
        xv = jnp.transpose(x, (0, 1, 3, 4, 5, 2))  # [N, V, T, H, W, C]
        head_v = nn.vmap(
            ClassifierHead,
            in_axes=(1, None),
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            methods=["__call__"],
        )(dim=self.dim, n_classes=1, drop_rate=self.drop_rate,
          kernel_init=self.kernel_init, dtype=self.dtype, name="heads_var")
        y = head_v(xv, train)  # [N, V, H, W, 1]
        y = jnp.transpose(y, (0, 1, 4, 2, 3))  # [N, V, 1, H, W]

        # joint head over all variables' channels (reference: :129-137)
        xj = jnp.transpose(x, (0, 3, 4, 5, 1, 2)).reshape(N, T, H, W, V * C)
        z = ClassifierHead(dim=self.dim * self.in_var,
                           n_classes=self.n_classes,
                           drop_rate=self.drop_rate,
                           kernel_init=self.kernel_init,
                           dtype=self.dtype, name="head_joint")(xj, train=train)
        z = jnp.transpose(z, (0, 3, 1, 2))  # [N, n_classes, H, W]

        return z, y
