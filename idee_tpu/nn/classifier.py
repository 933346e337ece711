# ------------------------------------------------------------------
"""3D-CNN classifier heads: a joint extreme-event head over all variables
plus V per-variable heads.

Parity target: reference models/classifier/CNN_3D.py. Each head is three
Conv3d layers with kernel (2,3,3), stride (2,1,1), padding (0,1,1) that
collapse the temporal axis delta_t=8 -> 1 (reference:
models/classifier/CNN_3D.py:83-93; the reference notes the heads are
hard-wired for delta_t=8 at :34,:81 -- kept here, documented).

TPU-first: the V per-variable heads run as ONE grouped-convolution program
on the packed [N, T, H, W, V*C] layout (reference loops over heads in
Python, :126-127) -- see GroupedConv3d in nn/layers.py for the layout
rationale. The joint head is a plain conv over all V*C channels, exactly the
reference's channel-concat head (:129-137).
"""
# ------------------------------------------------------------------

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.nn.layers import Conv3d, GroupedConv3d, reference_init

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


class GroupedClassifierHead(nn.Module):
    """V per-variable heads as one grouped-conv program.

    Packed [N, T, H, W, V*C] -> [N, H, W, V*n_classes]. Parameter shapes are
    stacked per variable ([V, kd, kh, kw, Cin, Cout]) -- identical to the
    per-head torch weights (reference: models/classifier/CNN_3D.py:17-58).
    """

    n_groups: int
    in_features: int
    dim: int
    n_classes: int = 1
    drop_rate: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        V = self.n_groups
        x = GroupedConv3d(V, self.in_features, self.dim, _KSIZE, _STRIDE,
                          _PAD, kernel_init=self.kernel_init,
                          dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = GroupedConv3d(V, self.dim, self.dim, _KSIZE, _STRIDE, _PAD,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="conv2")(x)
        x = nn.relu(x)
        x = GroupedConv3d(V, self.dim, self.n_classes, _KSIZE, _STRIDE, _PAD,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="conv3")(x)
        return jnp.squeeze(x, axis=1)  # T collapsed to 1


class CNN_3D_Classifier(nn.Module):
    """Joint + multi-head classifier (reference: models/classifier/CNN_3D.py:61-139).

    Input  [N, V, C, T, H, W] quantized codes, or (packed=True) the packed
           layout [N, T, H, W, V*C] directly.
    Output z [N, n_classes, H, W] from the joint head over V*C channels,
           y [N, V, n_classes, H, W] from the grouped per-variable heads
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
    def __call__(self, x, *, train: bool = False, packed: bool = False):
        V, C = self.in_var, self.embed_dim
        if not packed:
            N, _, _, T, H, W = x.shape
            x = jnp.transpose(x, (0, 3, 4, 5, 1, 2)).reshape(
                N, T, H, W, V * C)

        # per-variable heads (grouped; reference: :126-127)
        y = GroupedClassifierHead(
            V, C, self.dim, n_classes=1, drop_rate=self.drop_rate,
            kernel_init=self.kernel_init, dtype=self.dtype,
            name="heads_var")(x, train=train)    # [N, H, W, V]
        y = jnp.transpose(y, (0, 3, 1, 2))[:, :, None]  # [N, V, 1, H, W]

        # joint head over all variables' channels (reference: :129-137)
        z = ClassifierHead(dim=self.dim * self.in_var,
                           n_classes=self.n_classes,
                           drop_rate=self.drop_rate,
                           kernel_init=self.kernel_init,
                           dtype=self.dtype, name="head_joint")(x, train=train)
        z = jnp.transpose(z, (0, 3, 1, 2))  # [N, n_classes, H, W]

        return z, y
