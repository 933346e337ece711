# ------------------------------------------------------------------
"""3D-CNN encoder: residual Conv3d towers, one per input variable.

Parity target: reference models/encoder/CNN_3D.py. The architectural
contract (shared by all three backbones): one independent tower per variable
with *unshared* weights, each tower = n_layers residual conv blocks plus a
2-conv projection head; outputs concatenated on the variable axis
(reference: models/encoder/CNN_3D.py:175-237).

TPU-first design: the reference loops over variables in Python (6 sequential
tower passes, models/encoder/CNN_3D.py:226-233). Here the loop is a single
``nn.vmap`` over stacked per-variable parameters -- one fused XLA program,
V-way batched convolutions on the MXU.
"""
# ------------------------------------------------------------------

from typing import Callable, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.nn.layers import Conv3d, DropPath, LayerNorm3d, reference_init


class PatchEmbed3dDown(nn.Module):
    """1x1x1 channel projection + non-affine LayerNorm used when a block
    changes channel count (reference: models/encoder/CNN_3D.py:17-71)."""

    features: int
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, kernel_size=(1, 1, 1),
                   padding=((0, 0), (0, 0), (0, 0)), use_bias=False,
                   kernel_init=self.kernel_init, dtype=self.dtype)(x)
        x = LayerNorm3d(affine=False, dtype=self.dtype)(x)
        return x


class ConvBlock3d(nn.Module):
    """Residual 3D conv block (reference: models/encoder/CNN_3D.py:74-144).

    x -> [optional 1x1x1 down-proj] -> conv1 -> LN -> ReLU -> +shortcut
      -> conv2 -> LN -> ReLU -> +residual
    Convs are 3x3x3, replicate-padded, bias-free.
    """

    in_features: int
    features: int
    drop_path: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.in_features != self.features:
            x = PatchEmbed3dDown(self.features, kernel_init=self.kernel_init,
                                 dtype=self.dtype)(x)

        shortcut = x
        y = Conv3d(self.features, (3, 3, 3), padding_mode="replicate",
                   use_bias=False, kernel_init=self.kernel_init,
                   dtype=self.dtype)(x)
        y = LayerNorm3d(affine=True, dtype=self.dtype)(y)
        y = nn.relu(y)
        x = shortcut + DropPath(self.drop_path)(y, train=train)

        y = Conv3d(self.features, (3, 3, 3), padding_mode="replicate",
                   use_bias=False, kernel_init=self.kernel_init,
                   dtype=self.dtype)(x)
        y = LayerNorm3d(affine=True, dtype=self.dtype)(y)
        y = nn.relu(y)
        x = x + DropPath(self.drop_path)(y, train=train)
        return x


class ProjHead(nn.Module):
    """Final 2-conv projection head shared by all backbone towers
    (reference: models/encoder/CNN_3D.py:185-192)."""

    features: int
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, (3, 3, 3), padding_mode="replicate",
                   use_bias=True, kernel_init=self.kernel_init,
                   dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv3d(self.features, (3, 3, 3), padding_mode="replicate",
                   use_bias=True, kernel_init=self.kernel_init,
                   dtype=self.dtype)(x)
        return x


class CNN3DTower(nn.Module):
    """One variable's encoder tower: stacked residual blocks + projection.

    Operates channels-last on [N, T, H, W, C_in] -> [N, T, H, W, E].
    use_checkpoint remats each block (activation checkpointing, the
    jax.checkpoint analogue of the reference's en_use_checkpoint flag).
    """

    in_channels: int
    out_channels: List[int]
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = [self.in_channels] + list(self.out_channels[:-1])
        for i, out in enumerate(self.out_channels):
            blk = ConvBlock3d(chans[i], out, drop_path=self.drop_path_rate,
                              kernel_init=self.kernel_init,
                              dtype=self.dtype)
            if self.use_checkpoint:
                x = nn.remat(lambda m, a: m(a, train=train),
                             prevent_cse=False)(blk, x)
            else:
                x = blk(x, train=train)
        x = ProjHead(self.out_channels[-1], kernel_init=self.kernel_init,
                     dtype=self.dtype)(x)
        return x


class CNN_3D(nn.Module):
    """Multi-variable 3D-CNN encoder.

    API contract matches the reference encoder family
    (reference: models/encoder/CNN_3D.py:215-237): input [N, V, C, T, H, W]
    -> output [N, V, E, T, H, W], with per-variable unshared weights.
    Internally a single vmapped tower with parameters stacked on axis 0.
    """

    in_vars: int = 6
    in_channels: int = 1
    out_channels: Optional[List[int]] = None
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_channels = self.out_channels or [16, 16]
        # [N, V, C, T, H, W] -> [N, V, T, H, W, C] (channels-last for XLA)
        x = jnp.transpose(x, (0, 1, 3, 4, 5, 2))

        tower = nn.vmap(
            CNN3DTower,
            in_axes=(1, None),
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True, "droppath": True},
            methods=["__call__"],
        )(
            in_channels=self.in_channels,
            out_channels=out_channels,
            drop_path_rate=self.drop_path_rate,
            drop_rate=self.drop_rate,
            use_checkpoint=self.use_checkpoint,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="towers",
        )
        y = tower(x, train)  # [N, V, T, H, W, E]
        # back to the reference layout [N, V, E, T, H, W]
        return jnp.transpose(y, (0, 1, 5, 2, 3, 4))
