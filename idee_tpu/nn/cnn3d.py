# ------------------------------------------------------------------
"""3D-CNN encoder: residual Conv3d towers, one per input variable.

Parity target: reference models/encoder/CNN_3D.py. The architectural
contract (shared by all three backbones): one independent tower per variable
with *unshared* weights, each tower = n_layers residual conv blocks plus a
2-conv projection head; outputs concatenated on the variable axis
(reference: models/encoder/CNN_3D.py:175-237).

TPU-first design: the reference loops over variables in Python (6 sequential
tower passes, models/encoder/CNN_3D.py:226-233). Round 1 replaced the loop
with nn.vmap over stacked parameters; round 2 goes further: all variables'
channels are PACKED into one lane dimension [N, T, H, W, V*C] and the
unshared towers become grouped convolutions (feature_group_count=V). Same
math, but activations tile onto the (8, 128) TPU layout at 1.33x padding
instead of 8-128x -- see GroupedConv3d in nn/layers.py.
"""
# ------------------------------------------------------------------

from typing import Callable, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.nn.layers import (Conv3d, DropPath, GroupedConv3d,
                                GroupedLayerNorm3d, reference_init)


class ProjHead(nn.Module):
    """Single-tower 2-conv projection head (reference:
    models/encoder/CNN_3D.py:185-192) on [N, T, H, W, C].

    Used by the Swin-3D and Mamba towers (which vmap over variables); the
    CNN encoder itself uses the packed GroupedProjHead below."""

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


class GroupedConvBlock3d(nn.Module):
    """Residual 3D conv block, grouped per variable
    (reference: models/encoder/CNN_3D.py:74-144).

    x -> [optional 1x1x1 down-proj + non-affine LN] -> conv1 -> LN -> ReLU
      -> +shortcut -> conv2 -> LN -> ReLU -> +residual
    Convs are 3x3x3, replicate-padded, bias-free.
    """

    n_groups: int
    in_features: int
    features: int
    drop_path: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        V = self.n_groups
        if self.in_features != self.features:
            # PatchEmbed3D: 1x1x1 projection + non-affine LayerNorm
            # (reference: models/encoder/CNN_3D.py:17-71)
            x = GroupedConv3d(V, self.in_features, self.features,
                              kernel_size=(1, 1, 1),
                              padding=((0, 0), (0, 0), (0, 0)),
                              use_bias=False, kernel_init=self.kernel_init,
                              dtype=self.dtype, name="down_proj")(x)
            x = GroupedLayerNorm3d(V, self.features, affine=False,
                                   dtype=self.dtype, name="down_norm")(x)

        shortcut = x
        y = GroupedConv3d(V, self.features, self.features, (3, 3, 3),
                          padding_mode="replicate", use_bias=False,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="conv1")(x)
        y = GroupedLayerNorm3d(V, self.features, affine=True,
                               dtype=self.dtype, name="norm1")(y)
        y = nn.relu(y)
        x = shortcut + DropPath(self.drop_path)(y, train=train)

        y = GroupedConv3d(V, self.features, self.features, (3, 3, 3),
                          padding_mode="replicate", use_bias=False,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="conv2")(x)
        y = GroupedLayerNorm3d(V, self.features, affine=True,
                               dtype=self.dtype, name="norm2")(y)
        y = nn.relu(y)
        x = x + DropPath(self.drop_path)(y, train=train)
        return x


class GroupedProjHead(nn.Module):
    """Final 2-conv projection head shared by all backbone towers
    (reference: models/encoder/CNN_3D.py:185-192), grouped per variable."""

    n_groups: int
    features: int
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        V, E = self.n_groups, self.features
        x = GroupedConv3d(V, E, E, (3, 3, 3), padding_mode="replicate",
                          use_bias=True, kernel_init=self.kernel_init,
                          dtype=self.dtype, name="proj1")(x)
        x = nn.relu(x)
        x = GroupedConv3d(V, E, E, (3, 3, 3), padding_mode="replicate",
                          use_bias=True, kernel_init=self.kernel_init,
                          dtype=self.dtype, name="proj2")(x)
        return x


def pack_variables(x):
    """[N, V, C, T, H, W] -> packed [N, T, H, W, V*C]."""
    N, V, C, T, H, W = x.shape
    return jnp.transpose(x, (0, 3, 4, 5, 1, 2)).reshape(N, T, H, W, V * C)


def unpack_variables(x, n_vars: int):
    """Packed [N, T, H, W, V*C] -> [N, V, C, T, H, W]."""
    N, T, H, W, VC = x.shape
    x = x.reshape(N, T, H, W, n_vars, VC // n_vars)
    return jnp.transpose(x, (0, 4, 5, 1, 2, 3))


class CNN_3D(nn.Module):
    """Multi-variable 3D-CNN encoder.

    API contract matches the reference encoder family
    (reference: models/encoder/CNN_3D.py:215-237): input [N, V, C, T, H, W]
    -> output [N, V, E, T, H, W], with per-variable unshared weights.
    Internally one packed grouped-conv program over [N, T, H, W, V*C].

    ``packed_out=True`` returns the packed layout [N, T, H, W, V*E] directly
    (the composite model's quantizer/classifier consume packed activations,
    skipping two full-tensor transposes).
    """

    supports_packed_out = True

    in_vars: int = 6
    in_channels: int = 1
    out_channels: Optional[List[int]] = None
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, packed_out: bool = False):
        V = self.in_vars
        out_channels = self.out_channels or [16, 16]
        x = pack_variables(x)  # [N, T, H, W, V*C]

        chans = [self.in_channels] + list(out_channels[:-1])
        for i, out in enumerate(out_channels):
            blk = GroupedConvBlock3d(
                V, chans[i], out, drop_path=self.drop_path_rate,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"block{i}")
            if self.use_checkpoint:
                # prevent_cse stays ON (default) -- see nn/swin3d.py
                x = nn.remat(lambda m, a: m(a, train=train))(blk, x)
            else:
                x = blk(x, train=train)
        x = GroupedProjHead(V, out_channels[-1],
                            kernel_init=self.kernel_init, dtype=self.dtype,
                            name="proj_head")(x)
        if packed_out:
            return x
        return unpack_variables(x, V)
