# ------------------------------------------------------------------
"""Shared layers: 3D convolution with replicate padding, non-affine
LayerNorm, MLP, DropPath, and the reference weight-init schemes.

Layout convention: all 3D modules here are **channels-last** ``[N, D, H, W, C]``
(TPU/XLA-friendly), unlike the reference's NCDHW. The composite model
transposes once at its boundary.

Weight init parity: the reference composite model overrides every Conv/Linear
weight with Normal(mean=0.02, std=0.02) and biases with 0 after construction
(reference: models/build.py:96-118), so ``reference_init`` is the default for
the VQ_model path. Standalone backbones use trunc_normal(std=.02)
(reference: models/encoder/CNN_3D.py:196-213).
"""
# ------------------------------------------------------------------

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def reference_init(mean: float = 0.02, std: float = 0.02) -> Callable:
    """Normal(mean, std) initializer (reference: models/build.py:110)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def lecun_normal_init(fan_in: int) -> Callable:
    """Normal(0, 1/sqrt(fan_in)) -- correct per-group fan-in for the
    stacked [V, ...] parameter shapes, where flax's variance_scaling would
    wrongly count the variable axis into fan_in."""
    std = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def trunc_normal_init(std: float = 0.02) -> Callable:
    """Truncated normal at +/-2 std (timm trunc_normal_ semantics)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class Conv3d(nn.Module):
    """3D convolution on [N, D, H, W, C] with optional replicate padding.

    ``padding`` is a per-spatial-dim (lo, hi) tuple; ``padding_mode``
    'replicate' matches torch Conv3d(padding_mode='replicate')
    (reference: models/encoder/CNN_3D.py:99-101) via an edge-pad + VALID conv.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1), (1, 1))
    padding_mode: str = "zeros"  # "zeros" | "replicate"
    use_bias: bool = True
    kernel_init: Optional[Callable] = reference_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = [tuple(p) for p in self.padding]
        if self.padding_mode == "replicate" and any(p != (0, 0) for p in pad):
            x = jnp.pad(
                x, [(0, 0)] + pad + [(0, 0)], mode="edge"
            )
            conv_pad = "VALID"
        else:
            conv_pad = pad
        kw = {} if self.kernel_init is None else {
            "kernel_init": self.kernel_init}
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=conv_pad,
            use_bias=self.use_bias,
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            **kw,
        )(x)


class LayerNorm3d(nn.Module):
    """LayerNorm over the channel (last) axis of [..., C].

    ``affine=False`` matches torch nn.LayerNorm(C, elementwise_affine=False)
    used throughout the reference backbones (e.g. models/encoder/Swin_3D.py:214).

    The input is flattened to [M, C] around the norm: on high-rank vmapped
    tower tensors ([V, N, T, H, W, C]) XLA otherwise assigns the (8, 128)
    tile to the tiny V/N dims of the normalization temporaries, padding
    them up to 21x and OOMing at batch sizes the chip can trivially hold.
    """

    affine: bool = True
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        y = x.reshape(-1, shape[-1])
        y = nn.LayerNorm(
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=self.dtype,
        )(y)
        return y.reshape(shape)


class GroupedConv3d(nn.Module):
    """Per-variable (grouped) 3D convolution on PACKED activations.

    TPU layout rationale: the per-variable towers put the tiny channel dim
    (C=16, or C_in=1) in the lane position of every activation, which the
    (8, 128) TPU tile pads 8-128x -- the round-1 OOM and bandwidth ceiling.
    Packing all variables' channels into one lane dimension V*C (96 -> 128,
    1.33x) and expressing the unshared towers as a grouped convolution
    (feature_group_count=V) keeps the math identical to the reference's
    per-variable Conv3d loop (models/encoder/CNN_3D.py:226-233) while moving
    6-8x fewer bytes through HBM.

    x: [N, D, H, W, V*in_features] -> [N, D', H', W', V*features].
    Parameters stay stacked per variable (kernel [V, kd, kh, kw, Cin, Cout],
    bias [V, Cout]) -- the same shapes as the vmapped-tower formulation, so
    reference torch weights graft 1:1.
    """

    n_groups: int
    in_features: int
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1), (1, 1))
    padding_mode: str = "zeros"  # "zeros" | "replicate"
    use_bias: bool = True
    kernel_init: Optional[Callable] = reference_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        V, cin, cout = self.n_groups, self.in_features, self.features
        kd, kh, kw = self.kernel_size
        init = self.kernel_init or lecun_normal_init(kd * kh * kw * cin)
        kernel = self.param("kernel", init,
                            (V, kd, kh, kw, cin, cout), jnp.float32)
        pad = [tuple(p) for p in self.padding]
        if self.padding_mode == "replicate" and any(p != (0, 0) for p in pad):
            x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)], mode="edge")
            conv_pad = [(0, 0)] * 3
        else:
            conv_pad = pad
        dtype = self.dtype or x.dtype
        # Block-diagonal DENSE kernel instead of feature_group_count=V:
        # grouped/vmapped convs with 16-channel groups run the MXU at <16
        # lanes and measure 6.7x SLOWER than one dense V*C -> V*C conv on
        # this chip, even though the dense form multiplies by structural
        # zeros -- the idle lanes are free, the kernel-launch shape is not.
        # (Measured: grouped 38 ms vs dense 5.7 ms per 200x200x8 conv.)
        eye = jnp.eye(V, dtype=dtype)
        k = jnp.einsum("vdhwio,vu->dhwviuo", kernel.astype(dtype),
                       eye).reshape(kd, kh, kw, V * cin, V * cout)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k,
            window_strides=self.strides, padding=conv_pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (V, cout), jnp.float32)
            y = y + bias.reshape(V * cout).astype(dtype)
        return y


class GroupedDense(nn.Module):
    """Per-variable (unshared) Dense on packed [..., V*in] -> [..., V*out].

    One block-diagonal [V*in, V*out] matmul instead of a vmapped [V, in,
    out] batched matmul: the same layout rationale as GroupedConv3d -- the
    batched form runs 16-wide matmuls that pad 8x in HBM and idle 7/8 of
    the MXU lanes, while the dense form's structural zeros ride lanes that
    would idle anyway. Parameters stay stacked per variable (kernel
    [V, in, out], bias [V, out]) for 1:1 torch weight grafts.
    """

    n_groups: int
    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = reference_init()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        V, fin, fout = self.n_groups, self.in_features, self.features
        init = self.kernel_init or lecun_normal_init(fin)
        kernel = self.param("kernel", init, (V, fin, fout),
                            jnp.float32)
        dtype = self.dtype or x.dtype
        eye = jnp.eye(V, dtype=dtype)
        k = jnp.einsum("vio,vu->viuo", kernel.astype(dtype), eye).reshape(
            V * fin, V * fout)
        y = x.astype(dtype) @ k
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (V, fout), jnp.float32)
            y = y + bias.reshape(V * fout).astype(dtype)
        return y


class GroupedLayerNorm3d(nn.Module):
    """Per-variable LayerNorm over each C-sized group of a packed [..., V*C]
    activation (torch nn.LayerNorm(C) applied independently per variable).

    Moments are computed in float32 (flax nn.LayerNorm semantics); the
    reshape to [..., V, C] stays inside one fused elementwise+reduce kernel,
    so the badly-tiled [.., V, C] shape never materializes in HBM.
    Affine parameters are stacked per variable: scale/bias [V, C].
    """

    n_groups: int
    features: int
    affine: bool = True
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        V, C = self.n_groups, self.features
        # Per-group moments WITHOUT reshaping to [..., V, C] (whose tiny
        # minor dims tile-pad 8-21x): one [V*C, V*C] block-constant
        # projection matmul yields the group means already broadcast back
        # to the packed layout -- everything stays [..., V*C] on the MXU.
        # Intermediates stay in the input dtype (the [.., H, W, V*C] temps
        # dominate the train-step HBM peak at 200x200 -- fp32 copies here
        # cost 300 MB each and OOM the 16 GB chip at batch 2); moments
        # still accumulate in float32 on the MXU via preferred_element_type
        # and the rsqrt runs in float32. Residual bf16 error sources: the
        # 1/C projection weights and the accumulated mean are rounded to
        # bf16 BEFORE the d = x - mu subtraction (so inputs with large
        # means lose absolute precision there, not just in the final
        # normalized values) plus the ~1e-3 rounding of the normalized
        # output; test_grouped_layernorm_bf16_matches_f32 bounds the
        # combined error at 2e-2 for the activation scales seen in
        # training. Keeping mu f32 for the subtraction would force an
        # f32 [.., V*C] copy of d (two consumers -- the var matmul and
        # the y multiply -- defeat fusion), which is the OOM this path
        # exists to avoid. For float32 inputs (goldens, CPU tests) the
        # math is bit-identical to an all-fp32 pass.
        proj = jnp.kron(jnp.eye(V, dtype=x.dtype),
                        jnp.full((C, C), 1.0 / C, x.dtype))
        mu = jnp.matmul(x, proj,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        d = x - mu
        # two-pass: no E[x^2]-mu^2 cancellation
        var = jnp.matmul(jnp.square(d), proj,
                         preferred_element_type=jnp.float32)
        y = d * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones_init(),
                               (V, C), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (V, C), jnp.float32)
            y = (y * scale.reshape(V * C).astype(x.dtype)
                 + bias.reshape(V * C).astype(x.dtype))
        dtype = self.dtype or x.dtype
        return y.astype(dtype)


class Mlp(nn.Module):
    """Transformer MLP (reference: models/encoder/Swin_3D.py:24-42)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    kernel_init: Optional[Callable] = reference_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = {} if self.kernel_init is None else {
            "kernel_init": self.kernel_init}
        x = nn.Dense(self.hidden_features, dtype=self.dtype, **kw)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, **kw)(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
