# ------------------------------------------------------------------
"""Vision Mamba encoder: windowed selective-scan (SSM) towers per variable.

Parity target: reference models/encoder/Mamba.py -- the Swin-3D skeleton
(identical window partition / cyclic shift / pad machinery, Mamba.py:49-95)
with each window's flattened token sequence going through a mamba_ssm.Mamba
v1 selective-scan block instead of attention (Mamba.py:121-128,159). No
attention mask is needed (sequence model).

TPU-first: the reference depends on the mamba-ssm CUDA kernel (N1 in
SURVEY.md 2.9). Windows here are tiny (<= 32 tokens at the default window
sizes), so the scan is a ``jax.lax.associative_scan`` over the token axis --
a parallel prefix scan that XLA maps onto the VPU; the fused Pallas variant
lives in kernels/selective_scan.py and is used on TPU for the hot path.

Parameterization follows mamba_ssm.Mamba v1: in_proj -> causal depthwise
conv1d -> silu -> x_proj (dt/B/C) -> softplus(dt_proj) -> selective scan
with A = -exp(A_log), skip D, silu(z) gating -> out_proj. Note the composite
model's init sweep (reference models/build.py:96-118) overrides every
Linear/Conv weight with N(0.02, 0.02) and zeroes biases -- including
dt_proj.bias, so the effective dt at init is softplus(0); A_log/D are bare
parameters and keep log(arange(1..d_state)) / ones.
"""
# ------------------------------------------------------------------

import math
from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.nn.cnn3d import ProjHead
from idee_tpu.nn.layers import DropPath, LayerNorm3d, Mlp, reference_init
from idee_tpu.nn.swin3d import (PatchEmbed3D, get_window_size,
                                window_partition, window_reverse)


def selective_scan(u, delta, A, B, C, D, z):
    """Fused selective scan.

    u, delta, z: [B, L, d]; A: [d, n]; B, C: [B, L, n]; D: [d]
    h_t = exp(delta_t A) h_{t-1} + delta_t B_t u_t;  y_t = C_t . h_t + D u_t

    The recurrence runs through the Pallas linear-scan kernel on TPU
    (kernels/selective_scan.py -- the mamba-ssm CUDA kernel equivalent);
    the surrounding elementwise math stays in XLA, which fuses it into the
    kernel's producers/consumers.
    """
    from idee_tpu.kernels.selective_scan import linear_scan

    dA = jnp.exp(delta[..., None] * A)                       # [B, L, d, n]
    dBu = (delta * u)[..., None] * B[:, :, None, :]          # [B, L, d, n]
    h = linear_scan(dA, dBu, axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C) + u * D
    return y * jax.nn.silu(z)


class MambaSSM(nn.Module):
    """mamba_ssm.Mamba v1-equivalent block on [B, L, d_model]."""

    d_model: int
    d_state: int = 1
    d_conv: int = 3
    expand: int = 1
    dt_min: float = 0.01  # kept for API parity; the composite init zeroes
    dt_max: float = 0.1   # dt_proj.bias so these only matter standalone
    use_mamba_bias_init: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        n = self.d_state

        xz = nn.Dense(2 * d_inner, use_bias=False,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="in_proj")(x)
        u, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over the token axis (padding=d_conv-1 then
        # truncate, mamba_ssm semantics)
        conv_k = self.param("conv1d_kernel", self.kernel_init,
                            (self.d_conv, 1, d_inner))
        conv_b = self.param("conv1d_bias", nn.initializers.zeros_init(),
                            (d_inner,))
        L = u.shape[1]
        u_pad = jnp.pad(u, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        u = jax.lax.conv_general_dilated(
            u_pad.astype(conv_k.dtype), conv_k,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=d_inner,
        )[:, :L] + conv_b
        u = jax.nn.silu(u)

        x_dbl = nn.Dense(dt_rank + 2 * n, use_bias=False,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         name="x_proj")(u)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=-1)

        if self.use_mamba_bias_init:
            def dt_bias_init(key, shape, dtype=jnp.float32):
                # inv-softplus of log-uniform dt in [dt_min, dt_max]
                r = jax.random.uniform(key, shape, dtype)
                dt0 = jnp.exp(r * (math.log(self.dt_max)
                                   - math.log(self.dt_min))
                              + math.log(self.dt_min))
                dt0 = jnp.maximum(dt0, 1e-4)
                return dt0 + jnp.log(-jnp.expm1(-dt0))
        else:
            dt_bias_init = nn.initializers.zeros_init()
        delta = nn.Dense(d_inner, use_bias=True,
                         kernel_init=self.kernel_init,
                         bias_init=dt_bias_init, dtype=self.dtype,
                         name="dt_proj")(dt)
        delta = jax.nn.softplus(delta)

        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)), (d_inner, 1)
            ),
            (d_inner, n))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones_init(), (d_inner,))

        y = selective_scan(u.astype(jnp.float32), delta.astype(jnp.float32),
                           A, B.astype(jnp.float32), C.astype(jnp.float32),
                           D, z.astype(jnp.float32))
        y = y.astype(x.dtype) if self.dtype is None else y.astype(self.dtype)
        return nn.Dense(self.d_model, use_bias=False,
                        kernel_init=self.kernel_init, dtype=self.dtype,
                        name="out_proj")(y)


class MambaBlock(nn.Module):
    """Windowed Mamba block (reference: Mamba.py:98-196): LN -> pad ->
    cyclic shift -> window partition -> SSM over window tokens -> reverse ->
    residual; then LN -> MLP -> residual."""

    dim: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    d_state: int = 1
    d_conv: int = 3
    expand: int = 1
    dt_min: float = 0.01
    dt_max: float = 0.1
    drop: float = 0.0
    drop_path: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, D, H, W, C = x.shape
        ws, ss = get_window_size((D, H, W), self.window_size, self.shift_size)

        shortcut = x
        y = LayerNorm3d(affine=False, dtype=self.dtype)(x)

        pad_d = (ws[0] - D % ws[0]) % ws[0]
        pad_h = (ws[1] - H % ws[1]) % ws[1]
        pad_w = (ws[2] - W % ws[2]) % ws[2]
        if pad_d or pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, Dp, Hp, Wp, _ = y.shape

        shifted = any(s > 0 for s in ss)
        if shifted:
            y = jnp.roll(y, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))

        windows = window_partition(y, ws)
        windows = MambaSSM(d_model=self.dim, d_state=self.d_state,
                           d_conv=self.d_conv, expand=self.expand,
                           dt_min=self.dt_min, dt_max=self.dt_max,
                           kernel_init=self.kernel_init, dtype=self.dtype,
                           name="ssm")(windows)
        y = window_reverse(windows, ws, B, Dp, Hp, Wp)

        if shifted:
            y = jnp.roll(y, shift=(ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            y = y[:, :D, :H, :W, :]

        x = shortcut + DropPath(self.drop_path)(y, train=train)
        z = LayerNorm3d(affine=False, dtype=self.dtype)(x)
        z = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim, drop=self.drop,
                kernel_init=self.kernel_init, dtype=self.dtype)(z, train=train)
        return x + DropPath(self.drop_path)(z, train=train)


class MambaStage(nn.Module):
    """BasicLayer (reference: Mamba.py:247-336)."""

    in_dim: int
    dim: int
    depth: int
    d_state: int = 1
    d_conv: int = 3
    expand: int = 1
    dt_min: float = 0.01
    dt_max: float = 0.1
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    window_size: Tuple[int, int, int] = (4, 4, 4)
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    patch_norm: bool = False
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch-embed downsample iff the stage changes dims or patchifies,
        # with its non-affine LN always on (reference: Mamba.py:313-316)
        if self.in_dim != self.dim or tuple(self.patch_size) != (1, 1, 1):
            x = PatchEmbed3D(patch_size=tuple(self.patch_size),
                             embed_dim=self.dim, patch_norm=True,
                             kernel_init=self.kernel_init, dtype=self.dtype,
                             name="downsample")(x)
        shift = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            blk = MambaBlock(
                dim=self.dim, window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
                dt_min=self.dt_min, dt_max=self.dt_max,
                drop=self.drop,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else 0.0,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"block{i}")
            if self.use_checkpoint:
                x = nn.remat(lambda m, a: m(a, train), prevent_cse=False)(blk, x)
            else:
                x = blk(x, train)
        return x


class MambaTower(nn.Module):
    """One variable's Mamba tower."""

    in_chans: int
    embed_dim: List[int]
    depths: List[int]
    window_size: List[Tuple[int, int, int]]
    d_state: List[int]
    d_conv: List[int]
    expand: List[int]
    dt_min: float = 0.01
    dt_max: float = 0.1
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_norm: bool = False
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_layers = len(self.embed_dim)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        for i in range(n_layers):
            lo = sum(self.depths[:i])
            x = MambaStage(
                in_dim=self.embed_dim[i - 1] if i > 0 else self.in_chans,
                patch_size=tuple(self.patch_size) if i == 0 else (1, 1, 1),
                dim=self.embed_dim[i], depth=self.depths[i],
                d_state=self.d_state[i], d_conv=self.d_conv[i],
                expand=self.expand[i],
                dt_min=self.dt_min, dt_max=self.dt_max,
                window_size=tuple(self.window_size[i]),
                mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                drop_path=dpr[lo:lo + self.depths[i]],
                patch_norm=self.patch_norm and i == 0,
                use_checkpoint=self.use_checkpoint,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"stage{i}")(x, train)
        x = ProjHead(self.embed_dim[-1], kernel_init=self.kernel_init,
                     dtype=self.dtype, name="proj")(x)
        return x


class Mamba(nn.Module):
    """Multi-variable Vision Mamba encoder (reference: Mamba.py:384-531).
    [N, V, C, T, H, W] -> [N, V, E, T, H, W]; vmapped towers."""

    in_vars: int = 6
    in_chans: int = 1
    embed_dim: Optional[List[int]] = None
    window_size: Optional[List[Tuple[int, int, int]]] = None
    depths: Optional[List[int]] = None
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    patch_norm: bool = False
    use_checkpoint: bool = False
    d_state: Optional[List[int]] = None
    d_conv: Optional[List[int]] = None
    expand: Optional[List[int]] = None
    dt_min: float = 0.01
    dt_max: float = 0.1
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        embed_dim = self.embed_dim or [16, 16]
        window_size = self.window_size or [(2, 4, 4), (8, 1, 1)]
        depths = self.depths or [2, 1]
        d_state = self.d_state or [1, 1]
        d_conv = self.d_conv or [3, 3]
        expand = self.expand or [1, 1]

        x = jnp.transpose(x, (0, 1, 3, 4, 5, 2))
        tower = nn.vmap(
            MambaTower,
            in_axes=(1, None),
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "droppath": True},
            methods=["__call__"],
        )(
            in_chans=self.in_chans,
            embed_dim=list(embed_dim), depths=list(depths),
            window_size=[tuple(w) for w in window_size],
            d_state=list(d_state), d_conv=list(d_conv), expand=list(expand),
            dt_min=self.dt_min, dt_max=self.dt_max,
            patch_size=tuple(self.patch_size),
            mlp_ratio=self.mlp_ratio, drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate,
            patch_norm=self.patch_norm, use_checkpoint=self.use_checkpoint,
            kernel_init=self.kernel_init, dtype=self.dtype,
            name="towers",
        )
        y = tower(x, train)
        return jnp.transpose(y, (0, 1, 5, 2, 3, 4))


# register
from idee_tpu.models import vq_model as _vq  # noqa: E402

_vq.ENCODERS.setdefault("Mamba", Mamba)
