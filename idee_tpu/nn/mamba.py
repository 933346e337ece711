# ------------------------------------------------------------------
"""Vision Mamba encoder: windowed selective-scan (SSM) towers per variable.

Parity target: reference models/encoder/Mamba.py -- the Swin-3D skeleton
(identical window partition / cyclic shift / pad machinery, Mamba.py:49-95)
with each window's flattened token sequence going through a mamba_ssm.Mamba
v1 selective-scan block instead of attention (Mamba.py:121-128,159). No
attention mask is needed (sequence model).

TPU-first: the reference depends on the mamba-ssm CUDA kernel (N1 in
SURVEY.md 2.9). Windows here are tiny (<= 32 tokens at the default window
sizes), so the recurrence runs through the fused Pallas linear-scan kernel
(kernels/selective_scan.py) with the huge windows*channels axis on the VPU
lanes. Round 2: the towers are PACKED like the CNN/Swin encoders -- one
program on [N, T, H, W, V*C] with block-diagonal GroupedDense projections
and the depthwise conv/scan running over all variables' channels at once
(see nn/layers.py GroupedConv3d for the lane-tiling rationale).

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

from idee_tpu.nn.cnn3d import GroupedProjHead, pack_variables, unpack_variables
from idee_tpu.nn.layers import (DropPath, GroupedDense, GroupedLayerNorm3d,
                                lecun_normal_init, reference_init)
from idee_tpu.nn.swin3d import (PackedPatchEmbed3D, get_window_size,
                                window_partition, window_reverse)


def selective_scan(u, delta, A, B, C, D, z):
    """Fused selective scan (single tower; kept for unit tests).

    u, delta, z: [B, L, d]; A: [d, n]; B, C: [B, L, n]; D: [d]
    h_t = exp(delta_t A) h_{t-1} + delta_t B_t u_t;  y_t = C_t . h_t + D u_t
    """
    from idee_tpu.kernels.selective_scan import linear_scan

    dA = jnp.exp(delta[..., None] * A)                       # [B, L, d, n]
    dBu = (delta * u)[..., None] * B[:, :, None, :]          # [B, L, d, n]
    h = linear_scan(dA, dBu, axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C) + u * D
    return y * jax.nn.silu(z)


def selective_scan_packed(u, delta, A, B, C, D, z, n_groups: int):
    """Selective scan over packed channels.

    u, delta, z: [B_, L, V*d]; A: [V*d, n]; B, C: [B_, L, V, n] (per-variable
    SSM inputs); D: [V*d]. Returns [B_, L, V*d].
    """
    from idee_tpu.kernels.selective_scan import (fused_selective_scan_n1,
                                                 linear_scan)

    B_, L, M = u.shape
    V = n_groups
    d = M // V
    n = A.shape[-1]

    if n == 1:
        # fully fused path: producers + recurrence + consumers in one
        # Pallas pass over [L, batch*channels]
        def fold(t):  # [B_, L, M] -> [L, B_*M]
            return jnp.transpose(t, (1, 0, 2)).reshape(L, B_ * M)

        B_rep = fold(jnp.repeat(B[..., 0], d, axis=2))
        C_rep = fold(jnp.repeat(C[..., 0], d, axis=2))
        y = fused_selective_scan_n1(
            fold(delta), fold(u), B_rep, C_rep, fold(z),
            jnp.tile(A[:, 0], B_), jnp.tile(D, B_))
        return jnp.transpose(y.reshape(L, B_, M), (1, 0, 2))

    # general d_state: per-variable B/C broadcast over that variable's
    # d_inner channels, scan with a trailing state axis
    B_rep = jnp.repeat(B, d, axis=2).reshape(B_, L, M, n)
    dA = jnp.exp(delta[..., None] * A)                       # [B_, L, M, n]
    dBu = (delta * u)[..., None] * B_rep
    h = linear_scan(dA, dBu, axis=1)                         # [B_, L, M, n]
    C_rep = jnp.repeat(C, d, axis=2).reshape(B_, L, M, n)
    y = jnp.sum(h * C_rep, axis=-1) + u * D
    return y * jax.nn.silu(z)


class PackedMambaSSM(nn.Module):
    """mamba_ssm.Mamba v1-equivalent block over all variables at once:
    [B_, L, V*d_model] -> [B_, L, V*d_model], unshared per-variable params
    stacked on axis 0 of every kernel."""

    n_groups: int
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
        V = self.n_groups
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        n = self.d_state
        B_, L, _ = x.shape

        xz = GroupedDense(V, self.d_model, 2 * d_inner, use_bias=False,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="in_proj")(x)
        xz = xz.reshape(B_, L, V, 2, d_inner)
        u = xz[:, :, :, 0].reshape(B_, L, V * d_inner)
        z = xz[:, :, :, 1].reshape(B_, L, V * d_inner)

        # causal depthwise conv over the token axis (padding=d_conv-1 then
        # truncate, mamba_ssm semantics). A depthwise conv with d_conv taps
        # is d_conv shifted multiply-adds -- written that way instead of a
        # feature_group_count=V*d_inner conv_general_dilated, which XLA:TPU
        # lowers per-group (compile-time and launch overhead for 96 groups,
        # zero MXU work since every "matmul" is 1x1)
        conv_k = self.param("conv1d_kernel",
                            self.kernel_init or lecun_normal_init(self.d_conv),
                            (V, self.d_conv, 1, d_inner))
        conv_b = self.param("conv1d_bias", nn.initializers.zeros_init(),
                            (V, d_inner))
        taps = jnp.transpose(conv_k, (1, 2, 0, 3)).reshape(
            self.d_conv, V * d_inner).astype(u.dtype)
        u_pad = jnp.pad(u, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        acc = conv_b.reshape(V * d_inner).astype(u.dtype)
        u = sum(u_pad[:, i:i + L] * taps[i]
                for i in range(self.d_conv)) + acc
        u = jax.nn.silu(u)

        x_dbl = GroupedDense(V, d_inner, dt_rank + 2 * n, use_bias=False,
                             kernel_init=self.kernel_init, dtype=self.dtype,
                             name="x_proj")(u)
        x_dbl = x_dbl.reshape(B_, L, V, dt_rank + 2 * n)
        dt = x_dbl[..., :dt_rank].reshape(B_, L, V * dt_rank)
        Bssm = x_dbl[..., dt_rank:dt_rank + n]      # [B_, L, V, n]
        Cssm = x_dbl[..., dt_rank + n:]             # [B_, L, V, n]

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
        delta = GroupedDense(V, dt_rank, d_inner, use_bias=True,
                             kernel_init=self.kernel_init,
                             bias_init=dt_bias_init, dtype=self.dtype,
                             name="dt_proj")(dt)
        delta = jax.nn.softplus(delta)

        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)),
                (V, d_inner, 1)),
            (V, d_inner, n))
        A = -jnp.exp(A_log).reshape(V * d_inner, n)
        D = self.param("D", nn.initializers.ones_init(), (V, d_inner))

        y = selective_scan_packed(
            u.astype(jnp.float32), delta.astype(jnp.float32), A,
            Bssm.astype(jnp.float32), Cssm.astype(jnp.float32),
            D.reshape(V * d_inner), z.astype(jnp.float32), V)
        y = y.astype(x.dtype) if self.dtype is None else y.astype(self.dtype)
        return GroupedDense(V, d_inner, self.d_model, use_bias=False,
                            kernel_init=self.kernel_init, dtype=self.dtype,
                            name="out_proj")(y)


class MambaSSM(nn.Module):
    """Single-tower SSM on [B, L, d_model] -- PackedMambaSSM with one
    group; standalone building block (and the unit-test surface for the
    scan semantics)."""

    d_model: int
    d_state: int = 1
    d_conv: int = 3
    expand: int = 1
    dt_min: float = 0.01
    dt_max: float = 0.1
    use_mamba_bias_init: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return PackedMambaSSM(
            n_groups=1, d_model=self.d_model, d_state=self.d_state,
            d_conv=self.d_conv, expand=self.expand, dt_min=self.dt_min,
            dt_max=self.dt_max,
            use_mamba_bias_init=self.use_mamba_bias_init,
            kernel_init=self.kernel_init, dtype=self.dtype,
            name="ssm")(x)


class PackedMambaBlock(nn.Module):
    """Windowed Mamba block (reference: Mamba.py:98-196) on the packed
    layout: LN -> pad -> cyclic shift -> window partition -> SSM over window
    tokens -> reverse -> residual; then LN -> MLP -> residual."""

    n_groups: int
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
        B, D, H, W, VC = x.shape
        V = self.n_groups
        ws, ss = get_window_size((D, H, W), self.window_size, self.shift_size)

        shortcut = x
        y = GroupedLayerNorm3d(V, self.dim, affine=False,
                               dtype=self.dtype)(x)

        pad_d = (ws[0] - D % ws[0]) % ws[0]
        pad_h = (ws[1] - H % ws[1]) % ws[1]
        pad_w = (ws[2] - W % ws[2]) % ws[2]
        if pad_d or pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, Dp, Hp, Wp, _ = y.shape

        shifted = any(s > 0 for s in ss)
        if shifted:
            y = jnp.roll(y, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))

        # under spatial GSPMD, re-establish the (data, space) sharding on
        # the window-batch axis — propagation dies at the window-partition
        # reshape and the SSM temps otherwise replicate per device
        # (runtime.set_spatial_mesh; same fix as kernels/window_attention)
        from idee_tpu.kernels.runtime import window_batch_constraint

        windows = window_batch_constraint(window_partition(y, ws))
        windows = PackedMambaSSM(n_groups=V, d_model=self.dim,
                                 d_state=self.d_state, d_conv=self.d_conv,
                                 expand=self.expand, dt_min=self.dt_min,
                                 dt_max=self.dt_max,
                                 kernel_init=self.kernel_init,
                                 dtype=self.dtype, name="ssm")(windows)
        y = window_reverse(window_batch_constraint(windows), ws, B, Dp, Hp,
                           Wp)

        if shifted:
            y = jnp.roll(y, shift=(ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            y = y[:, :D, :H, :W, :]

        x = shortcut + DropPath(self.drop_path)(y, train=train)

        z = GroupedLayerNorm3d(V, self.dim, affine=False,
                               dtype=self.dtype)(x)
        hidden = int(self.dim * self.mlp_ratio)
        z = GroupedDense(V, self.dim, hidden, kernel_init=self.kernel_init,
                         dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dropout(self.drop, deterministic=not train)(z)
        z = GroupedDense(V, hidden, self.dim, kernel_init=self.kernel_init,
                         dtype=self.dtype, name="mlp_fc2")(z)
        z = nn.Dropout(self.drop, deterministic=not train)(z)
        return x + DropPath(self.drop_path)(z, train=train)


class PackedMambaStage(nn.Module):
    """BasicLayer (reference: Mamba.py:247-336)."""

    n_groups: int
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
            x = PackedPatchEmbed3D(n_groups=self.n_groups,
                                   in_features=self.in_dim,
                                   patch_size=tuple(self.patch_size),
                                   embed_dim=self.dim, patch_norm=True,
                                   kernel_init=self.kernel_init,
                                   dtype=self.dtype, name="downsample")(x)
        shift = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            blk = PackedMambaBlock(
                n_groups=self.n_groups, dim=self.dim,
                window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
                dt_min=self.dt_min, dt_max=self.dt_max,
                drop=self.drop,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else 0.0,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"block{i}")
            if self.use_checkpoint:
                # prevent_cse stays ON (default) -- see nn/swin3d.py
                x = nn.remat(lambda m, a: m(a, train))(blk, x)
            else:
                x = blk(x, train)
        return x


class Mamba(nn.Module):
    """Multi-variable Vision Mamba encoder (reference: Mamba.py:384-531).
    [N, V, C, T, H, W] -> [N, V, E, T, H, W] (packed_out=True returns
    [N, T, H, W, V*E]); one packed program with stacked per-variable params.
    """

    supports_packed_out = True

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
    def __call__(self, x, *, train: bool = False, packed_out: bool = False):
        V = self.in_vars
        embed_dim = self.embed_dim or [16, 16]
        window_size = self.window_size or [(2, 4, 4), (8, 1, 1)]
        depths = self.depths or [2, 1]
        d_state = self.d_state or [1, 1]
        d_conv = self.d_conv or [3, 3]
        expand = self.expand or [1, 1]

        x = pack_variables(x)  # [N, T, H, W, V*C]
        n_layers = len(embed_dim)
        total = sum(depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        for i in range(n_layers):
            lo = sum(depths[:i])
            x = PackedMambaStage(
                n_groups=V,
                in_dim=embed_dim[i - 1] if i > 0 else self.in_chans,
                patch_size=tuple(self.patch_size) if i == 0 else (1, 1, 1),
                dim=embed_dim[i], depth=depths[i],
                d_state=d_state[i], d_conv=d_conv[i],
                expand=expand[i],
                dt_min=self.dt_min, dt_max=self.dt_max,
                window_size=tuple(window_size[i]),
                mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                drop_path=dpr[lo:lo + depths[i]],
                patch_norm=self.patch_norm and i == 0,
                use_checkpoint=self.use_checkpoint,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"stage{i}")(x, train)
        x = GroupedProjHead(V, embed_dim[-1], kernel_init=self.kernel_init,
                            dtype=self.dtype, name="proj")(x)
        if packed_out:
            return x
        return unpack_variables(x, V)


# register
from idee_tpu.models import vq_model as _vq  # noqa: E402

_vq.ENCODERS.setdefault("Mamba", Mamba)
