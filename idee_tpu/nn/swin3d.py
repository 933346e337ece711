# ------------------------------------------------------------------
"""Video Swin-3D encoder: 3D shifted-window attention towers per variable.

Parity target: reference models/encoder/Swin_3D.py (a Video Swin Transformer
variant). Same contract as the other backbones: [N,V,C,T,H,W] ->
[N,V,E,T,H,W] with per-variable unshared towers + 2-conv projection heads.

TPU-first design decisions (round 2: fully PACKED like the CNN encoder --
see nn/layers.py GroupedConv3d for the lane-tiling rationale):
* per-variable towers run as ONE packed program on [N, T, H, W, V*C]:
  Dense/conv layers are block-diagonal GroupedDense/GroupedConv3d, norms
  are GroupedLayerNorm3d (the reference runs 6 sequential Python passes,
  Swin_3D.py:625-635; round 1 vmapped them, which still tile-padded every
  activation 8x);
* window partition / cyclic shift are static reshape/transpose + jnp.roll
  on the packed layout (channel-count agnostic);
* the shifted-window attention mask and the relative-position-bias gather
  indices are *trace-time numpy constants* (the reference rebuilds the mask
  on every forward on device, Swin_3D.py:438);
* attention folds (variable, head) into ONE head-like grid axis G = V*h of
  the fused Pallas kernel (kernels/window_attention.py) -- 12 heads of 8-32
  tokens per window, packed 128 rows per MXU tile.
"""
# ------------------------------------------------------------------

from functools import reduce as _reduce
from operator import mul
from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.nn.cnn3d import GroupedProjHead
from idee_tpu.nn.layers import (DropPath, GroupedConv3d, GroupedDense,
                                GroupedLayerNorm3d, reference_init,
                                trunc_normal_init)


def get_window_size(x_size, window_size, shift_size=None):
    """Shrink window dims to the input size; zero the shift there
    (reference: Swin_3D.py:77-90). Pure-python (trace-time)."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if shift_size is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


def window_partition(x, ws):
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] (reference: Swin_3D.py:45-57)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, _reduce(mul, ws), C)


def window_reverse(windows, ws, B, D, H, W):
    """Inverse of window_partition (reference: Swin_3D.py:60-74)."""
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2],
                        ws[0], ws[1], ws[2], -1)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(B, D, H, W, -1)


def relative_position_index(ws: Tuple[int, int, int]) -> np.ndarray:
    """Pairwise relative-position gather indices for a 3D window
    (reference: Swin_3D.py:120-135). Trace-time numpy constant."""
    coords = np.stack(np.meshgrid(
        np.arange(ws[0]), np.arange(ws[1]), np.arange(ws[2]),
        indexing="ij"))  # [3, wd, wh, ww]
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [3, n, n]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= (2 * ws[2] - 1)
    return rel.sum(-1)  # [n, n]


def compute_shift_mask(Dp: int, Hp: int, Wp: int, ws, ss
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Additive attention mask (0 / -100) for shifted windows
    (reference: Swin_3D.py:340-352). Trace-time numpy constants.

    Returns None when nothing is shifted, else a DEDUPLICATED
    (bank [K, n, n], idx [nW] -> bank row) pair: only windows on the
    cyclic-wrap boundary differ, so K is tiny (<= 8) while nW grows with
    the grid -- at the CERRA 512x832 crop the dense [nW, n, n] form is a
    436 MB constant that overflows the remote-compile transport, where
    bank+idx is < 1 MB. Consumers gather bank[idx] lazily on device (the
    gather fuses into the additive-mask add)."""
    if not any(s > 0 for s in ss):
        return None
    img = np.zeros((1, Dp, Hp, Wp, 1), np.float32)
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0]),
              slice(-ss[0], None)) if ss[0] else (slice(None),):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]),
                  slice(-ss[1], None)) if ss[1] else (slice(None),):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]),
                      slice(-ss[2], None)) if ss[2] else (slice(None),):
                img[:, d, h, w, :] = cnt
                cnt += 1
    # partition with numpy (same math as window_partition)
    B, D, H, W, C = img.shape
    x = img.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2],
                    ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, _reduce(mul, ws))
    mask = x[:, None, :] - x[:, :, None]
    mask = np.where(mask != 0, -100.0, 0.0).astype(np.float32)
    n = mask.shape[-1]
    bank, idx = np.unique(mask.reshape(mask.shape[0], -1), axis=0,
                          return_inverse=True)
    return bank.reshape(-1, n, n), idx.astype(np.int32).reshape(-1)


def mask_bank_to_full(mask):
    """(bank, idx) -> lazily-gathered [nW, n, n] device expression (or
    pass-through for None / a pre-densified array)."""
    if mask is None or not isinstance(mask, tuple):
        return mask
    bank, idx = mask
    return jnp.asarray(bank)[jnp.asarray(idx)]


class PackedWindowAttention3D(nn.Module):
    """W-MSA with 3D relative position bias, all variables in one program
    (reference: Swin_3D.py:93-178).

    x: [B_, n, V*C] windows -> [B_, n, V*C]. The V unshared attentions ride
    the Pallas kernel's head axis: G = V*heads bias planes [G, n, n], one
    grid step each.
    """

    n_groups: int
    dim: int  # per-variable channels C
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        B_, n, VC = x.shape
        V, C, h = self.n_groups, self.dim, self.num_heads
        hd = C // h
        scale = self.qk_scale or hd ** -0.5

        table_size = ((2 * self.window_size[0] - 1)
                      * (2 * self.window_size[1] - 1)
                      * (2 * self.window_size[2] - 1))
        # bare nn.Parameter in the reference: untouched by build.py's
        # Conv/Linear init sweep, stays trunc_normal(.02); stacked per var
        table = self.param("relative_position_bias_table",
                           trunc_normal_init(0.02), (V, table_size, h))
        rpi = relative_position_index(self.window_size)[:n, :n].reshape(-1)

        qkv = GroupedDense(V, C, 3 * C, use_bias=self.qkv_bias,
                           kernel_init=self.kernel_init, dtype=self.dtype,
                           name="qkv")(x)
        qkv = qkv.reshape(B_, n, V, 3, h, hd)
        # fold (V, h) into the kernel's head axis, V-major == packed C order
        q, k, v = (qkv[:, :, :, i].reshape(B_, n, V * h, hd)
                   for i in range(3))

        bias = table[:, rpi].reshape(V, n, n, h)
        bias = jnp.transpose(bias, (0, 3, 1, 2)).reshape(V * h, n, n)

        if self.attn_drop > 0 and train:
            # attention-probability dropout needs the explicit chain
            attn = jnp.einsum("bngd,bmgd->bgnm", q * scale, k)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                mask_full = mask_bank_to_full(mask)
                nW = mask_full.shape[0]
                attn = attn.reshape(B_ // nW, nW, V * h, n, n)
                attn = attn + mask_full[None, :, None].astype(attn.dtype)
                attn = attn.reshape(B_, V * h, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum("bgnm,bmgd->bngd", attn, v)
        else:
            # fused Pallas path: both matmuls + bias/mask + softmax in one
            # kernel (kernels/window_attention.py); XLA fallback off-TPU
            from idee_tpu.kernels.window_attention import window_attention

            out = window_attention(q, k, v, bias, mask, scale)
        out = out.reshape(B_, n, VC).astype(self.dtype or out.dtype)
        out = GroupedDense(V, C, C, kernel_init=self.kernel_init,
                           dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class PackedSwinBlock3D(nn.Module):
    """One Swin block on the packed layout: shifted-window MSA + MLP
    (reference: Swin_3D.py:181-287)."""

    n_groups: int
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, D, H, W, V*C]."""
        B, D, H, W, VC = x.shape
        V = self.n_groups
        ws, ss = get_window_size((D, H, W), self.window_size, self.shift_size)

        shortcut = x
        y = GroupedLayerNorm3d(V, self.dim, affine=False,
                               dtype=self.dtype)(x)

        # pad to window multiples (trace-time static)
        pad_d = (ws[0] - D % ws[0]) % ws[0]
        pad_h = (ws[1] - H % ws[1]) % ws[1]
        pad_w = (ws[2] - W % ws[2]) % ws[2]
        if pad_d or pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, Dp, Hp, Wp, _ = y.shape

        shifted = any(s > 0 for s in ss)
        if shifted:
            y = jnp.roll(y, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            # stays a trace-time numpy (bank, idx) pair; consumers gather
            mask = compute_shift_mask(Dp, Hp, Wp, ws, ss)
        else:
            mask = None

        windows = window_partition(y, ws)
        attn = PackedWindowAttention3D(
            n_groups=V, dim=self.dim, window_size=ws,
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, kernel_init=self.kernel_init,
            dtype=self.dtype, name="attn")(windows, mask, train)
        y = window_reverse(attn, ws, B, Dp, Hp, Wp)

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


class PatchEmbed3D(nn.Module):
    """Single-tower Conv3d patchify with pad-to-multiple (reference:
    Swin_3D.py:449-491) on [N, D, H, W, C] -- used by the (vmapped) Mamba
    tower; the packed Swin path uses PackedPatchEmbed3D below."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 64
    patch_norm: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from idee_tpu.nn.layers import LayerNorm3d

        _, D, H, W, _ = x.shape
        p = self.patch_size
        pads = [(0, (p[i] - s % p[i]) % p[i]) for i, s in enumerate((D, H, W))]
        if any(hi for _, hi in pads):
            x = jnp.pad(x, ((0, 0),) + tuple(pads) + ((0, 0),))
        x = nn.Conv(self.embed_dim, kernel_size=p, strides=p, padding="VALID",
                    use_bias=True, kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros_init(),
                    dtype=self.dtype)(x)
        if self.patch_norm:
            x = LayerNorm3d(affine=False, dtype=self.dtype)(x)
        return x


class PackedPatchEmbed3D(nn.Module):
    """Per-variable Conv3d patchify with pad-to-multiple
    (reference: Swin_3D.py:449-491) on [N, D, H, W, V*Cin]."""

    n_groups: int
    in_features: int
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 64
    patch_norm: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        _, D, H, W, _ = x.shape
        p = self.patch_size
        pads = [(0, (p[i] - s % p[i]) % p[i]) for i, s in enumerate((D, H, W))]
        if any(hi for _, hi in pads):
            x = jnp.pad(x, ((0, 0),) + tuple(pads) + ((0, 0),))
        x = GroupedConv3d(self.n_groups, self.in_features, self.embed_dim,
                          kernel_size=p, strides=p,
                          padding=((0, 0), (0, 0), (0, 0)), use_bias=True,
                          kernel_init=self.kernel_init, dtype=self.dtype,
                          name="proj")(x)
        if self.patch_norm:
            x = GroupedLayerNorm3d(self.n_groups, self.embed_dim,
                                   affine=False, dtype=self.dtype,
                                   name="norm")(x)
        return x


class PackedPatchMerging(nn.Module):
    """2x spatial (and 2x temporal when D > 1) patch merging: concat the
    2x2(x2) neighborhood -> LayerNorm(4C) -> Linear(4C -> 2C, no bias)
    (reference: Swin_3D.py:290-335 -- defined but unused in the reference's
    default path; provided per-variable on the packed layout for
    completeness/parity)."""

    n_groups: int
    dim: int
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, D, H, W, VC = x.shape
        V, C = self.n_groups, self.dim
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        if D % 2 and D != 1:
            x = jnp.pad(x, ((0, 0), (0, D % 2), (0, 0), (0, 0), (0, 0)))
        if D == 1:
            parts = [x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                     x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]]
        else:
            parts = [x[:, 0::2, 0::2, 0::2], x[:, 1::2, 1::2, 0::2],
                     x[:, 0::2, 0::2, 1::2], x[:, 1::2, 1::2, 1::2]]
        # concat per VARIABLE on the channel axis: [..., V, 4C] packed
        y = jnp.stack(parts, axis=-1)            # [..., V*C, 4]
        sh = y.shape[:-2]
        y = y.reshape(*sh, V, C, 4)
        y = jnp.moveaxis(y, -1, -2).reshape(*sh, V * 4 * C)
        y = GroupedLayerNorm3d(V, 4 * C, affine=True, dtype=self.dtype,
                               name="norm")(y)
        y = GroupedDense(V, 4 * C, 2 * C, use_bias=False,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         name="reduction")(y)
        return y


class PackedSwinStage(nn.Module):
    """BasicLayer: optional patch-embed downsample + depth blocks
    (reference: Swin_3D.py:355-446)."""

    n_groups: int
    in_dim: int
    dim: int
    depth: int
    num_heads: int
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    window_size: Tuple[int, int, int] = (4, 4, 4)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    patch_norm: bool = False
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch-embed downsample iff the stage changes dims or patchifies;
        # when present its non-affine LayerNorm is unconditional (the
        # reference hardcodes norm_layer=nn.LayerNorm at Swin_3D.py:418 and
        # never consults the dead patch_norm flag, :388 vs :579)
        if self.in_dim != self.dim or tuple(self.patch_size) != (1, 1, 1):
            x = PackedPatchEmbed3D(n_groups=self.n_groups,
                                   in_features=self.in_dim,
                                   patch_size=tuple(self.patch_size),
                                   embed_dim=self.dim, patch_norm=True,
                                   kernel_init=self.kernel_init,
                                   dtype=self.dtype, name="downsample")(x)
        shift = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            blk = PackedSwinBlock3D(
                n_groups=self.n_groups, dim=self.dim,
                num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else 0.0,
                kernel_init=self.kernel_init, dtype=self.dtype,
                name=f"block{i}")
            if self.use_checkpoint:
                # prevent_cse must stay ON (the default): with it off, XLA
                # CSEs the recomputed forward back into the saved one and
                # the remat is a measured no-op (memory_fit.py probes were
                # byte-identical). Modern JAX implements it with
                # optimization_barrier, which is free on TPU.
                x = nn.remat(lambda m, a: m(a, train))(blk, x)
            else:
                x = blk(x, train)
        return x


class Swin_3D(nn.Module):
    """Multi-variable Video Swin-3D encoder (reference: Swin_3D.py:494-636).

    [N, V, C, T, H, W] -> [N, V, E, T, H, W] (or packed [N, T, H, W, V*E]
    with packed_out=True); one packed program over all variables' towers
    with stacked per-variable params.
    """

    supports_packed_out = True

    in_vars: int = 6
    in_chans: int = 1
    embed_dim: Optional[List[int]] = None
    window_size: Optional[List[Tuple[int, int, int]]] = None
    depths: Optional[List[int]] = None
    num_heads: Optional[List[int]] = None
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    patch_norm: bool = False
    use_checkpoint: bool = False
    kernel_init: Callable = reference_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, packed_out: bool = False):
        from idee_tpu.nn.cnn3d import pack_variables, unpack_variables

        V = self.in_vars
        embed_dim = self.embed_dim or [16, 16]
        window_size = self.window_size or [(2, 4, 4), (8, 1, 1)]
        depths = self.depths or [2, 1]
        num_heads = self.num_heads or [2, 2]

        x = pack_variables(x)  # [N, T, H, W, V*C]
        n_layers = len(embed_dim)
        total = sum(depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        for i in range(n_layers):
            lo = sum(depths[:i])
            x = PackedSwinStage(
                n_groups=V,
                in_dim=embed_dim[i - 1] if i > 0 else self.in_chans,
                patch_size=tuple(self.patch_size) if i == 0 else (1, 1, 1),
                dim=embed_dim[i],
                depth=depths[i],
                num_heads=num_heads[i],
                window_size=tuple(window_size[i]),
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
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

_vq.ENCODERS.setdefault("Swin_3D", Swin_3D)
