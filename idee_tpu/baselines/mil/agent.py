# ------------------------------------------------------------------
"""Agent: cross-attention Swin over variables.

Parity target: Baselines_MIL/models/agent/Swin_3D.py (701 LoC) -- a Swin_3D
variant whose WindowAttention3D takes q from the variable's own features and
k,v from a conditioning tensor of the OTHER variables at the same
spatio-temporal location (agent/Swin_3D.py:105-186, 668-677). The default
(and only shipped) configuration uses window_size (1, 1, 1)
(Baselines_MIL/config.py:77), which makes each window a single location, so
the attention is exactly per-location cross-attention over the V-1 other
variables -- implemented here directly as a batched einsum, no window
machinery needed (asserted).

TPU-first: one vmapped tower over stacked per-variable params; the
conditioning set "all variables except self" is realised by attending over
ALL V variables with the self key masked out (identical softmax to the
reference's explicit index-list gather, agent/Swin_3D.py:671-677, without
materialising V copies of a [B, V-1, T, H, W, C] tensor).

Init: the MIL init sweep sets Linear/Conv to N(0, 0.02) and affine
LayerNorms to weight=0.02 / bias=0 (build_rtfm.py:283-305); the rel-pos
table is a bare parameter and keeps trunc_normal(0.02).
"""
# ------------------------------------------------------------------

from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.nn.layers import Conv3d, DropPath, trunc_normal_init
from idee_tpu.baselines.mil.classifiers import normal_init


def _affine_ln(name=None):
    """Affine LayerNorm with the MIL sweep's init (weight 0.02, bias 0)."""
    return nn.LayerNorm(scale_init=nn.initializers.constant(0.02),
                        bias_init=nn.initializers.zeros_init(), name=name)


class CrossVariableAttention(nn.Module):
    """Per-location attention: q from own variable, k/v from the others
    (reference: agent/Swin_3D.py:105-186 with window (1,1,1))."""

    dim: int
    con_dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_all, self_idx, train: bool = False):
        """x: [B, T, H, W, C]; x_all: [B, V, T, H, W, C_con];
        self_idx: scalar index of this tower's variable."""
        h = self.num_heads
        hd = self.dim // h
        scale = self.qk_scale or hd ** -0.5
        V = x_all.shape[1]

        q = nn.Dense(self.dim, use_bias=self.qkv_bias,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="q")(x)
        kv = nn.Dense(2 * self.dim, use_bias=self.qkv_bias,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="kv")(x_all)

        B, T, H, W, _ = x.shape
        q = q.reshape(B, T, H, W, h, hd) * scale
        kv = kv.reshape(B, V, T, H, W, 2, h, hd)
        k, v = kv[..., 0, :, :], kv[..., 1, :, :]

        # rel-pos bias table for a (1,1,1) window: one scalar per head
        table = self.param("relative_position_bias_table",
                           trunc_normal_init(0.02), (1, h))
        logits = jnp.einsum("bthwnd,bvthwnd->bthwnv", q, k)
        logits = logits + table[0][None, None, None, None, :, None]
        # exclude self (reference removes the own variable from the
        # conditioning set, agent/Swin_3D.py:671-673)
        var_ids = jnp.arange(V)
        logits = jnp.where(
            (var_ids == self_idx)[None, None, None, None, None, :],
            -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bthwnv,bvthwnd->bthwnd", attn, v)
        out = out.reshape(B, T, H, W, self.dim)
        out = nn.Dense(self.dim, kernel_init=self.kernel_init,
                       dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class AgentBlock(nn.Module):
    """LN -> cross attention -> residual; LN -> MLP -> residual
    (reference: agent/Swin_3D.py:206-310)."""

    dim: int
    con_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_all, self_idx, train: bool = False):
        y = _affine_ln("norm1")(x)
        con = _affine_ln("norm1_con")(x_all)
        y = CrossVariableAttention(
            dim=self.dim, con_dim=self.con_dim, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            kernel_init=self.kernel_init, dtype=self.dtype,
            name="attn")(y, con, self_idx, train)
        x = x + DropPath(self.drop_path)(y, train=train)

        z = _affine_ln("norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio),
                     kernel_init=self.kernel_init, dtype=self.dtype)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dropout(self.drop, deterministic=not train)(z)
        z = nn.Dense(self.dim, kernel_init=self.kernel_init,
                     dtype=self.dtype)(z)
        z = nn.Dropout(self.drop, deterministic=not train)(z)
        return x + DropPath(self.drop_path)(z, train=train)


class AgentTower(nn.Module):
    """One variable's agent tower: pointwise embed + blocks + conv head
    (reference: agent/Swin_3D.py:596-634)."""

    in_chans: int
    embed_dim: List[int]
    depths: List[int]
    num_heads: List[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_all, self_idx, train: bool = False):
        """x: [B, T, H, W, C_in]; x_all: [B, V, T, H, W, C_in]."""
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        for i, (dim, depth, heads) in enumerate(
                zip(self.embed_dim, self.depths, self.num_heads)):
            in_dim = self.embed_dim[i - 1] if i > 0 else self.in_chans
            # pointwise patch embed + non-affine LN iff the stage changes
            # dims (agent/Swin_3D.py:447-450; absent for the default
            # 16 -> [16] agent config)
            if in_dim != dim:
                x = nn.Conv(dim, kernel_size=(1, 1, 1), padding="VALID",
                            kernel_init=self.kernel_init,
                            bias_init=nn.initializers.zeros_init(),
                            dtype=self.dtype, name=f"embed{i}")(x)
                x = nn.LayerNorm(use_bias=False, use_scale=False,
                                 name=f"embed_norm{i}")(x)
            lo = sum(self.depths[:i])
            for d in range(depth):
                x = AgentBlock(
                    dim=dim, con_dim=in_dim if d == 0 else dim,
                    num_heads=heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=dpr[lo + d], kernel_init=self.kernel_init,
                    dtype=self.dtype, name=f"stage{i}_block{d}",
                )(x, x_all, self_idx, train)
        # conv head: Conv3d-ReLU-Conv3d-ReLU (agent/Swin_3D.py:624-634)
        for j in range(2):
            x = Conv3d(self.embed_dim[-1], kernel_size=(3, 3, 3),
                       padding=((1, 1), (1, 1), (1, 1)),
                       padding_mode="replicate",
                       kernel_init=self.kernel_init, dtype=self.dtype,
                       name=f"proj{j}")(x)
            x = nn.relu(x)
        return x


class AgentSwin(nn.Module):
    """Multi-variable cross-attention agent
    (reference: agent/Swin_3D.py:529-687).

    [B, V, C, T, H, W] -> [B, V, E, T, H, W]; vmapped towers with stacked
    per-variable params, conditioning = all other variables.
    """

    in_vars: int = 6
    in_chans: int = 16
    embed_dim: Optional[List[int]] = None
    depths: Optional[List[int]] = None
    num_heads: Optional[List[int]] = None
    window_size: Optional[List[Tuple[int, int, int]]] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        window_size = self.window_size or [(1, 1, 1)]
        assert all(tuple(w) == (1, 1, 1) for w in window_size), (
            "the agent is defined for window_size (1,1,1) (the reference "
            "default and only shipped config, Baselines_MIL/config.py:77)"
        )
        embed_dim = self.embed_dim or [16]
        depths = self.depths or [1]
        num_heads = self.num_heads or [2]

        x = jnp.transpose(x, (0, 1, 3, 4, 5, 2))  # [B, V, T, H, W, C]
        tower = nn.vmap(
            AgentTower,
            in_axes=(1, None, 0, None),
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "droppath": True},
            methods=["__call__"],
        )(
            in_chans=self.in_chans,
            embed_dim=list(embed_dim), depths=list(depths),
            num_heads=list(num_heads), mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            kernel_init=self.kernel_init, dtype=self.dtype,
            name="towers",
        )
        y = tower(x, x, jnp.arange(self.in_vars), train)
        return jnp.transpose(y, (0, 1, 5, 2, 3, 4))
