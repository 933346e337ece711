# ------------------------------------------------------------------
"""MGFN classifier: glance/focus blocks with magnitude embedding.

Parity target: Baselines_MIL/models/classifier/MGFN.py (361 LoC).
Instances [N, V, T, C] are processed as N*V sequences of length T:
a feature-magnitude embedding x + alpha * conv(||x||_2) (MGFN.py:231-232),
then stages of Backbone blocks -- each block is shortcut-conv + GLANCE
(temporal self-attention) or FOCUS (grouped local conv over heads) +
FeedForward, all residual (MGFN.py:156-161) -- then LayerNorm + Linear +
Sigmoid scoring; returns (features [N,V,T,dim[-2]], scores [N,V,T,1]).

Config note: the shipped cls_dim [512, 256, 1] is dimensionally
incompatible with embed_dim 16 in the reference as well (the first Backbone
would receive 16 channels where Conv1d expects 512); the working
configuration is the reference __main__'s dim=[16, 96, 1] (MGFN.py:326),
used as the default here.

Layout: channels-last [B, T, C]; Conv1d == nn.Conv with kernel (k,).
"""
# ------------------------------------------------------------------

from typing import Callable, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from idee_tpu.baselines.mil.classifiers import normal_init


class ChannelLayerNorm(nn.Module):
    """The MGFN custom LayerNorm: (x - mean) / (std + eps) * g + b over the
    channel axis with eps OUTSIDE the sqrt (MGFN.py:34-44). The MIL init
    sweep sets g=0.02, b=0."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.constant(0.02), (self.dim,))
        b = self.param("b", nn.initializers.zeros_init(), (self.dim,))
        mean = x.mean(axis=-1, keepdims=True)
        std = jnp.sqrt(x.var(axis=-1, keepdims=True))
        return (x - mean) / (std + self.eps) * g + b


def _conv1d(feat, k, kernel_init, use_bias=True, groups=1, name=None):
    pad = k // 2
    return nn.Conv(feat, kernel_size=(k,), padding=((pad, pad),),
                   use_bias=use_bias, feature_group_count=groups,
                   kernel_init=kernel_init,
                   bias_init=nn.initializers.zeros_init(), name=name)


class Focus(nn.Module):
    """Local branch: BN -> v -> grouped conv over heads -> out
    (reference: MGFN.py:65-88)."""

    dim: int
    heads: int
    dim_head: int = 16
    local_aggr_kernel: int = 5
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, T, C]."""
        B, T, C = x.shape
        h = self.heads
        inner = self.dim_head * h
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5,
                         scale_init=nn.initializers.constant(0.02),
                         name="norm")(x)
        v = _conv1d(inner, 1, self.kernel_init, use_bias=False,
                    name="to_v")(x)
        # channel layout (c h): head index is the FAST axis
        # (rearrange 'b (c h) t -> (b c) h t', MGFN.py:85)
        v = v.reshape(B, T, self.dim_head, h)
        v = jnp.transpose(v, (0, 2, 1, 3)).reshape(B * self.dim_head, T, h)
        v = _conv1d(h, self.local_aggr_kernel, self.kernel_init,
                    groups=h, name="rel_pos")(v)
        v = v.reshape(B, self.dim_head, T, h)
        v = jnp.transpose(v, (0, 2, 1, 3)).reshape(B, T, inner)
        return _conv1d(self.dim, 1, self.kernel_init, name="to_out")(v)


class Glance(nn.Module):
    """Temporal self-attention branch (reference: MGFN.py:91-121)."""

    dim: int
    heads: int
    dim_head: int = 16
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, C = x.shape
        h, hd = self.heads, self.dim_head
        inner = hd * h
        x = ChannelLayerNorm(self.dim, name="norm")(x)
        qkv = _conv1d(inner * 3, 1, self.kernel_init, use_bias=False,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # 'b t (h d) -> b h t d'
            return jnp.transpose(t.reshape(B, T, h, hd), (0, 2, 1, 3))

        q, k, v = map(heads_first, (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", q * hd ** -0.5, k), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, inner)
        return _conv1d(self.dim, 1, self.kernel_init, name="to_out")(out)


class MGFNBackbone(nn.Module):
    """depth x (shortcut conv + attention + feedforward), all residual
    (reference: MGFN.py:124-162)."""

    dim: int
    depth: int
    heads: int
    mgfn_type: str = "gb"
    kernel: int = 5
    dim_head: int = 64
    ff_repe: int = 4
    dropout: float = 0.0
    attention_dropout: float = 0.0
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = _conv1d(self.dim, 3, self.kernel_init,
                        name=f"scc{i}")(x) + x
            if self.mgfn_type == "fb":
                att = Focus(dim=self.dim, heads=self.heads,
                            dim_head=self.dim_head,
                            local_aggr_kernel=self.kernel,
                            kernel_init=self.kernel_init, name=f"attn{i}")
            elif self.mgfn_type == "gb":
                att = Glance(dim=self.dim, heads=self.heads,
                             dim_head=self.dim_head,
                             kernel_init=self.kernel_init, name=f"attn{i}")
            else:
                raise ValueError(f"unknown mgfn type {self.mgfn_type!r}")
            x = att(x, train) + x
            # FeedForward (reference: MGFN.py:54-61)
            y = ChannelLayerNorm(self.dim, name=f"ff_norm{i}")(x)
            y = _conv1d(self.dim * self.ff_repe, 1, self.kernel_init,
                        name=f"ff_in{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = _conv1d(self.dim, 1, self.kernel_init,
                        name=f"ff_out{i}")(y)
            x = y + x
        return x


class MGFN(nn.Module):
    """reference: MGFN.py:165-248. [N, V, T, C] ->
    (features [N, V, T, dim[-2]], scores [N, V, T, 1])."""

    embed_dim: int = 16
    dim: Optional[List[int]] = None
    drop_rate: float = 0.0
    alpha: float = 0.1
    depths: Optional[List[int]] = None
    mgfn_types: Optional[List[str]] = None
    lokernel: int = 5
    ff_repe: int = 4
    dim_head: Optional[List[int]] = None
    attention_drop_rate: float = 0.0
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stage-0 dim must equal embed_dim (the magnitude-embedded input
        # keeps C = embed_dim; see the config note in the module docstring)
        dim = list(self.dim or [self.embed_dim, 96, 1])
        depths = list(self.depths or [1, 1])
        types = list(self.mgfn_types or ["fb", "fb"])
        dim_head = list(self.dim_head or [16, 96])

        N, V, T, C = x.shape
        x = x.reshape(N * V, T, C)

        # magnitude embedding (reference: MGFN.py:231-232)
        mag = jnp.linalg.norm(x, axis=-1, keepdims=True)  # [NV, T, 1]
        x = x + self.alpha * _conv1d(self.embed_dim, 3, self.kernel_init,
                                     name="to_mag")(mag)

        for ind, (depth, mtype) in enumerate(zip(depths, types)):
            stage_dim = dim[ind]
            heads = max(stage_dim // dim_head[ind], 1)
            x = MGFNBackbone(
                dim=stage_dim, depth=depth, heads=heads, mgfn_type=mtype,
                kernel=self.lokernel, dim_head=dim_head[ind],
                ff_repe=self.ff_repe, dropout=self.drop_rate,
                attention_dropout=self.attention_drop_rate,
                kernel_init=self.kernel_init, name=f"stage{ind}")(x, train)
            if ind != len(depths) - 1:
                x = ChannelLayerNorm(stage_dim, name=f"trans_norm{ind}")(x)
                x = _conv1d(dim[ind + 1], 1, self.kernel_init,
                            name=f"trans_conv{ind}")(x)

        # torch LayerNorm (affine); the MIL sweep sets weight 0.02
        x = nn.LayerNorm(scale_init=nn.initializers.constant(0.02),
                         name="to_logits")(x)
        scores = nn.sigmoid(nn.Dense(1, kernel_init=self.kernel_init,
                                     bias_init=nn.initializers.zeros_init(),
                                     name="fc")(x))
        return x.reshape(N, V, T, -1), scores.reshape(N, V, T, 1)
