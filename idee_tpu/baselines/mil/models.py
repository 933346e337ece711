# ------------------------------------------------------------------
"""MIL composite models: DeepMIL, ARNet, RTFM, MGFN.

Parity targets: Baselines_MIL/models/build_{deepmil,arnet,rtfm,mgfn}.py.
All share: encoder -> (optional agent + Aggregate / temporal mean) ->
per-pixel-instance classifier. The reference splits pixels into ragged
normal/positive bags BEFORE classification (build_deepmil.py:133-151); here
the classifier scores ALL pixels densely -- identical outputs per pixel
(the classifiers are pointwise over instances), with bag selection moved
into the masked top-k losses. This also collapses the reference's
per-sample Python loop into one batched call.

Outputs: MILOutput(scores [N,V,T,H,W] sigmoid in [0,1],
features [N,V,T,H,W,C'] or None). For MGFN, T == 1 after the temporal mean
(build_mgfn.py:161).

Init: one sweep sets Conv/Linear to N(0, 0.02) and norms to 0.02/0
(build_deepmil.py:90-111) -- modules take that init at construction.
"""
# ------------------------------------------------------------------

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from idee_tpu.baselines.config import MILConfig
from idee_tpu.baselines.mil.agent import AgentSwin
from idee_tpu.baselines.mil.classifiers import (ARNet, DeepMIL, RTFM,
                                                normal_init)
from idee_tpu.baselines.mil.mgfn import MGFN
from idee_tpu.baselines.mil.rtfm_net import Aggregate
from idee_tpu.models.vq_model import build_encoder


class MILOutput(NamedTuple):
    scores: jnp.ndarray             # [N, V, T, H, W]
    features: Optional[jnp.ndarray]  # [N, V, T, H, W, C'] or None


def _instances(z):
    """[N, V, C, T, H, W] -> channels-last [N, V, T, H, W, C]."""
    return jnp.transpose(z, (0, 1, 3, 4, 5, 2))


class MILModel(nn.Module):
    """variant in {'deepmil', 'arnet', 'rtfm', 'mgfn'}."""

    config: MILConfig
    variant: str = "deepmil"

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        init = normal_init(0.02)  # MIL sweep: N(0, 0.02)
        self.encoder = build_encoder(cfg, init, dtype)

        if self.variant in ("rtfm", "mgfn"):
            self.agent = AgentSwin(
                in_vars=cfg.in_channels_dynamic,
                in_chans=cfg.en_embed_dim[-1],
                embed_dim=list(cfg.agent_embed_dim),
                depths=list(cfg.agent_depths),
                num_heads=list(cfg.agent_n_heads),
                window_size=[tuple(w) for w in cfg.agent_window_size],
                mlp_ratio=cfg.agent_mlp_ratio,
                qkv_bias=cfg.agent_qkv_bias, qk_scale=cfg.agent_qk_scale,
                drop_rate=cfg.agent_drop_rate,
                attn_drop_rate=cfg.agent_attn_drop_rate,
                drop_path_rate=cfg.agent_drop_path_rate,
                kernel_init=init, dtype=dtype,
            )

        emb = cfg.en_embed_dim[-1]
        if self.variant == "deepmil":
            self.classifier = DeepMIL(embed_dim=emb, dim=list(cfg.cls_dim),
                                      drop_rate=cfg.cls_drop_rate,
                                      kernel_init=init, dtype=dtype)
        elif self.variant == "arnet":
            self.classifier = ARNet(embed_dim=emb, dim=list(cfg.cls_dim),
                                    drop_rate=cfg.cls_drop_rate,
                                    kernel_init=init, dtype=dtype)
        elif self.variant == "rtfm":
            self.Aggregate = Aggregate(len_feature=emb, dim=cfg.dim_mtn_rtfm,
                                       kernel_init=init, dtype=dtype)
            self.classifier = RTFM(embed_dim=emb, dim=list(cfg.cls_dim),
                                   drop_rate=cfg.cls_drop_rate,
                                   kernel_init=init, dtype=dtype)
        elif self.variant == "mgfn":
            self.classifier = MGFN(
                embed_dim=cfg.agent_embed_dim[-1],
                alpha=cfg.alpha_mgfn,
                drop_rate=0.0,
                dim_head=list(cfg.dim_head_mgfn),
                depths=list(cfg.depths_mgfn),
                mgfn_types=list(cfg.types_mgfn),
                lokernel=cfg.lokernel_mgfn,
                ff_repe=cfg.ff_repe_mgfn,
                attention_drop_rate=cfg.attention_drop_rate_mgfn,
                kernel_init=init,
            )
        else:
            raise NotImplementedError(f"MIL variant {self.variant!r}")

    def __call__(self, x_d, *, train: bool = False) -> MILOutput:
        z = self.encoder(x_d, train=train)  # [N, V, C, T, H, W]

        if self.variant == "deepmil":
            s = self.classifier(_instances(z), train)
            return MILOutput(s[..., 0].astype(jnp.float32), None)

        if self.variant == "arnet":
            feat, s = self.classifier(_instances(z), train)
            return MILOutput(s[..., 0].astype(jnp.float32),
                             feat.astype(jnp.float32))

        if self.variant == "rtfm":
            z = self.agent(z, train=train)
            z = self.Aggregate(z, train)
            feat, s = self.classifier(_instances(z), train)
            return MILOutput(s[..., 0].astype(jnp.float32),
                             feat.astype(jnp.float32))

        # mgfn: temporal mean -> per-pixel T=1 sequences
        # (build_mgfn.py:155-161)
        z = self.agent(z, train=train)
        z = jnp.mean(z, axis=3, keepdims=True)   # [N, V, C, 1, H, W]
        inst = _instances(z)                     # [N, V, 1, H, W, C]
        N, V, T, H, W, C = inst.shape
        flat = jnp.transpose(inst, (0, 3, 4, 1, 2, 5))  # [N, H, W, V, T, C]
        flat = flat.reshape(N * H * W, V, T, C)
        feat, s = self.classifier(flat, train)
        Cf = feat.shape[-1]
        feat = feat.reshape(N, H, W, V, T, Cf).transpose(0, 3, 4, 1, 2, 5)
        s = s.reshape(N, H, W, V, T, 1).transpose(0, 3, 4, 1, 2, 5)
        return MILOutput(s[..., 0].astype(jnp.float32),
                         feat.astype(jnp.float32))


def build_mil_model(cfg: MILConfig, variant: str) -> MILModel:
    return MILModel(config=cfg, variant=variant)
