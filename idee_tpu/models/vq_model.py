# ------------------------------------------------------------------
"""The composite VQ model: encoder -> LFQ bottleneck -> classifier.

Parity target: reference models/build.py:130-159. The per-(variable, time,
pixel) code index from the quantizer IS the anomaly/driver mask.

forward(x [N,V,C,T,H,W]) ->
  z        [N, n_classes, H, W]   joint extreme logits
  y        [N, V, 1, H, W]        per-variable extreme logits
  anomaly  [N, V, T, H, W]        anomaly bits (code indices)
  z_q      [N, V, C', T, H, W]    quantized features (float32)
  loss_z_q scalar                 quantizer aux loss
  vq0      [C']                   the 'normal' code vector (stop-gradient),
                                  used by the anomaly L1 loss (the reference
                                  calls vq.indices_to_codes(0) in the train
                                  loop, train_synthetic.py:185-194)
"""
# ------------------------------------------------------------------

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from idee_tpu.config import Config
from idee_tpu.nn.classifier import CNN_3D_Classifier
from idee_tpu.nn.cnn3d import CNN_3D
from idee_tpu.nn.layers import reference_init

ENCODERS = {"CNN_3D": CNN_3D}


def register_encoder(name, cls):
    ENCODERS[name] = cls


def _load_encoders():
    # deferred imports so optional backbones don't slow cold start
    from idee_tpu.nn import swin3d  # noqa: F401

    try:
        from idee_tpu.nn import mamba  # noqa: F401
    except ImportError:
        pass


def build_encoder(cfg: Config, kernel_init, dtype):
    """Construct the configured backbone encoder (reference:
    models/build.py:34-84; shared by the composite model and every
    baseline, which in the reference re-declare this block verbatim in
    each Baselines_* build file)."""
    if cfg.encoder not in ENCODERS:
        _load_encoders()
    if cfg.encoder not in ENCODERS:
        raise NotImplementedError(f"Encoder {cfg.encoder} not implemented")
    enc_cls = ENCODERS[cfg.encoder]

    if cfg.encoder == "CNN_3D":
        return enc_cls(
            in_vars=cfg.in_channels_dynamic,
            in_channels=cfg.in_channels,
            out_channels=list(cfg.en_embed_dim),
            drop_path_rate=cfg.en_drop_path_rate,
            drop_rate=cfg.en_drop_rate,
            use_checkpoint=cfg.en_use_checkpoint,
            kernel_init=kernel_init,
            dtype=dtype,
        )
    if cfg.encoder == "Swin_3D":
        return enc_cls(
            in_vars=cfg.in_channels_dynamic,
            in_chans=cfg.in_channels,
            embed_dim=list(cfg.en_embed_dim),
            window_size=[tuple(w) for w in cfg.en_window_size],
            depths=list(cfg.en_depths),
            num_heads=list(cfg.en_n_heads),
            mlp_ratio=cfg.en_mlp_ratio,
            drop_rate=cfg.en_drop_rate,
            attn_drop_rate=cfg.en_attn_drop_rate,
            drop_path_rate=cfg.en_drop_path_rate,
            qkv_bias=cfg.en_qkv_bias,
            qk_scale=cfg.en_qk_scale,
            patch_size=tuple(cfg.en_patch_size),
            patch_norm=cfg.en_patch_norm,
            use_checkpoint=cfg.en_use_checkpoint,
            kernel_init=kernel_init,
            dtype=dtype,
        )
    if cfg.encoder == "Mamba":
        return enc_cls(
            in_vars=cfg.in_channels_dynamic,
            in_chans=cfg.in_channels,
            embed_dim=list(cfg.en_embed_dim),
            window_size=[tuple(w) for w in cfg.en_window_size],
            depths=list(cfg.en_depths),
            mlp_ratio=cfg.en_mlp_ratio,
            drop_rate=cfg.en_drop_rate,
            drop_path_rate=cfg.en_drop_path_rate,
            patch_size=tuple(cfg.en_patch_size),
            patch_norm=cfg.en_patch_norm,
            use_checkpoint=cfg.en_use_checkpoint,
            d_state=list(cfg.d_state),
            d_conv=list(cfg.d_conv),
            expand=list(cfg.expand),
            dt_min=cfg.dt_min,
            dt_max=cfg.dt_max,
            kernel_init=kernel_init,
            dtype=dtype,
        )
    return enc_cls(config=cfg)


def build_quantizer(cfg: Config, kernel_init=None):
    """Construct the configured codebook (reference hard-codes 'LFQ' with a
    TODO, models/build.py:86-91; here all five variants are selectable via
    cfg.codebook through the registry)."""
    from idee_tpu.quant import get_quantizer

    cls = get_quantizer(cfg.codebook)
    name = cfg.codebook
    if name == "LFQ":
        return cls(
            dim=cfg.codebook_dim,
            codebook_size=cfg.codebook_size,
            entropy_loss_weight=cfg.lambda_entropy,
            diversity_gamma=cfg.diversity_gamma,
            commitment_loss_weight=cfg.lambda_commitment,
            freeze_project_out=getattr(cfg, "codebook_freeze_out", False),
            inv_temperature=getattr(cfg, "codebook_inv_temperature", 100.0),
            kernel_init=kernel_init,
        )
    if name == "VQ":
        ema = getattr(cfg, "vq_ema_update", False)
        return cls(
            dim=cfg.codebook_dim,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            commitment_weight=cfg.lambda_commitment,
            orthogonal_reg_weight=cfg.lambda_ortho,
            sync_axis=cfg.codebook_sync_axis,
            # EMA-variant knobs (reference VQ.py:736-772 kwargs; rebuild
            # flags — the reference config never exposes them)
            ema_update=ema,
            learnable_codebook=not ema,
            decay=getattr(cfg, "vq_decay", 0.8),
            kmeans_init=getattr(cfg, "vq_kmeans_init", False),
            kmeans_iters=getattr(cfg, "vq_kmeans_iters", 10),
            threshold_ema_dead_code=getattr(
                cfg, "vq_threshold_ema_dead_code", 0.0),
            use_cosine_sim=getattr(cfg, "vq_use_cosine_sim", False),
        )
    if name == "FSQ":
        return cls(dim=cfg.codebook_dim, levels=(cfg.codebook_size,))
    if name == "LatentQuantize":
        return cls(
            dim=cfg.codebook_dim,
            levels=(cfg.codebook_size,),
            commitment_loss_weight=cfg.lambda_commitment,
        )
    if name == "Random_VQ":
        return cls(
            dim=cfg.codebook_dim,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            sync_axis=cfg.codebook_sync_axis,
        )
    return cls(dim=cfg.codebook_dim, codebook_size=cfg.codebook_size)


class VQOutput(NamedTuple):
    z: jnp.ndarray
    y: jnp.ndarray
    anomaly: jnp.ndarray
    z_q: jnp.ndarray
    loss_z_q: jnp.ndarray
    vq0: jnp.ndarray
    # fused in-model anomaly L1 (set when the caller passes
    # mask_extreme_loss); None -> losses.py computes it from z_q
    loss_anomaly: Optional[jnp.ndarray] = None


class VQModel(nn.Module):
    """Encoder + codebook + classifier (reference: models/build.py:23-159)."""

    config: Config

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        # models/build.py:96-118 overrides every Conv/Linear init with
        # Normal(0.02, 0.02); init_scheme="zero_mean" is the documented
        # trainability fix (see config.py)
        scheme = getattr(cfg, "init_scheme", "reference")
        if scheme == "zero_mean":
            from idee_tpu.nn.layers import trunc_normal_init

            init = trunc_normal_init(0.02)
        elif scheme == "lecun":
            # None -> per-module fan-in-scaled (lecun) defaults; keeps the
            # STE gradient path through the 1-bit LFQ projections at O(1)
            # (reference-scale 0.02 projections attenuate the encoder
            # gradient ~300x below the classifier's -- BASELINE.md)
            init = None
        else:
            init = reference_init()

        self.encoder = build_encoder(cfg, init, dtype)

        self.cls = CNN_3D_Classifier(
            in_var=cfg.in_channels_dynamic,
            embed_dim=cfg.codebook_dim,
            dim=cfg.cls_dim,
            drop_rate=cfg.cls_drop_rate,
            kernel_init=init,
            dtype=dtype,
        )
        self.vq = build_quantizer(cfg, kernel_init=init)

    def normal_code(self):
        """vq.indices_to_codes(0): the feature-space 'normal' code vector."""
        return self.vq.indices_to_codes(jnp.zeros((1,), jnp.int32))[0]

    def _scalar_lfq(self) -> bool:
        """True when the quantizer supports the packed 1-bit fast path."""
        from idee_tpu.quant.lfq import LFQ

        return (isinstance(self.vq, LFQ) and self.vq.codebook_dims == 1
                and self.vq.has_projections and self.vq.codebook_scale == 1.0)

    def __call__(self, x_d, *, train: bool = False,
                 mask_extreme_loss=None, mask_exclude=None) -> VQOutput:
        """Forward pass (reference: models/build.py:130-159).

        mask_extreme_loss / mask_exclude ([N, H, W], optional): when given,
        the anomaly L1 loss (reference models/losses.py:127-168 / :15-61) is
        computed IN the model, fused with the quantizer -- on the 1-bit LFQ
        path the full float32 z_q never materializes (losses.anomaly_l1_lfq).
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x_d = x_d.astype(dtype)

        if self._scalar_lfq():
            return self._forward_packed(x_d, train, mask_extreme_loss,
                                        mask_exclude)

        # ---- generic path (VQ / FSQ / LatentQuantize / Random_VQ) ----
        # encoder: [N,V,C_in,T,H,W] -> [N,V,C,T,H,W]
        z = self.encoder(x_d, train=train)

        # flatten (V,T,H,W) -> tokens for the quantizer (build.py:149-150)
        N, V, C, T, H, W = z.shape
        tokens = jnp.transpose(z, (0, 1, 3, 4, 5, 2)).reshape(N, V * T * H * W, C)

        z_q, indices, loss_z_q = self.vq(tokens, train=train)

        z_q = z_q.reshape(N, V, T, H, W, C)
        z_q = jnp.transpose(z_q, (0, 1, 5, 2, 3, 4))  # [N,V,C,T,H,W] fp32
        anomaly = indices.reshape(N, V, T, H, W)

        # classify on the quantized codes only (build.py:157)
        zc, y = self.cls(z_q.astype(dtype), train=train)

        vq0 = jax.lax.stop_gradient(self.normal_code())
        loss_anomaly = None
        if mask_extreme_loss is not None:
            from idee_tpu import losses

            if mask_exclude is not None:
                loss_anomaly = losses.anomaly_l1_loss(
                    z_q, mask_extreme_loss, mask_exclude, vq0)
            else:
                loss_anomaly = losses.anomaly_l1_loss_synthetic(
                    z_q, mask_extreme_loss, vq0)
        return VQOutput(zc.astype(jnp.float32), y.astype(jnp.float32),
                        anomaly, z_q, loss_z_q, vq0, loss_anomaly)

    def _forward_packed(self, x_d, train, mask_extreme_loss, mask_exclude):
        """Packed 1-bit LFQ flow: all activations keep the TPU-friendly
        [N, T, H, W, V*C] layout (see nn/layers.py GroupedConv3d for the
        tiling rationale); the quantizer runs on flat [M] scalars and the
        anomaly L1 is the fused losses.anomaly_l1_lfq."""
        from idee_tpu import losses
        from idee_tpu.nn.cnn3d import pack_variables

        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        V = cfg.in_channels_dynamic

        if getattr(type(self.encoder), "supports_packed_out", False):
            zp = self.encoder(x_d, train=train, packed_out=True)
        else:
            zp = pack_variables(self.encoder(x_d, train=train))
        N, T, H, W, VC = zp.shape
        C = VC // V

        # block-diagonal quantize in the packed layout: [.., V*C] stays on
        # wide lanes end-to-end (a flat [M, C] relayout would tile-pad 8x
        # -- ~15 GB at the CERRA 512x832 geometry -- and block GSPMD
        # spatial-sharding propagation; see LFQ.quantize_packed)
        parts = self.vq.quantize_packed(zp, V, train=train)
        s_q = parts.s_q  # [N,T,H,W,V]
        anomaly = jnp.transpose(parts.indices, (0, 4, 1, 2, 3))  # [N,V,T,H,W]

        w_out, b_out = self.vq.out_proj_params()
        # packed z_q straight to [.., V*C] via the block-diagonal expansion
        # zq[.., v*C+c] = s_q[.., v] * w_out[c] + b_out[c]; cast to compute
        # dtype immediately (the fp32 form stays inside the producing
        # fusion; no [.., V, C] 6-D narrow-minor intermediate)
        import numpy as np

        blk = np.equal.outer(np.arange(VC) // C,
                             np.arange(V)).astype(np.float32)  # [VC, V]
        w_exp = jnp.tile(w_out, V)[:, None] * blk               # [VC, V]
        zq_packed = (jnp.einsum("...v,kv->...k", s_q, w_exp)
                     + jnp.tile(b_out, V))                       # [.., VC]
        zc, y = self.cls(zq_packed.astype(dtype), train=train, packed=True)

        vq0 = jax.lax.stop_gradient(b_out - w_out)  # project_out(-1)
        loss_anomaly = None
        if mask_extreme_loss is not None:
            w_pix = mask_extreme_loss.astype(jnp.float32)
            if mask_exclude is not None:
                w_pix = w_pix + mask_exclude.astype(jnp.float32)
            w_pix = 1.0 - jnp.clip(w_pix, 0.0, 1.0)
            loss_anomaly = losses.anomaly_l1_lfq(s_q, w_pix, w_out, b_out)

        # reference-layout z_q [N,V,C,T,H,W] for eval/tests; dead (DCE) in
        # the train step, whose loss uses the fused loss_anomaly instead
        z_q = jnp.transpose(zq_packed.reshape(N, T, H, W, V, C),
                            (0, 4, 5, 1, 2, 3))
        return VQOutput(zc.astype(jnp.float32), y.astype(jnp.float32),
                        anomaly, z_q, parts.aux_loss, vq0, loss_anomaly)


def build_model(config: Config) -> VQModel:
    return VQModel(config=config)
