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

from typing import NamedTuple

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


def build_quantizer(cfg: Config):
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
        )
    if name == "VQ":
        return cls(
            dim=cfg.codebook_dim,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            commitment_weight=cfg.lambda_commitment,
            orthogonal_reg_weight=cfg.lambda_ortho,
            sync_axis=cfg.codebook_sync_axis,
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


class VQModel(nn.Module):
    """Encoder + codebook + classifier (reference: models/build.py:23-159)."""

    config: Config

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        init = reference_init()  # models/build.py:96-118 overrides all inits

        self.encoder = build_encoder(cfg, init, dtype)

        self.cls = CNN_3D_Classifier(
            in_var=cfg.in_channels_dynamic,
            embed_dim=cfg.codebook_dim,
            dim=cfg.cls_dim,
            drop_rate=cfg.cls_drop_rate,
            kernel_init=init,
            dtype=dtype,
        )
        self.vq = build_quantizer(cfg)

    def normal_code(self):
        """vq.indices_to_codes(0): the feature-space 'normal' code vector."""
        return self.vq.indices_to_codes(jnp.zeros((1,), jnp.int32))[0]

    def __call__(self, x_d, *, train: bool = False) -> VQOutput:
        cfg = self.config
        x_d = x_d.astype(jnp.dtype(cfg.dtype))

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
        zc, y = self.cls(z_q.astype(jnp.dtype(cfg.dtype)), train=train)

        vq0 = jax.lax.stop_gradient(self.normal_code())
        return VQOutput(zc.astype(jnp.float32), y.astype(jnp.float32),
                        anomaly, z_q, loss_z_q, vq0)


def build_model(config: Config) -> VQModel:
    return VQModel(config=config)
