# ------------------------------------------------------------------
"""Checkpoint interop: reference torch .pth <-> packed flax params.

Round-trips our params through the reference's exact state-dict format and
checks forward-output equality after a strict torch ``load_state_dict`` —
i.e. both conversion directions are golden-tested against the reference
implementation (models/build.py VQ_model), not just against each other.
Mamba (uninstantiable in torch here — mamba_ssm needs CUDA) gets a pure
round-trip + key-schema test.
"""
# ------------------------------------------------------------------

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

from test_golden_backbones import _install_timm_stub  # noqa: E402
from test_golden_training import _Cfg  # noqa: E402


def _flax_params(cfg, seed=0):
    import jax
    import jax.numpy as jnp

    from idee_tpu.models import build_model

    model = build_model(cfg)
    x = np.random.default_rng(seed).normal(
        size=(1, cfg.in_channels_dynamic, cfg.in_channels, cfg.delta_t,
              8, 8)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(seed)},
                        jnp.asarray(x), train=False)["params"]
    from flax.core import unfreeze

    return model, unfreeze(params)


_TORCH_VQ_MODEL = None


def _torch_vq_model_cls():
    """Import the reference VQ_model once (re-popping 'models' breaks the
    namespace-package path cache on the second import)."""
    global _TORCH_VQ_MODEL
    if _TORCH_VQ_MODEL is None:
        _install_timm_stub()
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        mod = sys.modules.get("models")
        if mod is not None and REFERENCE not in (
                list(getattr(mod, "__path__", [])) or [""])[0]:
            sys.modules.pop("models", None)
        from models.build import VQ_model

        _TORCH_VQ_MODEL = VQ_model
    return _TORCH_VQ_MODEL


def _torch_reference_model(jcfg, extra=None):
    TorchVQModel = _torch_vq_model_cls()

    kw = dict(
        encoder=jcfg.encoder, classifier="CNN_3D", codebook="LFQ",
        in_channels_dynamic=jcfg.in_channels_dynamic,
        in_channels=jcfg.in_channels,
        en_embed_dim=list(jcfg.en_embed_dim),
        en_depths=list(jcfg.en_depths),
        en_drop_path_rate=0.0, en_drop_rate=0.0,
        codebook_dim=jcfg.codebook_dim, codebook_size=jcfg.codebook_size,
        lambda_entropy=jcfg.lambda_entropy,
        diversity_gamma=jcfg.diversity_gamma,
        lambda_commitment=jcfg.lambda_commitment,
        cls_dim=jcfg.cls_dim, cls_drop_rate=0.0, en_de_pretrained=None,
    )
    kw.update(extra or {})
    tm = TorchVQModel(_Cfg(**kw))
    tm.eval()
    return tm


def _compare_forward(cfg, params, tm, seed=7):
    """Forward the SAME weights through both frameworks."""
    import jax.numpy as jnp
    import torch

    from idee_tpu.models import build_model

    model = build_model(cfg)
    x = np.random.default_rng(seed).normal(
        size=(2, cfg.in_channels_dynamic, cfg.in_channels, cfg.delta_t,
              8, 8)).astype(np.float32)
    with torch.no_grad():
        t_z, t_y, t_anom, t_zq, _ = tm(torch.from_numpy(x))
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out.z), t_z.numpy(),
                               rtol=1e-4, atol=1e-4)
    # code bits: sign decisions can flip for |s| ~ float eps; allow a
    # vanishing fraction of boundary disagreements
    mism = np.mean(np.asarray(out.anomaly) != t_anom.numpy())
    assert mism <= 1e-3, f"anomaly bit mismatch fraction {mism}"
    for v in range(cfg.in_channels_dynamic):
        np.testing.assert_allclose(np.asarray(out.y)[:, v],
                                   t_y[v].numpy(), rtol=1e-4, atol=1e-4)


def _roundtrip(cfg, params):
    from idee_tpu.models.interop import (export_torch_state_dict,
                                         import_torch_state_dict)

    sd = export_torch_state_dict(cfg, params)
    back = import_torch_state_dict(cfg, sd)

    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf, dtype=np.float32),
                                      flat_b[path], err_msg=str(path))
    return sd


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference not mounted")
class TestInteropGolden:
    def test_cnn_export_import_golden(self):
        import torch

        from idee_tpu.config import synthetic_config

        V = 3
        cfg = synthetic_config(
            encoder="CNN_3D", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8,
            cls_dim=8, en_drop_rate=0.0, cls_drop_rate=0.0)
        _, params = _flax_params(cfg)
        sd = _roundtrip(cfg, params)

        tm = _torch_reference_model(cfg)
        tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
        _compare_forward(cfg, params, tm)

    def test_swin_export_import_golden(self):
        import torch

        from idee_tpu.config import synthetic_config

        V = 2
        cfg = synthetic_config(
            encoder="Swin_3D", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[2, 1], en_n_heads=[2, 2],
            en_window_size=[(2, 4, 4), (8, 1, 1)], codebook_dim=8,
            cls_dim=8, en_drop_rate=0.0, en_attn_drop_rate=0.0,
            cls_drop_rate=0.0)
        _, params = _flax_params(cfg)
        sd = _roundtrip(cfg, params)

        tm = _torch_reference_model(cfg, extra=dict(
            en_n_heads=[2, 2], en_window_size=[(2, 4, 4), (8, 1, 1)],
            en_mlp_ratio=4.0, en_attn_drop_rate=0.0, en_qkv_bias=True,
            en_qk_scale=None, en_patch_size=(1, 1, 1), en_patch_norm=False,
            en_use_checkpoint=False))
        tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
        _compare_forward(cfg, params, tm)

    def test_checkpoint_file_roundtrip(self, tmp_path):
        """.pth container: export_checkpoint_file -> import_checkpoint_file."""
        from idee_tpu.config import synthetic_config
        from idee_tpu.models.interop import (export_checkpoint_file,
                                             import_checkpoint_file)

        V = 2
        cfg = synthetic_config(
            encoder="CNN_3D", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8,
            cls_dim=8)
        _, params = _flax_params(cfg)
        path = str(tmp_path / "ref.pth")
        export_checkpoint_file(cfg, params, path, epoch=5)
        back = import_checkpoint_file(cfg, path)

        import jax

        got = dict(jax.tree_util.tree_leaves_with_path(back))
        for p, leaf in jax.tree_util.tree_leaves_with_path(params):
            np.testing.assert_array_equal(
                np.asarray(leaf, dtype=np.float32), got[p], err_msg=str(p))

    def test_pickle_checkpoint_requires_opt_in(self, tmp_path):
        """A checkpoint that needs full unpickling (e.g. an argparse
        Namespace inside, as some reference config.pkl bundles carry) is
        refused unless allow_pickle=True — loading it would execute
        arbitrary pickle code (ADVICE r3)."""
        import argparse

        import pytest
        import torch

        from idee_tpu.config import synthetic_config
        from idee_tpu.models.interop import (export_checkpoint_file,
                                             import_checkpoint_file)

        V = 2
        cfg = synthetic_config(
            encoder="CNN_3D", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8,
            cls_dim=8)
        _, params = _flax_params(cfg)
        path = str(tmp_path / "ref.pth")
        export_checkpoint_file(cfg, params, path, epoch=1)
        payload = torch.load(path, map_location="cpu", weights_only=True)
        payload["config"] = argparse.Namespace(name="x")  # defeats weights_only
        torch.save(payload, path)

        with pytest.raises(RuntimeError, match="allow_pickle"):
            import_checkpoint_file(cfg, path)
        back = import_checkpoint_file(cfg, path, allow_pickle=True)
        assert back  # loads once explicitly allowed

    def test_module_prefix_and_strictness(self):
        """DataParallel 'module.' prefixes strip (build.py:123-124); a
        missing parameter fails loudly."""
        from idee_tpu.config import synthetic_config
        from idee_tpu.models.interop import (export_torch_state_dict,
                                             import_torch_state_dict)

        V = 2
        cfg = synthetic_config(
            encoder="CNN_3D", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8,
            cls_dim=8)
        _, params = _flax_params(cfg)
        sd = export_torch_state_dict(cfg, params)

        prefixed = {"module." + k: v for k, v in sd.items()}
        import_torch_state_dict(cfg, prefixed)  # must not raise

        broken = dict(sd)
        broken.pop("cls.conv1.weight")
        with pytest.raises(KeyError):
            import_torch_state_dict(cfg, broken)

        extra = dict(sd)
        extra["encoder.surprise.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError):
            import_torch_state_dict(cfg, extra)


class TestInteropMamba:
    def test_mamba_roundtrip_and_schema(self):
        """mamba_ssm is CUDA-only, so the torch side can't instantiate
        here; verify the round-trip identity plus that the generated key
        schema matches the mamba_ssm v1 naming (Mamba.py:121-128 ssm
        submodule: in_proj/conv1d/x_proj/dt_proj/A_log/D/out_proj)."""
        from idee_tpu.config import synthetic_config
        from idee_tpu.models.interop import export_torch_state_dict

        V = 2
        cfg = synthetic_config(
            encoder="Mamba", in_channels_dynamic=V,
            variables=[f"var_{i:02d}" for i in range(V)],
            en_embed_dim=[8, 8], en_depths=[1, 1],
            en_window_size=[(2, 4, 4), (8, 1, 1)],
            d_state=[1, 1], d_conv=[3, 3], expand=[1, 1],
            codebook_dim=8, cls_dim=8)
        _, params = _flax_params(cfg)
        sd = _roundtrip(cfg, params)

        for v in range(V):
            for part in ("in_proj.weight", "conv1d.weight", "conv1d.bias",
                         "x_proj.weight", "dt_proj.weight", "dt_proj.bias",
                         "A_log", "D", "out_proj.weight"):
                key = f"encoder.layers_var.{v}.0.blocks.0.ssm.{part}"
                assert key in sd, key
        # depthwise conv shape is the torch Conv1d layout [ch, 1, k]
        w = sd["encoder.layers_var.0.0.blocks.0.ssm.conv1d.weight"]
        assert w.shape == (8, 1, 3), w.shape
        # in_proj is [2*d_inner, d_model] like mamba_ssm v1
        assert sd["encoder.layers_var.0.0.blocks.0.ssm.in_proj.weight"
                  ].shape == (16, 8)
        sd2 = export_torch_state_dict(cfg, params)
        assert set(sd.keys()) == set(sd2.keys())
