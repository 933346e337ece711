# ------------------------------------------------------------------
"""Golden numerical parity: our backbones vs the reference torch encoders.

The reference encoders import timm (DropPath / trunc_normal_ only); timm is
not installed here, so a minimal stub is injected before the import. Weights
are copied torch -> flax (Conv3d [out,in,kd,kh,kw] -> [kd,kh,kw,in,out]) and
outputs compared in eval mode.
"""
# ------------------------------------------------------------------

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity
            return x

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = lambda t, std=1.0, **kw: torch.nn.init.trunc_normal_(
        t, std=std)
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _conv_w(t):
    """torch Conv3d weight -> flax kernel."""
    return np.transpose(t.detach().numpy(), (2, 3, 4, 1, 0))


class TestGoldenCNN3D:
    def test_forward_matches_reference(self):
        _install_timm_stub()
        import torch

        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from models.encoder.CNN_3D import CNN_3D as TorchCNN

        import jax
        import jax.numpy as jnp

        from idee_tpu.nn.cnn3d import CNN_3D

        V, C_in, dims = 3, 1, [8, 8]
        tm = TorchCNN(in_vars=V, in_channels=C_in, out_channels=dims)
        tm.eval()

        model = CNN_3D(in_vars=V, in_channels=C_in, out_channels=dims)
        x = np.random.default_rng(0).normal(
            size=(2, V, C_in, 8, 12, 12)).astype(np.float32)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.asarray(x), train=False)["params"]

        tw = dict(tm.named_parameters())

        def stack(fmt, conv=True, bias=False):
            key = ".bias" if bias else ".weight"
            ws = [tw[fmt.format(v=v) + key] for v in range(V)]
            if bias:
                return np.stack([w.detach().numpy() for w in ws])
            if conv:
                return np.stack([_conv_w(w) for w in ws])
            return np.stack([w.detach().numpy() for w in ws])

        # packed grouped-conv tree: params stay stacked per variable
        # ([V, kd, kh, kw, Cin, Cout] / [V, C]) so the reference torch
        # weights graft 1:1 (see nn/layers.py GroupedConv3d)
        b0 = params["block0"]
        b0["down_proj"]["kernel"] = jnp.asarray(
            stack("layers_var.{v}.0.downsample.proj"))
        b0["conv1"]["kernel"] = jnp.asarray(stack("layers_var.{v}.0.conv1"))
        b0["norm1"]["scale"] = jnp.asarray(
            stack("layers_var.{v}.0.norm1", conv=False))
        b0["norm1"]["bias"] = jnp.asarray(
            stack("layers_var.{v}.0.norm1", bias=True))
        b0["conv2"]["kernel"] = jnp.asarray(stack("layers_var.{v}.0.conv2"))
        b0["norm2"]["scale"] = jnp.asarray(
            stack("layers_var.{v}.0.norm2", conv=False))
        b0["norm2"]["bias"] = jnp.asarray(
            stack("layers_var.{v}.0.norm2", bias=True))
        # block 1: same dims, no downsample
        b1 = params["block1"]
        b1["conv1"]["kernel"] = jnp.asarray(stack("layers_var.{v}.1.conv1"))
        b1["norm1"]["scale"] = jnp.asarray(
            stack("layers_var.{v}.1.norm1", conv=False))
        b1["norm1"]["bias"] = jnp.asarray(
            stack("layers_var.{v}.1.norm1", bias=True))
        b1["conv2"]["kernel"] = jnp.asarray(stack("layers_var.{v}.1.conv2"))
        b1["norm2"]["scale"] = jnp.asarray(
            stack("layers_var.{v}.1.norm2", conv=False))
        b1["norm2"]["bias"] = jnp.asarray(
            stack("layers_var.{v}.1.norm2", bias=True))
        # projection head: Sequential indices 0 and 2
        ph = params["proj_head"]
        ph["proj1"]["kernel"] = jnp.asarray(stack("proj_var.{v}.0"))
        ph["proj1"]["bias"] = jnp.asarray(stack("proj_var.{v}.0", bias=True))
        ph["proj2"]["kernel"] = jnp.asarray(stack("proj_var.{v}.2"))
        ph["proj2"]["bias"] = jnp.asarray(stack("proj_var.{v}.2", bias=True))

        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                     train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestGoldenSwin3D:
    def test_forward_matches_reference(self):
        _install_timm_stub()
        import torch

        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from models.encoder.Swin_3D import Swin_3D as TorchSwin

        import jax
        import jax.numpy as jnp

        from idee_tpu.nn.swin3d import Swin_3D

        V = 2
        kw = dict(embed_dim=[8, 8], depths=[2, 1], num_heads=[2, 2],
                  window_size=[(2, 4, 4), (8, 1, 1)])
        tm = TorchSwin(in_vars=V, in_chans=1, patch_size=(1, 1, 1), **kw)
        tm.eval()

        model = Swin_3D(in_vars=V, in_chans=1, patch_size=(1, 1, 1), **kw)
        x = np.random.default_rng(1).normal(
            size=(1, V, 1, 8, 8, 8)).astype(np.float32)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.asarray(x), train=False)["params"]

        tw = {k: v.detach().numpy() for k, v in tm.named_parameters()}

        def put(dst, key, value):
            assert dst[key].shape == value.shape, (
                f"{key}: {dst[key].shape} vs {value.shape}")
            dst[key] = jnp.asarray(value)

        # packed tree: GroupedDense/GroupedConv3d params stacked per
        # variable, same shapes as the reference weights stacked on axis 0
        for si, depth in enumerate(kw["depths"]):
            stage = params[f"stage{si}"]
            # downsample patch embed only where the stage changes dims
            # (Swin_3D.py:417-420)
            if f"layers_var.0.{si}.downsample.proj.weight" in tw:
                assert "downsample" in stage, f"stage{si} lacks downsample"
                put(stage["downsample"]["proj"], "kernel", np.stack(
                    [_conv_w(torch.from_numpy(
                        tw[f"layers_var.{v}.{si}.downsample.proj.weight"]))
                     for v in range(V)]))
                put(stage["downsample"]["proj"], "bias", np.stack(
                    [tw[f"layers_var.{v}.{si}.downsample.proj.bias"]
                     for v in range(V)]))
            else:
                assert "downsample" not in stage, f"stage{si} extra embed"
            for d in range(depth):
                blk = stage[f"block{d}"]
                pre = f"layers_var.{{v}}.{si}.blocks.{d}"
                put(blk["attn"], "relative_position_bias_table", np.stack(
                    [tw[pre.format(v=v)
                        + ".attn.relative_position_bias_table"]
                     for v in range(V)]))
                # torch Linear weight [out, in] -> flax kernel [in, out]
                for tname, fname in (("attn.qkv", "qkv"),
                                     ("attn.proj", "proj")):
                    put(blk["attn"][fname], "kernel", np.stack(
                        [tw[f"{pre.format(v=v)}.{tname}.weight"].T
                         for v in range(V)]))
                    put(blk["attn"][fname], "bias", np.stack(
                        [tw[f"{pre.format(v=v)}.{tname}.bias"]
                         for v in range(V)]))
                for ti, fi in (("mlp.fc1", "mlp_fc1"), ("mlp.fc2",
                                                        "mlp_fc2")):
                    put(blk[fi], "kernel", np.stack(
                        [tw[f"{pre.format(v=v)}.{ti}.weight"].T
                         for v in range(V)]))
                    put(blk[fi], "bias", np.stack(
                        [tw[f"{pre.format(v=v)}.{ti}.bias"]
                         for v in range(V)]))
        ph = params["proj"]
        for name, seq in (("proj1", 0), ("proj2", 2)):
            put(ph[name], "kernel", np.stack(
                [_conv_w(torch.from_numpy(
                    tw[f"proj_var.{v}.{seq}.weight"])) for v in range(V)]))
            put(ph[name], "bias", np.stack(
                [tw[f"proj_var.{v}.{seq}.bias"] for v in range(V)]))

        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                     train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestGoldenPatchMerging:
    def test_matches_reference(self):
        """PackedPatchMerging vs the reference PatchMerging
        (Swin_3D.py:290-335; defined-but-unused in the default path)."""
        _install_timm_stub()
        import torch

        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from models.encoder.Swin_3D import PatchMerging as TorchPM

        import jax
        import jax.numpy as jnp

        from idee_tpu.nn.swin3d import PackedPatchMerging

        V, C = 2, 8
        tms = [TorchPM(dim=C) for _ in range(V)]
        for tm in tms:
            tm.eval()

        model = PackedPatchMerging(n_groups=V, dim=C)
        x = np.random.default_rng(0).normal(
            size=(2, 4, 6, 6, V * C)).astype(np.float32)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.asarray(x))["params"]
        params["norm"]["scale"] = jnp.asarray(np.stack(
            [tm.norm.weight.detach().numpy() for tm in tms]))
        params["norm"]["bias"] = jnp.asarray(np.stack(
            [tm.norm.bias.detach().numpy() for tm in tms]))
        params["reduction"]["kernel"] = jnp.asarray(np.stack(
            [tm.reduction.weight.detach().numpy().T for tm in tms]))

        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            for v, tm in enumerate(tms):
                xt = torch.from_numpy(x[..., v * C:(v + 1) * C])
                want = tm(xt).numpy()
                np.testing.assert_allclose(
                    got[..., v * 2 * C:(v + 1) * 2 * C], want,
                    rtol=1e-4, atol=1e-5, err_msg=f"var {v}")
