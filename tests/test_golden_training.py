# ------------------------------------------------------------------
"""End-to-end training-step golden parity vs the reference.

Grafts ONE set of weights into both the reference torch VQ_model
(encoder + LFQ + classifier) and our VQModel, runs several full
optimization steps (identical batches, same Adam hyperparameters,
constant lr) on both, and compares the loss trajectory step by step.
This exercises the entire training surface at once: forward, the LFQ
straight-through estimator and entropy losses, the BCE/anomaly-L1
composition, gradients, and torch-Adam-equivalent optax updates.
"""
# ------------------------------------------------------------------

import os
import sys

import numpy as np
import pytest

from tests.test_golden_backbones import (_conv_w, _install_timm_stub,
                                         REFERENCE)

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def _t2f_conv(w):  # torch [out,in,kd,kh,kw] -> flax [kd,kh,kw,in,out]
    return np.transpose(w, (2, 3, 4, 1, 0))


def _graft_into_torch(tm, params, V):
    """Copy our flax VQModel params into the reference torch VQ_model."""
    import torch

    def assign(tensor, value):
        assert tuple(tensor.shape) == value.shape, (
            f"{tuple(tensor.shape)} vs {value.shape}")
        with torch.no_grad():
            tensor.copy_(torch.from_numpy(np.ascontiguousarray(value)))

    # packed grouped-conv tree: stacked [V, kd, kh, kw, Cin, Cout] kernels
    # and [V, C] norm params (nn/layers.py GroupedConv3d/GroupedLayerNorm3d)
    enc = params["encoder"]
    for v in range(V):
        for bi in range(2):
            blk = enc[f"block{bi}"]
            tb = tm.encoder.layers_var[v][bi]
            if "down_proj" in blk:
                assign(tb.downsample.proj.weight, np.transpose(
                    np.asarray(blk["down_proj"]["kernel"])[v],
                    (4, 3, 0, 1, 2)))
            assign(tb.conv1.weight, np.transpose(
                np.asarray(blk["conv1"]["kernel"])[v], (4, 3, 0, 1, 2)))
            assign(tb.norm1.weight, np.asarray(blk["norm1"]["scale"])[v])
            assign(tb.norm1.bias, np.asarray(blk["norm1"]["bias"])[v])
            assign(tb.conv2.weight, np.transpose(
                np.asarray(blk["conv2"]["kernel"])[v], (4, 3, 0, 1, 2)))
            assign(tb.norm2.weight, np.asarray(blk["norm2"]["scale"])[v])
            assign(tb.norm2.bias, np.asarray(blk["norm2"]["bias"])[v])
        ph = enc["proj_head"]
        for name, seq in (("proj1", 0), ("proj2", 2)):
            assign(tm.encoder.proj_var[v][seq].weight, np.transpose(
                np.asarray(ph[name]["kernel"])[v], (4, 3, 0, 1, 2)))
            assign(tm.encoder.proj_var[v][seq].bias,
                   np.asarray(ph[name]["bias"])[v])

    vq = params["vq"]
    assign(tm.vq.project_in.weight,
           np.asarray(vq["project_in"]["kernel"]).T)
    assign(tm.vq.project_in.bias, np.asarray(vq["project_in"]["bias"]))
    assign(tm.vq.project_out.weight,
           np.asarray(vq["project_out"]["kernel"]).T)
    assign(tm.vq.project_out.bias, np.asarray(vq["project_out"]["bias"]))

    cls = params["cls"]
    for i, conv in ((0, tm.cls.conv1), (1, tm.cls.conv2), (2, tm.cls.conv3)):
        assign(conv.weight, np.transpose(
            np.asarray(cls["head_joint"][f"Conv3d_{i}"]["Conv_0"]["kernel"]),
            (4, 3, 0, 1, 2)))
        assign(conv.bias, np.asarray(
            cls["head_joint"][f"Conv3d_{i}"]["Conv_0"]["bias"]))
    for v in range(V):
        for name, conv in (("conv1", tm.cls.layers[v].conv1),
                           ("conv2", tm.cls.layers[v].conv2),
                           ("conv3", tm.cls.layers[v].conv3)):
            assign(conv.weight, np.transpose(
                np.asarray(cls["heads_var"][name]["kernel"])[v],
                (4, 3, 0, 1, 2)))
            assign(conv.bias, np.asarray(
                cls["heads_var"][name]["bias"])[v])


class _Cfg:
    """Minimal namespace standing in for the reference argparse config."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_full_train_step_trajectory_matches_reference():
    _install_timm_stub()
    import torch

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    sys.modules.pop("models", None)  # ensure the reference package resolves
    from models.build import VQ_model as TorchVQModel
    from models.losses import (Anomaly_L1_loss_synthetic,
                               BCE_loss_synthetic)

    import jax
    import jax.numpy as jnp
    import optax

    from idee_tpu import losses as jlosses
    from idee_tpu.config import synthetic_config
    from idee_tpu.models import build_model

    V, HW, T = 3, 12, 8
    lr, wd = 1e-3, 0.003
    lam_anom = 100.0

    tcfg = _Cfg(
        encoder="CNN_3D", classifier="CNN_3D", codebook="LFQ",
        in_channels_dynamic=V, in_channels=1,
        en_embed_dim=[8, 8], en_depths=[1, 1], en_drop_path_rate=0.0,
        en_drop_rate=0.0, codebook_dim=8, codebook_size=2,
        lambda_entropy=0.1, diversity_gamma=0.1, lambda_commitment=3.0,
        cls_dim=8, cls_drop_rate=0.0, en_de_pretrained=None,
    )
    tm = TorchVQModel(tcfg)
    tm.train()

    cfg = synthetic_config(
        in_channels_dynamic=V, variables=[f"var_{i:02d}" for i in range(V)],
        en_embed_dim=[8, 8], en_depths=[1, 1], codebook_dim=8, cls_dim=8,
        x_max=HW, y_max=HW, lambda_anomaly=lam_anom,
    )
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    batches = [
        {
            "x": rng.normal(size=(2, V, 1, T, HW, HW)).astype(np.float32),
            "mask_extreme": (rng.random((2, HW, HW)) > 0.9).astype(
                np.float32),
            "mask_extreme_loss": (rng.random((2, HW, HW)) > 0.8).astype(
                np.float32),
        }
        for _ in range(3)
    ]

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "droppath": jax.random.PRNGKey(2)},
        jnp.asarray(batches[0]["x"]), train=False)["params"]
    _graft_into_torch(tm, params, V)

    # --- torch side: the reference train loop body
    # (train_synthetic.py:178-205) with constant lr
    criterion = BCE_loss_synthetic()
    criterion_anomaly = Anomaly_L1_loss_synthetic(n_dynamic=V, delta_t=T,
                                                  dim=8)
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd,
                           betas=(0.9, 0.999))
    t_losses = []
    for b in batches:
        opt.zero_grad(set_to_none=True)
        pred, pred_y, _, z_q, loss_z_q = tm(torch.from_numpy(b["x"]))
        # BCEWithLogits needs target == pred shape [N, 1, H, W]
        me = torch.from_numpy(b["mask_extreme"])[:, None]
        mel = torch.from_numpy(b["mask_extreme_loss"])
        loss = criterion(pred, me)
        loss_anom = criterion_anomaly(
            z_q, mel, tm.vq.indices_to_codes(
                torch.tensor([0]).long()).clone().detach())
        loss_var = sum(criterion(pred_y[k], me) for k in range(V))
        total = loss + loss_anom * lam_anom + loss_var + loss_z_q
        total.backward()
        opt.step()
        t_losses.append(float(total))

    # --- our side: same math, optax Adam-with-L2 (torch Adam semantics)
    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                     optax.scale(-lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, me, mel):
        def loss_fn(p):
            # mask passed into the model: exercises the FUSED anomaly-L1
            # path (losses.anomaly_l1_lfq custom-VJP) against torch autograd
            out = model.apply({"params": p}, x, train=True,
                              mask_extreme_loss=mel,
                              rngs={"dropout": jax.random.PRNGKey(0),
                                    "droppath": jax.random.PRNGKey(0)})
            total, comps = jlosses.total_loss_synthetic(out, me, mel,
                                                        lam_anom)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    p = params
    for b in batches:
        p, opt_state, loss = step(p, opt_state, jnp.asarray(b["x"]),
                                  jnp.asarray(b["mask_extreme"]),
                                  jnp.asarray(b["mask_extreme_loss"]))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3)
