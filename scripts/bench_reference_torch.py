#!/usr/bin/env python
# ------------------------------------------------------------------
"""Time the REFERENCE (torch) train step on this host's CPU.

Anchors bench.py's vs_baseline with a real measurement of the reference
implementation instead of self-progress: builds the reference VQ_model
(reference models/build.py:23) at the bench geometry and times the full
training step exactly as composed by the reference driver
(train_synthetic.py:170-215): forward + BCE + lambda*anomaly-L1 +
per-variable BCE + codebook loss, backward, Adam step.

The reference default encoder is Mamba (config.py:40) which requires the
mamba_ssm CUDA package; on CPU we time CNN_3D and Swin_3D (both pure
torch). timm is not installed here -- the same minimal stub used by the
golden tests is injected (DropPath / trunc_normal_ only).

Usage: python scripts/bench_reference_torch.py [encoder] [steps] [hw]
Prints one JSON line per encoder with steps/sec on this host CPU.
"""
# ------------------------------------------------------------------

import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = lambda t, std=1.0, **kw: (
        torch.nn.init.trunc_normal_(t, std=std))
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def bench_encoder(encoder: str, n_steps: int, hw: int, batch: int) -> float:
    import torch

    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import config as ref_config  # noqa: reference config.py
    from models.build import VQ_model
    from models.losses import Anomaly_L1_loss_synthetic, BCE_loss_synthetic

    argv, sys.argv = sys.argv, [sys.argv[0]]
    try:
        cfg = ref_config.read_arguments(train=True, print=False, save=False)
    finally:
        sys.argv = argv
    cfg.encoder = encoder
    cfg.batch_size = batch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    model = VQ_model(cfg)
    model.train()

    criterion = BCE_loss_synthetic()
    criterion_anomaly = Anomaly_L1_loss_synthetic(
        n_dynamic=cfg.in_channels_dynamic, delta_t=cfg.delta_t,
        dim=cfg.en_embed_dim[-1])
    optimizer = torch.optim.Adam(model.parameters(), lr=cfg.lr,
                                 weight_decay=cfg.weight_decay,
                                 betas=(cfg.beta1, cfg.beta2))

    V, T = cfg.in_channels_dynamic, cfg.delta_t
    data_d = torch.randn(batch, V, cfg.in_channels, T, hw, hw)
    mask_extreme = (torch.rand(batch, hw, hw) < 0.05).float().unsqueeze(1)
    mask_extreme_loss = (torch.rand(batch, hw, hw) < 0.10).float()

    def step():
        optimizer.zero_grad(set_to_none=True)
        pred, pred_y, anomaly, z_q, loss_z_q = model(data_d)
        loss = criterion(pred, mask_extreme)
        loss_anomaly = criterion_anomaly(
            z_q, mask_extreme_loss,
            model.vq.indices_to_codes(
                torch.Tensor([0]).long()).clone().detach())
        loss_var = 0
        for k in range(cfg.in_channels_dynamic):
            loss_var += criterion(pred_y[k], mask_extreme)
        total = loss + loss_anomaly * cfg.lambda_anomaly + loss_var + loss_z_q
        total.backward()
        optimizer.step()
        return float(total)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    encoders = [sys.argv[1]] if len(sys.argv) > 1 else ["CNN_3D", "Swin_3D"]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hw = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    for enc in encoders:
        sps = bench_encoder(enc, n_steps, hw, batch=1)
        print(json.dumps({
            "metric": f"reference torch train steps/sec ({enc}, batch 1, "
                      f"{hw}x{hw}, cpu x{os.cpu_count()})",
            "value": round(sps, 4),
            "unit": "steps/sec",
        }))


if __name__ == "__main__":
    main()
