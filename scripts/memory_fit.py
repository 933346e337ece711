#!/usr/bin/env python
# ------------------------------------------------------------------
"""HBM memory-fit probe: AOT-compile a train step and print XLA's memory
analysis WITHOUT executing (and without building any dataset).

Answers "does backbone X fit at geometry Y x batch B on a 16 GB v5e?"
(VERDICT r3 missing #1: the reference's headline real-world configuration
is the CERRA Europe 512x832 crop, dataset/CERRA_dataset.py:100-101,
trained on 80 GB A100s -- nobody had measured whether it fits here at
all). The probe lowers the full jitted train step (fwd+bwd+update+metric
counters) against ShapeDtypeStruct abstract inputs, compiles for the real
TPU target over the tunnel, and reads CompiledMemoryStats.

Usage:
  python scripts/memory_fit.py --family real --encoder Swin_3D \
      --batch 1 --hw 512x832                      # CERRA geometry
  python scripts/memory_fit.py --family synthetic --encoder Swin_3D \
      --batch 2 --hw 200                          # bench geometry
  python scripts/memory_fit.py --family real --encoder Swin_3D \
      --batch 1 --hw 512x832 --topology v5e:2x2 --mesh 1x4
      # sharded fit: AOT-compile against an ABSTRACT v5e slice
      # (jax.experimental.topologies) -- per-DEVICE memory stats for the
      # data x space GSPMD program without owning the chips
Prints one JSON line per probe: {temp_gb, args_gb, total_gb, fits_16gb}.

Empirically on this container the remote compile helper hard-crashes
(HTTP 500, subprocess exit 1) instead of reporting stats when the
single-chip program's buffer assignment exceeds HBM; a probe "error" row
therefore reads as "does not fit", bracketed by the nearest passing
geometry.
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def probe(family: str, encoder: str, batch: int, H: int, W: int,
          dtype: str, remat: bool, fused_chunk: int = 0,
          topology: str = "", mesh_shape: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    from idee_tpu.config import Config, synthetic_config
    from idee_tpu.models import build_model
    from idee_tpu.train.state import create_train_state

    if family == "real":
        # the reference CERRA configuration: 6 vars x (mean,std) channels
        cfg = Config(encoder=encoder, dtype=dtype, batch_size=batch,
                     in_channels=2, in_channels_dynamic=6, delta_t=8,
                     en_use_checkpoint=remat)
        from idee_tpu.train.steps_real import (_train_step_body_real,
                                               init_epoch_metrics_real)
        step = _train_step_body_real(build_model(cfg), cfg)
        metrics = init_epoch_metrics_real()
        C = 2
        mask_keys = ["mask_extreme", "mask_extreme_loss",
                     "mask_cold_surface", "mask_cold_surface_loss"]
    else:
        cfg = synthetic_config(encoder=encoder, dtype=dtype,
                               batch_size=batch, x_max=W, y_max=H,
                               en_use_checkpoint=remat)
        from idee_tpu.train.steps import (_train_step_body,
                                          init_epoch_metrics)
        step = _train_step_body(build_model(cfg), cfg)
        # timeline vote buffers for a 64-week split (small)
        metrics = init_epoch_metrics((6, 64, H, W))
        C = 1
        mask_keys = ["mask_extreme", "mask_extreme_loss"]

    x_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    S = jax.ShapeDtypeStruct
    batch_s = {"x": S((batch, 6, C, cfg.delta_t, H, W), x_dtype)}
    for k in mask_keys:
        batch_s[k] = S((batch, H, W), jnp.float32)
    if family == "synthetic":
        batch_s["timestep"] = S((batch, 1), jnp.float32)

    # shapes of state/metrics via eval_shape -- no device init at the big
    # geometry (the model is geometry-agnostic so a param init is not
    # needed for compilation either; lower() accepts abstract pytrees)
    model = build_model(cfg)
    state_s = jax.eval_shape(
        lambda x: create_train_state(cfg, model, x, steps_per_epoch=100),
        batch_s["x"])
    metrics_s = jax.tree.map(
        lambda a: S(a.shape, a.dtype), metrics)

    jit_kwargs = {"donate_argnums": (0, 1)}
    mesh_desc = ""
    if topology:
        # sharded fit against an ABSTRACT TPU slice: per-device stats
        # come out of CompiledMemoryStats exactly as for a real slice
        import numpy as np
        from jax.experimental import topologies
        from jax.sharding import NamedSharding, PartitionSpec as P

        from idee_tpu.parallel.mesh import spatial_sharding

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=topology)
        dims = [int(v) for v in (mesh_shape or str(len(topo.devices))
                                 ).split("x")]
        axes = ("data", "space")[:len(dims)] or ("data",)
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(topo.devices).reshape(tuple(dims)), axes)
        rep = NamedSharding(mesh, P())
        # mesh programs must compile the shardable XLA kernel fallbacks
        # (Mosaic kernels crash GSPMD partitioning — Mamba 1x8 probe)
        from idee_tpu.kernels.runtime import set_gspmd_mesh
        set_gspmd_mesh(mesh)
        if "space" in axes:
            # let window_attention re-establish the sharding across the
            # window-partition reshape (runtime.set_spatial_mesh — the
            # unconstrained 1x8 Swin program replicated every attention
            # temp: 18.05 GiB/device, flat vs 1x4)
            from idee_tpu.kernels.runtime import set_spatial_mesh
            set_spatial_mesh(mesh)
            spec = spatial_sharding(mesh)["spec_fn"]
        else:
            spec = lambda rank: NamedSharding(mesh, P("data"))
        batch_sh = {k: spec(len(v.shape)) for k, v in batch_s.items()}
        jit_kwargs["in_shardings"] = (rep, rep, batch_sh)
        mesh_desc = f"{topology} mesh {'x'.join(map(str, dims))}"

    t0 = time.perf_counter()
    lowered = jax.jit(step, **jit_kwargs).lower(
        state_s, metrics_s, batch_s)
    try:
        compiled = lowered.compile()
    except Exception as e:  # OOM at compile time is a valid result
        return {"family": family, "encoder": encoder, "batch": batch,
                "hw": f"{H}x{W}", "dtype": dtype, "remat": remat,
                "mesh": mesh_desc,
                "error": str(e)[:int(os.environ.get("FIT_ERRLEN", "300"))]}
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    out = {
        "family": family, "encoder": encoder, "batch": batch,
        "hw": f"{H}x{W}", "dtype": dtype, "remat": remat,
        "mesh": mesh_desc,
        "temp_gb": round(ma.temp_size_in_bytes / gb, 3),
        "args_gb": round(ma.argument_size_in_bytes / gb, 3),
        "out_gb": round(ma.output_size_in_bytes / gb, 3),
        "alias_gb": round(ma.alias_size_in_bytes / gb, 3),
        "code_mb": round(ma.generated_code_size_in_bytes / 1024 ** 2, 1),
        "compile_s": round(time.perf_counter() - t0, 1),
    }
    # donated args alias outputs; live peak ~ args + temps (+ code)
    out["total_gb"] = round(out["temp_gb"] + out["args_gb"]
                            + out["code_mb"] / 1024, 3)
    out["fits_16gb"] = out["total_gb"] < 15.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="real",
                    choices=["real", "synthetic"])
    ap.add_argument("--encoder", default="Swin_3D")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", default="512x832",
                    help="HxW (e.g. 512x832) or one square size")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--topology", default="",
                    help="abstract TPU slice, e.g. v5e:2x2 / v5e:4x2 "
                         "(jax.experimental.topologies)")
    ap.add_argument("--mesh", default="",
                    help="data x space mesh shape over the topology, "
                         "e.g. 1x4 (default: all devices on data)")
    args = ap.parse_args()
    if "x" in args.hw:
        H, W = (int(v) for v in args.hw.split("x"))
    else:
        H = W = int(args.hw)
    print(json.dumps(probe(args.family, args.encoder, args.batch, H, W,
                           args.dtype, args.remat,
                           topology=args.topology, mesh_shape=args.mesh)),
          flush=True)


if __name__ == "__main__":
    main()
