#!/usr/bin/env python
# ------------------------------------------------------------------
"""Export a trained IDEE-TPU checkpoint into the reference torch format.

Produces a *.pth pickle with the reference's checkpoint schema
({epoch, mean_loss_*, model_state_dict}; utils/utils_train.py:562-584)
loadable by the reference's own models/build.py:120-127 — so results
trained here can be independently re-evaluated with the original torch
tooling (test_synthetic.py et al.).

Usage:
  # from a run directory (reads config.json + model_checkpoints/<alias>)
  python scripts/export_reference_checkpoint.py --run_dir log/exp1 \
      --alias best_F1_model --out exp1_best_F1.pth
  # or from an explicit orbax checkpoint + config flags
  python scripts/export_reference_checkpoint.py \
      --orbax ckpt/imported --encoder Swin_3D --out swin.pth
"""
# ------------------------------------------------------------------

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--run_dir", default=None,
                    help="training run dir (log/<name>)")
    ap.add_argument("--alias", default="best_F1_model")
    ap.add_argument("--orbax", default=None,
                    help="explicit orbax checkpoint path (overrides "
                    "--run_dir/--alias)")
    ap.add_argument("--out", required=True, help="output .pth path")
    args, rest = ap.parse_known_args()

    from idee_tpu.config import Config, load_config, read_arguments

    base = Config()
    if args.run_dir:
        for name in ("config.json", "config.pkl"):
            snap = os.path.join(args.run_dir, name)
            if os.path.exists(snap):
                base = load_config(snap)
                break
    cfg = read_arguments(train=False, print_=False, save=False,
                         argv=rest, defaults=base)

    path = args.orbax
    if path is None:
        if not args.run_dir:
            ap.error("pass --run_dir or --orbax")
        path = os.path.join(args.run_dir, "model_checkpoints", args.alias)
    path = os.path.abspath(path)

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(path)
    meta = restored.get("meta", {}) if isinstance(restored, dict) else {}
    params = restored["state"]["params"] \
        if isinstance(restored, dict) and "state" in restored else restored

    from idee_tpu.models.interop import export_checkpoint_file

    export_checkpoint_file(
        cfg, params, args.out,
        epoch=int(meta.get("epoch", 0)),
        mean_loss_train=float(meta.get("mean_loss_train", float("nan"))),
        mean_loss_validation=float(meta.get("mean_loss_validation",
                                            float("nan"))))
    print(json.dumps({"out": os.path.abspath(args.out),
                      "encoder": cfg.encoder,
                      "epoch": int(meta.get("epoch", 0))}))


if __name__ == "__main__":
    main()
