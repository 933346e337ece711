#!/usr/bin/env python
# ------------------------------------------------------------------
"""Import a reference torch checkpoint (*.pth) into an orbax checkpoint.

The reference distributes pretrained models as torch pickles of
{epoch, ..., model_state_dict, ...} (utils/utils_train.py:562-584; README
pretrained table). This CLI converts one into an orbax params checkpoint
that plugs straight into --en_de_pretrained of the train/test CLIs.

The model configuration must match the checkpoint. Pass it either as the
usual CLI flags (same names as the reference config.py) or with
--config_pkl pointing at the run's config.pkl snapshot (reference pickles
of the argparse Namespace load too).

Usage:
  python scripts/import_reference_checkpoint.py \
      --checkpoint best_F1_model.pth --out ckpt/imported \
      --encoder Swin_3D --in_channels_dynamic 6
  python scripts/train_synthetic.py --name exp1 \
      --en_de_pretrained ckpt/imported ...
"""
# ------------------------------------------------------------------

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    # split our flags from the config shim's
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--checkpoint", required=True, help="reference .pth")
    ap.add_argument("--out", required=True, help="orbax output directory")
    ap.add_argument("--config_pkl", default=None,
                    help="config.pkl/.json snapshot to take the model "
                    "configuration from (CLI flags still override)")
    ap.add_argument("--allow_pickle", action="store_true",
                    help="permit full unpickling if weights_only=True "
                    "fails (executes code embedded in the checkpoint — "
                    "only for files you trust)")
    args, rest = ap.parse_known_args()

    from idee_tpu.config import Config, load_config, read_arguments

    if args.config_pkl:
        base = load_config(args.config_pkl)
    else:
        base = Config()
    cfg = read_arguments(train=False, print_=False, save=False,
                         argv=rest, defaults=base)

    from idee_tpu.models.interop import import_checkpoint_file

    params = import_checkpoint_file(cfg, args.checkpoint,
                                    allow_pickle=args.allow_pickle)
    n = sum(v.size for v in __import__("jax").tree.leaves(params))
    print(f"imported {n} parameters ({cfg.encoder} / {cfg.codebook})")

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": {"params": params}}, force=True)
    # StandardCheckpointer writes asynchronously; without the barrier the
    # CLI could exit before the checkpoint is finalized and background
    # write errors would never surface (same reason train/checkpoint.py
    # waits after every save)
    ckptr.wait_until_finished()
    print(f"wrote orbax checkpoint: {path}")
    print("use it with:  --en_de_pretrained " + path)


if __name__ == "__main__":
    main()
