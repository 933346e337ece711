# ------------------------------------------------------------------
"""Checkpointing via orbax.

The reference saves best_loss / best_F1 / best_train torch pickles with
{epoch, losses, model_state_dict, optimizer_state_dict}
(reference: utils/utils_train.py:562-584) and never restores optimizer
state. Here: orbax checkpoints keep the FULL train state (params + opt state
+ step + epoch + losses), with the same best-loss / best-F1 aliases, plus
true auto-resume (the reference has none -- crash means manual restart from
en_de_pretrained, models/build.py:120-127).
"""
# ------------------------------------------------------------------

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Named-alias checkpoints: best_loss_model / best_F1_model / latest."""

    ALIASES = ("best_loss_model", "best_F1_model", "best_train_model", "latest")

    def __init__(self, directory: str):
        self.directory = os.path.abspath(
            os.path.join(directory, "model_checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, alias: str) -> str:
        return os.path.join(self.directory, alias)

    @staticmethod
    def _normalize(state):
        """Empty extra_vars ({}) -> None: orbax drops empty subtrees on
        save, so a {} in the restore target would mismatch the on-disk
        structure. None is an empty pytree on both sides."""
        if hasattr(state, "extra_vars") and not state.extra_vars:
            return state.replace(extra_vars=None)
        return state

    def save(self, alias: str, state, epoch: int,
             mean_loss_train: float = float("nan"),
             mean_loss_val: float = float("nan")) -> None:
        assert alias in self.ALIASES, alias
        payload = {
            "state": jax.device_get(self._normalize(state)),
            "meta": {
                "epoch": np.asarray(epoch),
                "mean_loss_train": np.asarray(mean_loss_train),
                "mean_loss_validation": np.asarray(mean_loss_val),
            },
        }
        path = self._path(alias)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, alias: str, target_state) -> Optional[Dict[str, Any]]:
        path = self._path(alias)
        if not os.path.exists(path):
            return None
        target_state = self._normalize(target_state)
        payload = {
            "state": target_state,
            "meta": {
                "epoch": np.asarray(0),
                "mean_loss_train": np.asarray(np.nan),
                "mean_loss_validation": np.asarray(np.nan),
            },
        }
        try:
            restored = self._ckptr.restore(path, payload)
        except ValueError as e:
            # structure drift (e.g. checkpoint from an older model config):
            # auto-resume must not brick training -- start fresh
            print(f"WARNING: could not restore checkpoint {path}: {e}")
            return None
        return restored

    def restore_params(self, alias_or_path: str, target_params):
        """Load params only (the reference's en_de_pretrained path,
        models/build.py:120-127)."""
        path = alias_or_path
        if not os.path.isabs(path) and not os.path.exists(path):
            path = self._path(alias_or_path)
        restored = ocp.StandardCheckpointer().restore(path)
        params = restored["state"]["params"] if "state" in restored else restored
        # shape-check against the target tree
        flat_t = jax.tree_util.tree_leaves_with_path(target_params)
        flat_r = jax.tree_util.tree_leaves_with_path(params)
        if len(flat_t) != len(flat_r):
            raise ValueError("pretrained checkpoint tree mismatch")
        return params

    def has(self, alias: str) -> bool:
        return os.path.exists(self._path(alias))


def load_pretrained_params(path: str, target_params):
    """Standalone params loader for en_de_pretrained checkpoints."""
    restored = ocp.StandardCheckpointer().restore(path)
    if isinstance(restored, dict) and "state" in restored:
        return restored["state"]["params"]
    return restored
