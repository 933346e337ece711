# ------------------------------------------------------------------
"""Per-epoch scalar history: resume-safe seeding + atomic flush.

The reference keeps no scalar history at all (its trainers only log to
file, utils/utils_train.py); here both drivers flush a ``history.json``
every epoch so a wall-clock kill (the chip queues run under ``timeout``)
loses at most the epoch in flight, and the harvest scripts can fall back
to it when a run never wrote its summary JSON.

Two failure modes observed in the round-4 CERRA run motivated this
module (VERDICT r4 weak #3 / advisor r4):

* **Resume clobber** — each session rewrote history.json from its own
  epoch list, so after an orbax auto-resume the file contained only the
  resumed session's epochs (the round-4 file held epoch 3 alone; epochs
  1-2 survived only in log_file.txt).  ``seed_history`` reloads the
  previous session's file and truncates it to ``start_epoch`` entries
  (resuming from `latest` after epoch k means epochs > k re-run, so any
  later entries are dropped as stale).
* **Torn write** — a SIGTERM between ``open('w')`` truncation and
  ``json.dump`` completion leaves a corrupt file that the harvesters
  silently treat as missing.  ``flush_history`` writes to a tempfile and
  ``os.replace``s it (atomic on POSIX).
"""
# ------------------------------------------------------------------

import json
import os


def seed_history(log_dir, keys, start_epoch):
    """Return a history dict, pre-filled from a prior session on resume.

    ``keys`` lists the scalar series the driver records.  When
    ``start_epoch > 0`` (orbax auto-resume) an existing
    ``log_dir/history.json`` is loaded and each series truncated to
    ``start_epoch`` entries; a missing/corrupt file, or one from a
    session that itself lost epochs, just yields what survives (the
    driver never invents entries it has no numbers for).
    """
    hist = {k: [] for k in keys}
    if start_epoch <= 0:
        return hist
    path = os.path.join(log_dir, "history.json")
    try:
        with open(path) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        return hist
    for k in keys:
        vals = prev.get(k)
        if isinstance(vals, list):
            hist[k] = vals[:start_epoch]
    return hist


def flush_history(log_dir, history):
    """Atomically write ``log_dir/history.json`` (tmp + os.replace).

    Non-serializable entries (the drivers append ``state`` on clean
    completion) are excluded.
    """
    payload = {k: v for k, v in history.items() if k != "state"}
    path = os.path.join(log_dir, "history.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, path)
