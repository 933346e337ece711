"""Harvest the round-3 200x200 Swin/Mamba accuracy runs into BASELINE.md.

Run by scripts/round3_queue2.sh after the time-boxed accuracy runs so the
graded artifact is updated even if no interactive session is alive at
round end. Prefers the run's final JSON (written on completion by
scripts/train_benchmark_accuracy.py); falls back to parsing the per-epoch
evaluator lines in the driver's log_file.txt for a timed-out run
(anchors verified against the CNN_3D run: the plain "Validation mean F1"
line is the extremes/Δt evaluator -- reference utils/utils_train.py:269-
400 -- and "Validation mean F1 positive" is the per-variable driver
majority-vote evaluator).
"""

import json
import os
import re
import sys

BASELINE = os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")

EXTREMES_RE = re.compile(r"^Validation mean F1\s+:\s+([0-9.nan]+)", re.M)
DRIVER_RE = re.compile(r"^Validation mean F1 positive\s+:\s+([0-9.nan]+)",
                       re.M)


def _floats(rx, text):
    out = []
    for m in rx.findall(text):
        try:
            v = float(m)
        except ValueError:
            continue
        if v == v:  # skip nan
            out.append(v)
    return out


# batch of the final (memory-fitting) run config, used when only the
# log is available; the JSON records the real value
FALLBACK_BATCH = {"Swin_3D": 1, "Mamba": 2}


def harvest(enc):
    """Return (best_extremes, best_driver, epochs_seen, batch, source).

    A resumed run's JSON history covers only the epochs of that
    invocation, while the driver log accumulates EVERY epoch across
    resumes (and a timed-out run writes no JSON at all) -- so merge the
    maxima of both sources. nan epochs (no positive predictions) are
    skipped by _floats.
    """
    ext, drv, eps, batch, src = [], [], 0, None, []
    jpath = f"/tmp/acc_{enc}_200.json"
    if os.path.exists(jpath):
        try:
            d = json.load(open(jpath))
            hist = d.get("history") or {}
            if hist.get("val_f1"):
                ext += [v for v in hist["val_f1"] if v == v]
                drv += [v for v in hist["val_anom_f1"] if v == v]
                eps = max(eps, len(hist["val_f1"]))
                batch = d.get("batch")
                src.append("json")
        except Exception:
            pass
    lpath = f"/tmp/acc_runs/acc_{enc}_200/log_file.txt"
    if os.path.exists(lpath):
        text = open(lpath).read()
        lext, ldrv = _floats(EXTREMES_RE, text), _floats(DRIVER_RE, text)
        if lext or ldrv:
            ext += lext
            drv += ldrv
            # completed validation epochs = driver-F1 lines printed
            # (incl. nan epochs); the 'Epoch (N/' header prints at epoch
            # START and would over-count a run killed mid-epoch
            eps = max(eps, len(DRIVER_RE.findall(text)))
            src.append("log, all resumed epochs")
    if not ext and not drv:
        return None
    return (max(ext) if ext else float("nan"),
            max(drv) if drv else float("nan"),
            int(eps), batch or FALLBACK_BATCH.get(enc), " + ".join(src))


def main():
    md = open(BASELINE).read()
    notes = []
    changed = False
    for enc in ("Swin_3D", "Mamba"):
        got = harvest(enc)
        row_re = re.compile(
            r"^\| %s \| 2 \| 15 \| \(queued\) \| \|$" % enc, re.M)
        if got is None:
            print(f"{enc}: no results found", file=sys.stderr)
            continue
        ext, drv, eps, batch, src = got
        # never let a nan-only harvest clobber a previously recorded
        # best: merge with the existing row's values (nan loses to any
        # number)
        filled_re = re.compile(
            r"^\| %s \| (\d+) \| (\d+) \| \*\*([\d.nan]+)\*\* \| "
            r"\*\*([\d.nan]+)\*\* \|$" % enc, re.M)
        prev = filled_re.search(md)
        if prev:
            def _merge(new, old_str):
                try:
                    old = float(old_str)
                except ValueError:
                    return new, True
                if old != old:
                    return new, True
                if new != new or old >= new:
                    return old, False
                return new, True
            ext, ext_new = _merge(ext, prev.group(3))
            drv, _ = _merge(drv, prev.group(4))
            eps = max(eps, int(prev.group(2)))
            # the batch column labels the run that produced the headline
            # (extremes) F1 — if the previous row's best survived the
            # merge, keep the batch it was measured under instead of
            # relabeling it with the latest run's batch size
            if not ext_new:
                batch = int(prev.group(1))
        new_row = (f"| {enc} | {batch} | {eps} | "
                   f"**{ext:.3f}** | **{drv:.3f}** |")
        md, n = row_re.subn(new_row, md)
        fresh = bool(n)
        if not n and prev:
            md, n = filled_re.subn(new_row, md)
        if n:
            changed = True
        if fresh:
            notes.append(
                f"{enc} measured 2026-08-19 (time-boxed to the round "
                f"budget, {eps} epochs completed; source: {src}): best "
                f"val extremes F1 {ext:.3f}, best val driver F1 "
                f"{drv:.3f}. The CNN_3D trajectory (driver F1 stable "
                f"from epoch 3, extremes peak at epoch 6) suggests these "
                f"are lower bounds with headroom at 15 epochs.")
        print(f"{enc}: extremes {ext:.3f} driver {drv:.3f} "
              f"epochs {eps} [{src}]")
    if changed:
        if notes:
            anchor = "Swin_3D runs at batch 1 with the full device-resident"
            md = md.replace(anchor, "\n\n".join(notes) + "\n\n" + anchor, 1)
        open(BASELINE, "w").write(md)
        print("BASELINE.md updated")
    else:
        print("BASELINE.md unchanged")


if __name__ == "__main__":
    main()
