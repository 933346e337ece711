#!/bin/bash
# Round-3 queue #2: heavy-backbone 200x200 accuracy runs, time-boxed to
# the remaining round budget. The Mamba init crash and the Swin batch-2
# OOM are fixed (see commit "Fix Mamba lecun-init crash; halve
# GroupedLayerNorm HBM temps"), so these runs now execute; epochs are
# set so each run completes inside its timeout and writes its JSON.
# Per-epoch F1 also lands in /tmp/acc_runs/<name>/log_file.txt, so a
# timed-out run is still harvestable.
set -u
cd /root/repo
LOG=/tmp/queue2.log
echo "[queue2] start $(date)" >> "$LOG"

run_acc () {
  ENC=$1; BATCH=$2; EPOCHS=$3; TMO=$4
  echo "[queue2] start $ENC batch=$BATCH epochs=$EPOCHS $(date)" >> "$LOG"
  timeout "$TMO" python scripts/train_benchmark_accuracy.py \
    --encoder "$ENC" --epochs "$EPOCHS" --batch "$BATCH" \
    --cube_npz /tmp/cube200.npz \
    --out "/tmp/acc_${ENC}_200.json" >> "/tmp/acc_${ENC,,}.log" 2>&1
  RC=$?
  echo "[queue2] $ENC exit=$RC $(date)" >> "$LOG"
  return $RC
}

# ~36.5 min/epoch measured for Swin_3D (0.404 steps/s, 884 steps/epoch),
# ~18.5 min/epoch for Mamba (0.796 steps/s)
run_acc Swin_3D 2 3 130m
# Time-guard the Mamba leg: the chip must be free before the driver's
# round-end bench.py run (~01:00 UTC). Scale epochs to what fits.
LEFT_MIN=$(( ( $(date -d '2026-08-19 00:40 UTC' +%s) - $(date +%s) ) / 60 ))
if [ "$LEFT_MIN" -ge 75 ]; then
  run_acc Mamba 2 3 "${LEFT_MIN}m"
elif [ "$LEFT_MIN" -ge 50 ]; then
  run_acc Mamba 2 2 "${LEFT_MIN}m"
elif [ "$LEFT_MIN" -ge 30 ]; then
  run_acc Mamba 2 1 "${LEFT_MIN}m"
else
  echo "[queue2] skip Mamba: only ${LEFT_MIN}m before round-end bench" >> "$LOG"
fi
echo "[queue2] done $(date)" >> "$LOG"
