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
run_acc Mamba 2 4 95m
echo "[queue2] done $(date)" >> "$LOG"
