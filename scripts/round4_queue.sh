#!/bin/bash
# Round-4 opener: finish the 200x200 accuracy runs to the full 15 epochs.
# Launch FIRST THING in round 4 (nohup bash scripts/round4_queue.sh &):
# the runs auto-resume from the round-3 checkpoints in /tmp/acc_runs/
# (Swin epoch ~6, Mamba epoch ~4; CNN_3D is already at 15), so this is
# ~2h for Swin + ~2.4h for Mamba of unattended chip time. The harvest
# step updates BASELINE.md's accuracy rows idempotently and commits.
# If /tmp was wiped between rounds, the runs start from scratch — the
# cube is regenerated into /tmp/cube200.npz by train_benchmark_accuracy.
set -u
cd /root/repo
LOG=/tmp/queue4.log
echo "[queue4] start $(date)" >> "$LOG"

run_acc () {
  ENC=$1; BATCH=$2
  echo "[queue4] start $ENC batch=$BATCH $(date)" >> "$LOG"
  timeout 4h python scripts/train_benchmark_accuracy.py \
    --encoder "$ENC" --epochs 15 --batch "$BATCH" \
    --cube_npz /tmp/cube200.npz \
    --out "/tmp/acc_${ENC}_200.json" >> "/tmp/acc_${ENC,,}.log" 2>&1
  echo "[queue4] $ENC exit=$? $(date)" >> "$LOG"
}

run_acc Swin_3D 1
run_acc Mamba 2

python scripts/harvest_round3_accuracy.py >> "$LOG" 2>&1
# pathspec-limited commit: never sweep unrelated staged work from a
# concurrent session into the automated commit
git commit -q -m "Accuracy table: full 15-epoch Swin/Mamba 200x200 numbers" \
  -- BASELINE.md >> "$LOG" 2>&1
echo "[queue4] done $(date)" >> "$LOG"
