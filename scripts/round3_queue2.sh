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
# Swin batch 2 OOMs with the full 40-year device cube (+2.1G over HBM);
# batch 1 is the proven bench geometry. Time-box to leave the chip free
# for the driver's round-end bench.py (~01:00 UTC).
LEFT_MIN=$(( ( $(date -d '2026-08-19 00:30 UTC' +%s) - $(date +%s) ) / 60 ))
if [ "$LEFT_MIN" -ge 20 ]; then
  run_acc Swin_3D 1 6 "${LEFT_MIN}m"
else
  echo "[queue2] skip Swin retry: only ${LEFT_MIN}m left" >> "$LOG"
fi
python scripts/harvest_round3_accuracy.py >> "$LOG" 2>&1
# pathspec-limited commit: never sweep unrelated staged work from a
# concurrent session into the automated commit
git commit -q -m "Record round-3 200x200 Swin/Mamba accuracy numbers" \
  -- BASELINE.md >> "$LOG" 2>&1
# Full-step A/B of the pair-folded pure-XLA attention (opt-in path) at
# the bench geometry; ~10 min, chip is free by here. Results land in
# /tmp/ab_*.json for the default-flip decision.
if [ $(( ( $(date -d '2026-08-19 00:40 UTC' +%s) - $(date +%s) ) / 60 )) -ge 15 ]; then
  BENCH_ENCODER=Swin_3D BENCH_REPEAT=2 timeout 12m \
    python bench.py > /tmp/ab_default.json 2>/tmp/ab_default.log
  IDEE_ATTN_XFOLD=1 BENCH_ENCODER=Swin_3D BENCH_REPEAT=2 timeout 12m \
    python bench.py > /tmp/ab_xfold.json 2>/tmp/ab_xfold.log
  echo "[queue2] A/B default: $(cat /tmp/ab_default.json)" >> "$LOG"
  echo "[queue2] A/B xfold:   $(cat /tmp/ab_xfold.json)" >> "$LOG"
fi
echo "[queue2] done $(date)" >> "$LOG"
