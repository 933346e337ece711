#!/bin/bash
# Round-3 queue #3 (fresh launch; queue #2's live-edited tail never ran --
# bash buffers small scripts, so mid-run edits are ignored: relaunch
# instead of editing).
# 1. folded-attention full-step A/B (short, decides the dispatch default)
# 2. Swin_3D batch-1 200x200 accuracy run, time-boxed
# 3. harvest both accuracy runs into BASELINE.md + commit
set -u
cd /root/repo
LOG=/tmp/queue3.log
echo "[queue3] start $(date)" >> "$LOG"

BENCH_ENCODER=Swin_3D BENCH_REPEAT=2 timeout 12m \
  python bench.py > /tmp/ab_default.json 2>/tmp/ab_default.log
echo "[queue3] A/B default: $(cat /tmp/ab_default.json)" >> "$LOG"
IDEE_ATTN_XFOLD=1 BENCH_ENCODER=Swin_3D BENCH_REPEAT=2 timeout 12m \
  python bench.py > /tmp/ab_xfold.json 2>/tmp/ab_xfold.log
echo "[queue3] A/B xfold:   $(cat /tmp/ab_xfold.json)" >> "$LOG"

# Swin accuracy at batch 1 (batch 2 OOMs with the full device cube);
# time-boxed so the chip is free before the round-end bench (~01:00 UTC)
LEFT_MIN=$(( ( $(date -d '2026-08-19 00:25 UTC' +%s) - $(date +%s) ) / 60 ))
if [ "$LEFT_MIN" -ge 25 ]; then
  echo "[queue3] start Swin_3D batch=1 epochs=6 tmo=${LEFT_MIN}m $(date)" >> "$LOG"
  timeout "${LEFT_MIN}m" python scripts/train_benchmark_accuracy.py \
    --encoder Swin_3D --epochs 6 --batch 1 \
    --cube_npz /tmp/cube200.npz \
    --out /tmp/acc_Swin_3D_200.json >> /tmp/acc_swin_3d.log 2>&1
  echo "[queue3] Swin_3D exit=$? $(date)" >> "$LOG"
else
  echo "[queue3] skip Swin: only ${LEFT_MIN}m left" >> "$LOG"
fi

python scripts/harvest_round3_accuracy.py >> "$LOG" 2>&1
# pathspec-limited commit: never sweep unrelated staged work from a
# concurrent session into the automated commit
git commit -q -m "Record round-3 200x200 Swin/Mamba accuracy numbers" \
  -- BASELINE.md >> "$LOG" 2>&1
echo "[queue3] done $(date)" >> "$LOG"
