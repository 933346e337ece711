#!/bin/bash
# Round-5 chain D — bf16-scores numerics validation (the +6.4% A/B win
# stays opt-in until an accuracy arm shows the bf16 softmax logits do
# not change training quality): two identical Swin 48x48/10-epoch arms,
# differing ONLY in IDEE_ATTN_SCORES_DTYPE. Runs between chain C's step
# bench and the zoo.
set -u
cd /root/repo
LOG=/root/work/chain5d.log
echo "[5d] start $(date)" >> "$LOG"

echo "[5d] swin48 f32 control $(date)" >> "$LOG"
timeout 40m python scripts/train_benchmark_accuracy.py \
  --encoder Swin_3D --hw 48 --epochs 10 --batch 8 \
  --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
  --name acc_Swin_48_f32 \
  --out /root/work/acc_swin48_f32.json \
  > /root/work/acc_swin48_f32.log 2>&1
echo "[5d] f32 exit=$? $(date)" >> "$LOG"

echo "[5d] swin48 bf16 scores $(date)" >> "$LOG"
timeout 40m env IDEE_ATTN_SCORES_DTYPE=bf16 \
  python scripts/train_benchmark_accuracy.py \
  --encoder Swin_3D --hw 48 --epochs 10 --batch 8 \
  --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
  --name acc_Swin_48_bf16s \
  --out /root/work/acc_swin48_bf16s.json \
  > /root/work/acc_swin48_bf16s.log 2>&1
echo "[5d] bf16 exit=$? $(date)" >> "$LOG"
echo "[5d] done $(date)" >> "$LOG"
