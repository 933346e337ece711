#!/bin/bash
# Round-4 closer: a fresh, uncaveated 15/15-epoch Swin_3D accuracy run at
# the published 200x200 geometry under the NEW lanes-attention default
# (VERDICT r3 next-#2: the round-3 row stopped at 13 epochs on the queue's
# 4 h timeout; /tmp was wiped between rounds so this starts from scratch,
# which also re-validates the lanes layout under real multi-epoch
# optimization rather than only equality tests). ~1.5 h of chip time at
# 6.4 steps/s. Run AFTER round4_chain.sh frees the chip.
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/queue4d.log
echo "[q4d] swin15 start $(date)" >> "$LOG"
timeout 3h python scripts/train_benchmark_accuracy.py \
  --encoder Swin_3D --epochs 15 --batch 1 \
  --cube_npz /root/work/cube200.npz --dir_log /root/work/log \
  --out /root/work/acc_Swin_3D_200_r4.json \
  > /root/work/acc_swin200_r4.log 2>&1
echo "[q4d] swin15 exit=$? $(date)" >> "$LOG"
