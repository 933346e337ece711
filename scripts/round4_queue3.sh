#!/bin/bash
# Round-4 chip queue #3 — runs after round4_queue2.sh frees the chip.
# Covers the remaining measured deliverables of VERDICT r3:
#   * the dangling Swin_3D 1x8 sharded-fit row (+ Mamba 1x8) and the
#     post-lanes-attention Swin batch-2 fit at 200x200 (BASELINE.md
#     memory tables; probes are AOT compiles, no execution)
#   * an LFQ 48x48 anchor arm through the SAME harness as queue2's
#     VQ_EMA/FSQ arms (codebook-variant table needs a same-session
#     LFQ row; its best_F1 checkpoint also feeds the zoo's SimpleNet)
#   * VERDICT #8: one arm at the TRUE 200x200 event density (0.88%,
#     --density_ref_hw 0) with the capped inverse-frequency weighting
#   * VERDICT #5 second half: the 48x48 zoo at >=15 epochs
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/queue4c.log
echo "[q3] start $(date)" >> "$LOG"

# --- 0. memory probes (minutes each; compile-only) ------------------------
echo "[q3] memory probes $(date)" >> "$LOG"
timeout 30m python scripts/memory_fit.py --family real --encoder Swin_3D \
  --batch 1 --hw 512x832 --remat --topology v5e:4x2 --mesh 1x8 \
  > /root/work/fit_swin512_1x8.json 2>&1
timeout 30m python scripts/memory_fit.py --family real --encoder Mamba \
  --batch 1 --hw 512x832 --remat --topology v5e:4x2 --mesh 1x8 \
  > /root/work/fit_mamba512_1x8.json 2>&1
timeout 30m python scripts/memory_fit.py --family synthetic \
  --encoder Swin_3D --batch 2 --hw 200 --remat \
  > /root/work/fit_swin200_b2.json 2>&1
timeout 30m python scripts/memory_fit.py --family real --encoder CNN_3D \
  --batch 1 --hw 512x832 --remat \
  > /root/work/fit_cnn512_b1.json 2>&1
echo "[q3] probes done $(date)" >> "$LOG"

# --- 1. LFQ 48x48 anchor (same harness/cube as queue2's codebook arms) ----
echo "[q3] lfq48 $(date)" >> "$LOG"
timeout 60m python scripts/train_benchmark_accuracy.py \
  --encoder CNN_3D --codebook LFQ --hw 48 --epochs 15 --batch 8 \
  --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
  --out /root/work/acc_cnn48_LFQ.json \
  > /root/work/acc_cnn48_LFQ.log 2>&1
echo "[q3] lfq48 exit=$? $(date)" >> "$LOG"

# --- 2. native-density arm (VERDICT #8) -----------------------------------
echo "[q3] native density $(date)" >> "$LOG"
timeout 3h python scripts/train_benchmark_accuracy.py \
  --encoder CNN_3D --hw 200 --epochs 15 --batch 4 \
  --density_ref_hw 0 --bce_weighting capped \
  --cube_npz /root/work/cube200_native.npz --dir_log /root/work/log \
  --out /root/work/acc_cnn200_native_capped.json \
  > /root/work/acc_cnn200_native_capped.log 2>&1
echo "[q3] native density exit=$? $(date)" >> "$LOG"

# --- 3. 48x48 zoo at 15 epochs (VERDICT #5) -------------------------------
echo "[q3] zoo15 $(date)" >> "$LOG"
timeout 4h python scripts/train_baselines_zoo.py \
  --which deepmil,arnet,rtfm,mgfn,simplenet,steal,uniad \
  --hw 48 --years 40 --epochs 15 \
  --pretrained /root/work/log/acc_CNN_3D_48/model_checkpoints/best_F1_model \
  --out /root/work/zoo48_15ep.json \
  > /root/work/zoo48_15ep.log 2>&1
echo "[q3] zoo15 exit=$? $(date)" >> "$LOG"
echo "[q3] done $(date)" >> "$LOG"
