#!/bin/bash
# Round-5 chip chain A — the cheap stalled round-4 stages, value-ordered
# (VERDICT r4 "Next round" #1b: run the cheap stages FIRST, long trains
# later as resumable filler).  Every stage here is a fresh run (no
# checkpoint resume), so it is safe to launch before the history-resume
# fix lands; each stage writes its own summary JSON with the per-epoch
# history.json flush as fallback.  Budgets are sized from measured round-3
# step times (48x48 CNN fused epochs ran ~25 min for 15 epochs).
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/chain5a.log
echo "[5a] start $(date)" >> "$LOG"

# --- 1. LFQ 48x48 anchor (also generates/saves cube48.npz for the
#        VQ_EMA/FSQ arms; VERDICT r4 #5 needs a same-harness LFQ row) ----
echo "[5a] lfq48 $(date)" >> "$LOG"
timeout 60m python scripts/train_benchmark_accuracy.py \
  --encoder CNN_3D --codebook LFQ --hw 48 --epochs 15 --batch 8 \
  --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
  --out /root/work/acc_cnn48_LFQ.json \
  > /root/work/acc_cnn48_LFQ.log 2>&1
echo "[5a] lfq48 exit=$? $(date)" >> "$LOG"

# --- 2-3. VQ_EMA / FSQ under real optimization (VERDICT r4 #5) ----------
for CB in VQ_EMA FSQ; do
  echo "[5a] codebook $CB $(date)" >> "$LOG"
  timeout 50m python scripts/train_benchmark_accuracy.py \
    --encoder CNN_3D --codebook "$CB" --hw 48 --epochs 15 --batch 8 \
    --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
    --out "/root/work/acc_cnn48_${CB}.json" \
    > "/root/work/acc_cnn48_${CB}.log" 2>&1
  echo "[5a] codebook $CB exit=$? $(date)" >> "$LOG"
done

# --- 4. ARNet diagnosis arms (VERDICT r4 #1b, r3 #5) --------------------
echo "[5a] arnet diag $(date)" >> "$LOG"
timeout 50m python scripts/diagnose_arnet.py --hw 48 --years 40 --epochs 3 \
  --out /root/work/arnet_diag.json > /root/work/arnet_diag.log 2>&1
echo "[5a] arnet diag exit=$? $(date)" >> "$LOG"

# --- 5. memory probes (AOT compiles, minutes each; VERDICT r4 #3:
#        the dangling 1x8 rows queue3 never ran) -------------------------
echo "[5a] probes $(date)" >> "$LOG"
timeout 15m python scripts/memory_fit.py --family real --encoder Swin_3D \
  --batch 1 --hw 512x832 --remat --topology v5e:4x2 --mesh 1x8 \
  > /root/work/fit_swin512_1x8.json 2>&1
timeout 15m python scripts/memory_fit.py --family real --encoder Mamba \
  --batch 1 --hw 512x832 --remat --topology v5e:4x2 --mesh 1x8 \
  > /root/work/fit_mamba512_1x8.json 2>&1
timeout 15m python scripts/memory_fit.py --family synthetic \
  --encoder Swin_3D --batch 2 --hw 200 --remat \
  > /root/work/fit_swin200_b2.json 2>&1
echo "[5a] probes done $(date)" >> "$LOG"

# --- 6. post-lanes flagship profile (VERDICT r4 #4: replace the stale
#        round-3 segment table; identifies the dominant backward op) -----
echo "[5a] profile swin $(date)" >> "$LOG"
timeout 25m python scripts/profile_step.py --encoder Swin_3D --hw 200 \
  --batch 1 --out /root/work/profile_r5_swin.json \
  > /root/work/profile_r5_swin.log 2>&1
echo "[5a] profile exit=$? $(date)" >> "$LOG"
echo "[5a] done $(date)" >> "$LOG"
