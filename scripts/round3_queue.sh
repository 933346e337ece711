#!/bin/bash
# Round-3 compute queue: chain the 200x200 accuracy runs (Swin, Mamba)
# behind the in-flight CNN run, then the SimpleNet-pretrained zoo row.
# The TPU runs one program at a time (CLAUDE.md), so everything is
# strictly sequential. Designed to be launched detached (nohup) so it
# survives the driving session; progress lands in /tmp/queue.log and
# per-run JSONs in /tmp/acc_*_200.json.
set -u
cd /root/repo
LOG=/tmp/queue.log
echo "[queue] start $(date)" >> "$LOG"

# 1. wait for the in-flight CNN accuracy run (if any)
if [ -f /tmp/acc_run.pid ]; then
  PID=$(cat /tmp/acc_run.pid)
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
  echo "[queue] CNN run (pid $PID) finished $(date)" >> "$LOG"
fi

run_acc () {
  ENC=$1; BATCH=$2
  echo "[queue] start $ENC batch=$BATCH $(date)" >> "$LOG"
  timeout 6h python scripts/train_benchmark_accuracy.py \
    --encoder "$ENC" --epochs 15 --batch "$BATCH" \
    --cube_npz /tmp/cube200.npz \
    --out "/tmp/acc_${ENC}_200.json" >> "/tmp/acc_${ENC,,}.log" 2>&1
  RC=$?
  echo "[queue] $ENC batch=$BATCH exit=$RC $(date)" >> "$LOG"
  return $RC
}

# batch 4 first (matches the CNN row); OOM at this geometry is the known
# risk for the heavier backbones -> retry once at batch 2
run_acc Swin_3D 4 || run_acc Swin_3D 2
run_acc Mamba 4 || run_acc Mamba 2

# 2. SimpleNet zoo row with the stable-recipe pretrained backbone
CKPT=""
for d in /tmp/acc_runs/acc_CNN_3D_200/model_checkpoints/best_F1_model \
         /tmp/acc_runs/acc_CNN_3D_200/model_checkpoints/latest; do
  [ -e "$d" ] && CKPT="$d" && break
done
if [ -n "$CKPT" ]; then
  echo "[queue] start simplenet-pretrained ckpt=$CKPT $(date)" >> "$LOG"
  timeout 2h python scripts/train_baselines_zoo.py --which simplenet \
    --hw 48 --years 40 --epochs 6 \
    --pretrained "$CKPT" --out /tmp/zoo_simplenet_pretrained.json \
    >> /tmp/zoo_simplenet_pretrained.log 2>&1
  echo "[queue] simplenet exit=$? $(date)" >> "$LOG"
else
  echo "[queue] no CNN checkpoint found, skipping simplenet row" >> "$LOG"
fi
echo "[queue] done $(date)" >> "$LOG"
