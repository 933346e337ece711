#!/bin/bash
# Round-5 chip chain B — real-world trains + diagnosis arms, value-ordered
# after chain A's cheap stages (VERDICT r4 next-items #1b/#2/#6/#7/#8/#9).
# Stage budgets are sized from MEASURED warm step times (the round-4
# failure mode was budgets sized to compile-laden rates — VERDICT r4 weak
# #7): CERRA warm = 0.401 steps/s => ~9 min/epoch + ~14 min session
# compile; 48x48 fused arms measured ~9 min for 15 epochs in chain A.
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/chain5b.log
echo "[5b] start $(date)" >> "$LOG"

# --- 1. ERA5-Land EUR-11 at its real 412x424 aspect (VERDICT r4 #7;
#        fixture + mmap cache already exist from round 4) ----------------
FIX=/root/work/era5_fix
echo "[5b] era5 train $(date)" >> "$LOG"
timeout 75m python scripts/train_ERA5_Land.py \
  --name era5_eur11_CNN_3D --dir_log /root/work/log \
  --root_ERA5_Land "$FIX/ERA5" --root_NOAA "$FIX/NOAA" \
  --region EUR-11 --cache_root "$FIX/cache" \
  --x_min 0 --x_max 424 --y_min 0 --y_max 412 \
  --years_train "['1990','1991']" --years_val "['1992']" \
  --variables "['d2m','t2m','fal','sp','e','tp','skt','stl1','swvl1']" \
  --in_channels_dynamic 9 --variables_static "[]" \
  --encoder CNN_3D --dtype bfloat16 --batch_size 1 \
  --en_use_checkpoint true --loader_workers 0 \
  --n_epochs 4 \
  --init_scheme lecun --codebook_freeze_out true \
  --lambda_commitment 0 --lambda_anomaly 0 \
  --is_clima_scale false \
  > /root/work/era5_train.log 2>&1
echo "[5b] era5 exit=$? $(date)" >> "$LOG"

# --- 2. CERRA 512x832 completion to 8 epochs in ONE session (VERDICT r4
#        #2): orbax auto-resume from epoch 3's `latest`; history.json
#        epochs 1-3 reconstructed from log_file.txt pre-resume, and the
#        new train/history.py seeding keeps them across this session.
#        Budget: ~14 min compile + 5 warm epochs x ~9 min = ~60 min. ----
CFIX=/root/work/cerra_fix
echo "[5b] cerra resume $(date)" >> "$LOG"
timeout 100m python scripts/train_CERRA.py \
  --name cerra512_CNN_3D --dir_log /root/work/log \
  --root_CERRA "$CFIX/CERRA" --root_NOAA_CERRA "$CFIX/NOAA" \
  --cache_root "$CFIX/cache" \
  --grid_override "(512,832)" --x_min 0 --x_max 832 --y_min 0 --y_max 512 \
  --years_train "['1990','1991','1992']" --years_val "['1993']" \
  --variables_static "[]" \
  --encoder CNN_3D --dtype bfloat16 --batch_size 1 \
  --en_use_checkpoint true --loader_workers 0 \
  --n_epochs 8 \
  --init_scheme lecun --codebook_freeze_out true \
  --lambda_commitment 0 --lambda_anomaly 0 \
  --is_clima_scale false \
  >> /root/work/cerra512_train.log 2>&1
echo "[5b] cerra exit=$? $(date)" >> "$LOG"

# --- 3. Mamba accuracy-gap sweep (VERDICT r4 #7): d_state in {1,4,16}
#        at 48x48 against the chain-A CNN/LFQ anchor, same cube --------
for DS in 1 4 16; do
  echo "[5b] mamba ds$DS $(date)" >> "$LOG"
  timeout 40m python scripts/train_benchmark_accuracy.py \
    --encoder Mamba --d_state "$DS" --hw 48 --epochs 15 --batch 8 \
    --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
    --out "/root/work/acc_mamba48_ds${DS}.json" \
    > "/root/work/acc_mamba48_ds${DS}.log" 2>&1
  echo "[5b] mamba ds$DS exit=$? $(date)" >> "$LOG"
done

# --- 4. native-density arm (VERDICT r4 #1b / r3 #8): 200x200 at the TRUE
#        0.88% event density with capped inverse-frequency BCE; cube
#        pre-generated on the host during chain A ------------------------
echo "[5b] native density $(date)" >> "$LOG"
timeout 2h python scripts/train_benchmark_accuracy.py \
  --encoder CNN_3D --hw 200 --epochs 15 --batch 4 \
  --density_ref_hw 0 --bce_weighting capped \
  --cube_npz /root/work/cube200_native.npz --dir_log /root/work/log \
  --out /root/work/acc_cnn200_native_capped.json \
  > /root/work/acc_cnn200_native_capped.log 2>&1
echo "[5b] native density exit=$? $(date)" >> "$LOG"

# --- 5. 48x48 zoo at 15 epochs (VERDICT r4 #9), pretrained core from
#        chain A's fresh LFQ anchor checkpoint ---------------------------
echo "[5b] zoo15 $(date)" >> "$LOG"
timeout 100m python scripts/train_baselines_zoo.py \
  --which deepmil,arnet,rtfm,mgfn,simplenet,steal,uniad \
  --hw 48 --years 40 --epochs 15 \
  --pretrained /root/work/log/acc_CNN_3D_48/model_checkpoints/best_F1_model \
  --out /root/work/zoo48_15ep.json \
  > /root/work/zoo48_15ep.log 2>&1
echo "[5b] zoo15 exit=$? $(date)" >> "$LOG"
echo "[5b] done $(date)" >> "$LOG"
