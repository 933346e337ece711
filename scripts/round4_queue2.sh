#!/bin/bash
# Round-4 chip queue #2 — runs after round4_cerra.sh frees the chip.
# Covers VERDICT r3 next-items #4 (train VQ-EMA and FSQ end-to-end),
# #7 (ERA5-Land end-to-end smoke at a real CORDEX aspect), and #5's
# measurement half (ARNet diagnosis arms).  Each block is resumable /
# independently re-runnable; results land in /root/work/*.json and are
# harvested into BASELINE.md manually.
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/queue4b.log
echo "[q2] start $(date)" >> "$LOG"

# --- VERDICT #4: non-LFQ codebooks under real optimization (48x48 probe
# geometry, the scale the LFQ recipe was established at) ------------------
for CB in VQ_EMA FSQ; do
  echo "[q2] codebook $CB $(date)" >> "$LOG"
  timeout 100m python scripts/train_benchmark_accuracy.py \
    --encoder CNN_3D --codebook "$CB" --hw 48 --epochs 15 --batch 8 \
    --cube_npz /root/work/cube48.npz \
    --out "/root/work/acc_cnn48_${CB}.json" \
    > "/root/work/acc_cnn48_${CB}.log" 2>&1
  echo "[q2] codebook $CB exit=$? $(date)" >> "$LOG"
done

# --- VERDICT #7: ERA5-Land EUR-11 at its real 412x424 aspect -------------
# Fixture years 1990-1992 avoid the reference's 1981/2024 skip rules
# (dataset/ERA5_Land_dataset.py:244-247) eating most of the first year;
# 1989 is a lead-in year for the indexer's delta_t rollover.
FIX=/root/work/era5_fix
if [ ! -d "$FIX/ERA5/EUR-11" ]; then
  echo "[q2] era5 fixture gen $(date)" >> "$LOG"
  python scripts/data/make_cerra_fixture.py --root "$FIX" --era5 EUR-11 \
    --height 412 --width 424 --years 1989,1990,1991,1992 \
    --variables d2m,t2m,fal,sp,e,tp,skt,stl1,swvl1 >> "$LOG" 2>&1
fi
if [ ! -d "$FIX/cache" ]; then
  python scripts/convert_reanalysis.py --family ERA5_Land --region EUR-11 \
    --root_main "$FIX/ERA5" --root_noaa "$FIX/NOAA" \
    --years 1990-1992 \
    --variables d2m t2m fal sp e tp skt stl1 swvl1 \
    --out "$FIX/cache" \
    --x_min 0 --x_max 424 --y_min 0 --y_max 412 --validate >> "$LOG" 2>&1
fi
echo "[q2] era5 train $(date)" >> "$LOG"
timeout 2h python scripts/train_ERA5_Land.py \
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
echo "[q2] era5 exit=$? $(date)" >> "$LOG"

# --- VERDICT #5 (measurement half): ARNet diagnosis arms ------------------
echo "[q2] arnet diag $(date)" >> "$LOG"
timeout 2h python scripts/diagnose_arnet.py --hw 48 --years 40 --epochs 3 \
  --out /root/work/arnet_diag.json > /root/work/arnet_diag.log 2>&1
echo "[q2] arnet diag exit=$? $(date)" >> "$LOG"
echo "[q2] done $(date)" >> "$LOG"
