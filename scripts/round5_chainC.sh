#!/bin/bash
# Round-5 chip chain C — runs after chain B frees the chip.
#  1. ERA5-Land EUR-11 retry against the corrected 9-variable fixture
#     (the round-4 fixture only carried 6 of the reference's 9 vars —
#     KeyError 'skt'; era5_fix9 regenerated with the full list)
#  2. CERRA device-compute step time (upload-vs-compute bound, VERDICT
#     r4 weak #4)
#  3. VQ-EMA + commitment ablation (the diagnosis said the commitment
#     term is the missing encoder-scale anchor)
#  4. Swin attention A/B: bf16 score accumulation, Pallas kernel —
#     measurements only; default flips happen after reading them
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/chain5c.log
echo "[5c] start $(date)" >> "$LOG"

FIX=/root/work/era5_fix9
echo "[5c] era5 retry $(date)" >> "$LOG"
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
echo "[5c] era5 exit=$? $(date)" >> "$LOG"

# --- attention A/B (each ~4-6 min; BENCH_* envs pin the workload) ------
echo "[5c] bench lanes-f32 (control) $(date)" >> "$LOG"
timeout 20m env BENCH_ENCODER=Swin_3D python bench.py \
  > /root/work/bench_swin_control.json 2>&1
echo "[5c] bench bf16-scores $(date)" >> "$LOG"
timeout 20m env BENCH_ENCODER=Swin_3D IDEE_ATTN_SCORES_DTYPE=bf16 \
  python bench.py > /root/work/bench_swin_bf16scores.json 2>&1
echo "[5c] bench pallas-attn $(date)" >> "$LOG"
timeout 20m env BENCH_ENCODER=Swin_3D IDEE_ATTN_PALLAS=1 IDEE_ATTN_LANES=0 \
  python bench.py > /root/work/bench_swin_pallas.json 2>&1

# batch-2 + remat: the round-5 probe measured the remat batch-2 program
# at 4.81 GB (vs 18.1 without remat) — samples/s candidate
echo "[5c] bench batch2-remat $(date)" >> "$LOG"
timeout 20m env BENCH_ENCODER=Swin_3D BENCH_BATCH=2 BENCH_REMAT=1 \
  python bench.py > /root/work/bench_swin_b2remat.json 2>&1

# final three-encoder headline on the default path (also verify step 3)
echo "[5c] bench headline $(date)" >> "$LOG"
timeout 30m python bench.py > /root/work/bench_headline_r5.json 2>&1

# --- clock-permitting tail: anchored VQ-EMA, device step bound, zoo15 ---
echo "[5c] vq_ema commit arm $(date)" >> "$LOG"
timeout 40m python scripts/train_benchmark_accuracy.py \
  --encoder CNN_3D --codebook VQ_EMA --lambda_commitment 0.25 \
  --hw 48 --epochs 15 --batch 8 \
  --cube_npz /root/work/cube48.npz --dir_log /root/work/log \
  --out /root/work/acc_cnn48_VQ_EMA_commit.json \
  > /root/work/acc_cnn48_VQ_EMA_commit.log 2>&1
echo "[5c] vq_ema commit exit=$? $(date)" >> "$LOG"

echo "[5c] cerra step bench $(date)" >> "$LOG"
timeout 25m python scripts/bench_real_step.py --encoder CNN_3D \
  --hw 512x832 --out /root/work/cerra_step_bench.json \
  > /root/work/cerra_step_bench.log 2>&1
echo "[5c] cerra step exit=$? $(date)" >> "$LOG"

echo "[5c] zoo15 $(date)" >> "$LOG"
timeout 100m python scripts/train_baselines_zoo.py \
  --which deepmil,arnet,rtfm,mgfn,simplenet,steal,uniad \
  --hw 48 --years 40 --epochs 15 \
  --pretrained /root/work/log/acc_CNN_3D_48/model_checkpoints/best_F1_model \
  --out /root/work/zoo48_15ep.json \
  > /root/work/zoo48_15ep.log 2>&1
echo "[5c] zoo15 exit=$? $(date)" >> "$LOG"
echo "[5c] done $(date)" >> "$LOG"
