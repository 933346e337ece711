#!/bin/bash
# Round-4 real-world milestone (VERDICT r3 missing #1 / next-#1): train the
# CERRA pipeline at the reference's published geometry — Europe 512x832
# crop, delta_t=8, 6 vars x (mean,std) channels, batch 1
# (dataset/CERRA_dataset.py:100-101, train_CERRA.py:30-334) — on the one
# real 16 GB v5e chip, against the structured 512x832 fixture
# (data/fake.py write_structured_reanalysis; the ~1.1 TB real archive is
# not downloadable here — BASELINE.md risk note).
#
# Prereqs (this script generates them if absent):
#   /root/work/cerra_fix/{CERRA,NOAA}  fixture tree, 5 years (1989 is a
#     lead-in: the indexer's delta_t rollover reads the previous year's
#     directory, reanalysis.py::build_index — the reference handles its
#     archive's first year with the 1984 skip rule instead)
#   /root/work/cerra_fix/cache         mmap cache with VHI labels
#
# CNN_3D is the only backbone whose full train step fits single-chip at
# this geometry (memory-fit table in BASELINE.md: 15.01 GiB; Swin/Mamba
# need the spatial-sharding recipe and >1 chip). device_data stays OFF:
# the program alone leaves <1 GB HBM headroom, so the per-step host
# pipeline (~82 MB/step upload, overlapped by the prefetching loader)
# carries the data.
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/queue4_cerra.log
echo "[cerra] start $(date)" >> "$LOG"

FIX=/root/work/cerra_fix
if [ ! -f "$FIX/CERRA/CERRA_statistic_train.json" ]; then
  echo "[cerra] fixture gen $(date)" >> "$LOG"
  python scripts/data/make_cerra_fixture.py --root "$FIX" \
    --height 512 --width 832 --years 1989,1990,1991,1992,1993 >> "$LOG" 2>&1
fi
if [ ! -d "$FIX/cache" ]; then
  echo "[cerra] cache convert $(date)" >> "$LOG"
  python scripts/convert_reanalysis.py --family CERRA \
    --root_main "$FIX/CERRA" --root_noaa "$FIX/NOAA" \
    --years 1990-1993 --variables wdir10 si10 al hcc lcc msl \
    --out "$FIX/cache" --grid 512x832 \
    --x_min 0 --x_max 832 --y_min 0 --y_max 512 --validate >> "$LOG" 2>&1
fi

EPOCHS=${EPOCHS:-12}
echo "[cerra] train CNN_3D epochs=$EPOCHS $(date)" >> "$LOG"
timeout 5h python scripts/train_CERRA.py \
  --name cerra512_CNN_3D --dir_log /root/work/log \
  --root_CERRA "$FIX/CERRA" --root_NOAA_CERRA "$FIX/NOAA" \
  --cache_root "$FIX/cache" \
  --grid_override "(512,832)" --x_min 0 --x_max 832 --y_min 0 --y_max 512 \
  --years_train "['1990','1991','1992']" --years_val "['1993']" \
  --variables_static "[]" \
  --encoder CNN_3D --dtype bfloat16 --batch_size 1 \
  --en_use_checkpoint true --loader_workers 0 \
  --n_epochs "$EPOCHS" \
  --init_scheme lecun --codebook_freeze_out true \
  --lambda_commitment 0 --lambda_anomaly 0 \
  --is_clima_scale false \
  > /root/work/cerra512_train.log 2>&1
echo "[cerra] train exit=$? $(date)" >> "$LOG"
echo "[cerra] done $(date)" >> "$LOG"
