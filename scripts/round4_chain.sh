#!/bin/bash
# Round-4 master chip queue: the three round-4 queues in sequence (the TPU
# runs one program at a time — CLAUDE.md). Each stage is independently
# re-runnable; see the per-stage scripts for what they cover.
set -u
cd /root/repo
mkdir -p /root/work
LOG=/root/work/chain4.log
echo "[chain] start $(date)" >> "$LOG"
bash scripts/round4_cerra.sh
echo "[chain] cerra done $(date)" >> "$LOG"
bash scripts/round4_queue2.sh
echo "[chain] queue2 done $(date)" >> "$LOG"
bash scripts/round4_queue3.sh
echo "[chain] queue3 done $(date)" >> "$LOG"
echo "[chain] all done $(date)" >> "$LOG"
