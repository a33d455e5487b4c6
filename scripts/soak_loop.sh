#!/bin/bash
# Auto-resuming soak driver. The TPU tunnel can drop mid-run (observed
# 2026-08-18: backend UNAVAILABLE at iter 7600 of a 30k soak); the soak CLI
# checkpoints every --checkpoint_every iters, so on a crash we relaunch with
# --resume pointing at the latest snapshot. Scene construction is seeded
# (rng 0), so the rebuilt scene is identical across attempts.
#
#   bash scripts/soak_loop.sh runs/soak_hac_r3t2 --model hac --iters 30000 ...
set -u
OUT=$1; shift
mkdir -p "$OUT"
for attempt in $(seq 1 20); do
  RESUME=""
  if [ -f "$OUT/train_ckpt.pkl" ]; then RESUME="--resume $OUT/train_ckpt.pkl"; fi
  echo "=== soak attempt $attempt $(date -u +%FT%TZ) resume=${RESUME:-none} ===" >> "$OUT.log"
  python -m gauspcc_tpu.cli.soak --out "$OUT" $RESUME "$@" >> "$OUT.log" 2>&1
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== soak done (attempt $attempt) ===" >> "$OUT.log"
    exit 0
  fi
  echo "=== soak exited $code; retry in 60s ===" >> "$OUT.log"
  sleep 60
done
echo "=== soak gave up after 20 attempts ===" >> "$OUT.log"
exit 1
