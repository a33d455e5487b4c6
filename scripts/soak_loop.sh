#!/bin/bash
# Auto-resuming soak driver. The TPU tunnel can drop mid-run (observed
# 2026-08-18: backend UNAVAILABLE at iter 7600 of a 30k soak); the soak CLI
# checkpoints every --checkpoint_every iters, so on a crash we relaunch with
# --resume pointing at the latest snapshot. Scene construction is seeded
# (rng 0), so the rebuilt scene is identical across attempts.
#
# A watchdog kills an attempt whose log goes stale for >STALL_S seconds:
# backend outages sometimes hang the client at init instead of raising, and
# a hung attempt would otherwise block the retry loop forever. Normal slow
# phases (scene build ~5 min, first jit ~40 s, eval heartbeats) stay under
# the threshold because they all append log lines.
#
#   bash scripts/soak_loop.sh runs/soak_hac_r3t2 --model hac --iters 30000 ...
set -u
OUT=$1; shift
STALL_S=${STALL_S:-1200}
mkdir -p "$OUT"
for attempt in $(seq 1 40); do
  RESUME=""
  if [ -f "$OUT/train_ckpt.pkl" ]; then RESUME="--resume $OUT/train_ckpt.pkl"; fi
  echo "=== soak attempt $attempt $(date -u +%FT%TZ) resume=${RESUME:-none} ===" >> "$OUT.log"
  python -m gauspcc_tpu.cli.soak --out "$OUT" $RESUME "$@" >> "$OUT.log" 2>&1 &
  pid=$!
  code=""
  while true; do
    sleep 60
    if ! kill -0 "$pid" 2>/dev/null; then
      wait "$pid"; code=$?; break
    fi
    now=$(date +%s); mt=$(stat -c %Y "$OUT.log")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "=== attempt $attempt stalled ${STALL_S}s, killing pid $pid ===" >> "$OUT.log"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; code=97; break
    fi
  done
  if [ "$code" -eq 0 ]; then
    echo "=== soak done (attempt $attempt) ===" >> "$OUT.log"
    exit 0
  fi
  echo "=== soak exited $code; retry in 60s ===" >> "$OUT.log"
  sleep 60
done
echo "=== soak gave up after 40 attempts ===" >> "$OUT.log"
exit 1
