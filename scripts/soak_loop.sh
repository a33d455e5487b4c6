#!/bin/bash
# Auto-resuming soak driver. The TPU tunnel can drop mid-run (observed
# 2026-08-18: backend UNAVAILABLE at iter 7600 of a 30k soak); the soak CLI
# checkpoints every --checkpoint_every iters, so on a crash we relaunch with
# --resume pointing at the latest snapshot. Scene construction is seeded
# (rng 0), so the rebuilt scene is identical across attempts.
#
# A watchdog kills an attempt that shows NO liveness for >STALL_S seconds:
# backend outages sometimes hang the client at init instead of raising, and
# a hung attempt would otherwise block the retry loop forever. Liveness =
# max(mtime of the log, mtime of $OUT/heartbeat): the trainer touches the
# heartbeat file every step AND through XLA recompiles / eval sweeps
# (gauspcc_tpu/utils/heartbeat.py), so a cap-growth recompile — which
# killed the round-4c flagship run when only the log was watched — no
# longer reads as a stall. The heartbeat guard is time-bounded, so a truly
# hung device still goes quiet and gets killed.
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
    now=$(date +%s)
    mt=$(stat -c %Y "$OUT.log")
    hb=$(stat -c %Y "$OUT/heartbeat" 2>/dev/null || echo 0)
    if [ "$hb" -gt "$mt" ]; then mt=$hb; fi
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
  if [ "$code" -eq 3 ]; then
    # divergence abort from the clean-render canary: retrying would resume
    # the collapsed checkpoint and re-collapse — surrender the chip
    echo "=== soak diverged (canary abort); NOT retrying ===" >> "$OUT.log"
    exit 3
  fi
  echo "=== soak exited $code; retry in 60s ===" >> "$OUT.log"
  sleep 60
done
echo "=== soak gave up after 40 attempts ===" >> "$OUT.log"
exit 1
