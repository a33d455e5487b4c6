#!/bin/bash
# Auto-resuming codec trainer (same rationale as soak_loop.sh: the TPU
# tunnel drops occasionally; the trainer snapshots full state every
# --state_every steps, so relaunch with --resume_state continues losslessly).
#
#   bash scripts/codec_train_loop.sh model/gauspcgc_r3 --max_steps 30000 ...
set -u
DIR=$1; shift
STALL_S=${STALL_S:-1200}
mkdir -p "$DIR"
LOG="$DIR/loop.log"
for attempt in $(seq 1 40); do
  RESUME=""
  if [ -f "$DIR/train_state.pkl" ]; then RESUME="--resume_state $DIR/train_state.pkl"; fi
  echo "=== codec-train attempt $attempt $(date -u +%FT%TZ) resume=${RESUME:-none} ===" >> "$LOG"
  python -m gauspcc_tpu.codecs.gauspcgc.cli train \
    --model_save_folder "$DIR" $RESUME "$@" >> "$LOG" 2>&1 &
  pid=$!
  code=""
  while true; do
    sleep 60
    if ! kill -0 "$pid" 2>/dev/null; then
      wait "$pid"; code=$?; break
    fi
    now=$(date +%s); mt=$(stat -c %Y "$DIR/train.log" 2>/dev/null || echo 0)
    hb=$(stat -c %Y "$DIR/heartbeat" 2>/dev/null || echo 0)
    if [ "$hb" -gt "$mt" ]; then mt=$hb; fi
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "=== attempt $attempt stalled ${STALL_S}s, killing pid $pid ===" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; code=97; break
    fi
  done
  if [ "$code" -eq 0 ]; then
    echo "=== codec train done (attempt $attempt) ===" >> "$LOG"
    exit 0
  fi
  # Permanent (deterministic) failures must not be retried: round 3 burned
  # ~45 min re-proving the same compile-time HBM OOM 15 times. Transient
  # tunnel/backend outages do not produce these strings.
  if tail -c 200000 "$LOG" | grep -qE "compile permanent error|Ran out of memory in memory space|RESOURCE_EXHAUSTED"; then
    echo "=== permanent compile/OOM error; aborting (no retry) ===" >> "$LOG"
    exit 2
  fi
  echo "=== exited $code; retry in 60s ===" >> "$LOG"
  sleep 60
done
echo "=== gave up after 40 attempts ===" >> "$LOG"
exit 1
