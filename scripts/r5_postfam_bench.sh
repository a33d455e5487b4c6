#!/bin/bash
# Round-5 final chip job: one full-axes bench pass as soon as the family
# soaks free the chip (r5_families.sh appends "r5_families done" to
# runs/r5_chain.log), writing BENCH_r5_preview.json and committing it.
#
# Why: the only measured r5 bench line (08:47 UTC) was killed before any
# secondary axis finished, and the render/train axes have never been
# compiled this round — the driver's end-of-round bench (840 s budget)
# would spend its whole window cold-compiling them (VERDICT r4 item 5
# failed exactly this way). This pass warms every axis's compile into
# the persistent cache and leaves a fully-populated preview that the
# driver's bench replays as its provisional line, then re-measures warm.
#
# Bail-outs: never start after LAST_START_EPOCH (a late bench must not
# collide with the driver's own run; concurrent attach works but slows
# both), and the bench itself is bounded by timeout + its internal
# budget (headline is emitted before any device work, so a kill at any
# point still leaves a parseable preview).
set -u
cd /root/repo
LOG=runs/r5_chain.log
LAST_START_EPOCH=${LAST_START_EPOCH:?epoch seconds after which we refuse to start}

while true; do
  if grep -q "r5_families done" "$LOG" 2>/dev/null; then break; fi
  if [ "$(date +%s)" -ge "$LAST_START_EPOCH" ]; then
    echo "=== postfam bench: families not done by cutoff, not starting $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  sleep 20
done
if [ "$(date +%s)" -ge "$LAST_START_EPOCH" ]; then
  echo "=== postfam bench: past cutoff at families-done, not starting $(date -u +%FT%TZ) ===" >> "$LOG"
  exit 0
fi

echo "=== postfam full-axes bench start $(date -u +%FT%TZ) ===" >> "$LOG"
GAUSPCC_BENCH_BUDGET_S=1100 timeout 1300 python bench.py \
  > BENCH_r5_preview.json 2> runs/bench_r5_full.err
rc=$?
echo "=== postfam bench rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A BENCH_r5_preview.json runs/bench_r5_full.err runs/r5_chain.log 2>/dev/null
git commit -q -m "Full-axes bench pass after family soaks (r5, rc=$rc)" 2>/dev/null
echo "=== postfam bench done $(date -u +%FT%TZ) ===" >> "$LOG"
