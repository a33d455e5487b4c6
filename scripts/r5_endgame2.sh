#!/bin/bash
# Round-5 endgame driver (takes over from r5_chain.sh, killed 08:31 UTC).
#
# Why the takeover: the codec retrain aborted on a TPU ResourceExhausted
# at ~step 28 (model/gauspcgc_r5/loop.log) after burning 74 min at
# 16-128 s/step (remote-compile dominated), and the chain's remaining
# fixed schedule (6000-iter family soaks, 5400s timeouts) would have cut
# cat3dgs mid-train with no eval — the exact r4 failure mode. This driver
# reorders the remaining window around what VERDICT r4 actually asks for:
#   1. wait for the in-flight bench (started 08:30) to finish; commit it
#   2. finish the flagship: runs/soak_hac_r5 was cut DURING final metric
#      computation — finish_hac_eval_r5.py resumes the eval and writes
#      results.json (VERDICT item 1's "Done" artifact)
#   3. honest-caps probe (VERDICT item 6; first try died on sys.path)
#   4. tcgs + cat3dgs soaks sized to the remaining window (item 4)
# Chip must be free by ~10:50 UTC for the driver's end-of-round bench.
set -u
cd /root/repo
LOG=runs/r5_chain.log
BENCH_PID=${BENCH_PID:-16669}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}

echo "=== endgame2 start $(date -u +%FT%TZ), waiting on bench pid $BENCH_PID ===" >> "$LOG"
while kill -0 "$BENCH_PID" 2>/dev/null; do sleep 15; done
echo "=== bench exited $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A BENCH_r5_preview.json runs/bench_r5_preview.err runs/r5_chain.log 2>/dev/null
git commit -q -m "Bench preview pass, r2 codec ckpt (rc unobserved: chain bash replaced mid-step)" 2>/dev/null

timeout 1500 python scripts/finish_hac_eval_r5.py --run runs/soak_hac_r5 \
  >> runs/soak_hac_r5.log 2>&1
rc=$?
echo "=== hac eval finish rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A runs/soak_hac_r5 runs/soak_hac_r5.log runs/r5_chain.log 2>/dev/null
git commit -q -m "Finish the cut r5 HAC soak eval -> results.json (rc=$rc)" 2>/dev/null

timeout 900 python scripts/cap_probe_r5.py --run runs/soak_hac_r5 \
  --out runs/cap_probe_r5 >> "$LOG" 2>&1
rc=$?
echo "=== cap probe rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A runs/cap_probe_r5 runs/r5_chain.log 2>/dev/null
git commit -q -m "Honest-caps probe on the r5 scene checkpoint (rc=$rc)" 2>/dev/null

DEADLINE_EPOCH="$DEADLINE_EPOCH" bash scripts/r5_families.sh
echo "=== endgame2 done $(date -u +%FT%TZ) ===" >> "$LOG"
