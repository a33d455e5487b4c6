#!/bin/bash
# After the r4b chain (HAC 30k soak + family soaks) releases the chip,
# retrain the geometry codec with contention-safe settings.
#
# The 16:48 crash of the first r4 codec train was chip CONTENTION, not a
# single-process OOM: a stale pid file made the chain start bench.py while
# the trainer held HBM. This waiter polls for the actual TPU-holding
# processes instead of a pid file. geo_cache is also sized down (the
# device-resident geometry cache plus the finest-level grad program must
# fit HBM together) and patches capped at 100k points so the largest
# level bucket stays at the proven 65536 groups.
set -u
cd /root/repo
LOG=/tmp/r4_codec_after_chain.log
echo "=== waiter start $(date -u +%FT%TZ) ===" >> "$LOG"
WAITED=0
while [ "$WAITED" -lt 64800 ]; do
  if ! pgrep -f "gauspcc_tpu.cli.soak" > /dev/null \
     && ! pgrep -f "scripts/r4b_chain.sh" > /dev/null \
     && ! pgrep -f "bench.py" > /dev/null; then
    break
  fi
  sleep 60; WAITED=$((WAITED + 60))
done
echo "=== chip free, codec train starts $(date -u +%FT%TZ) ===" >> "$LOG"
STALL_S=2400 timeout 10000 bash scripts/codec_train_loop.sh model/gauspcgc_r4 \
  --training_data 'data/pcc_corpus_r4/train/*.npy' \
  --val_data 'data/pcc_corpus_r4/val/*.npy' \
  --max_steps 30000 --lr_decay_steps 11000,24500 \
  --val_interval 500 --geo_cache 32 --max_patch_points 100000
echo "=== codec train rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
