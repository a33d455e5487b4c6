#!/bin/bash
# Round-3 (resumed session) TPU job chain. One chip: heavy jobs strictly
# sequential (codec trainer RESOURCE_EXHAUSTED if launched while a 512px
# soak holds HBM — observed 2026-08-18).
#   1. wait for the running HAC soak wrapper (pid file) to exit
#   2. codec training on chip: 30k-step schedule (reference 110k/[40k,90k]
#      scaled), auto-resuming snapshots — runs until the round ends; the
#      best-val checkpoint lands in model/gauspcgc_r3/best_model.npz
set -u
cd /root/repo
LOG=/tmp/r3z_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"

SOAK_PID=$(cat /tmp/soak_r3z.pid 2>/dev/null || echo "")
# bounded wait: a stale pid file whose PID was recycled by an unrelated
# long-lived process must not block the chain forever (ADVICE r3)
WAITED=0
if [ -n "$SOAK_PID" ]; then
  while kill -0 "$SOAK_PID" 2>/dev/null && [ "$WAITED" -lt 43200 ]; do
    sleep 30; WAITED=$((WAITED + 30))
  done
fi
echo "=== hac soak finished $(date -u +%FT%TZ) ===" >> "$LOG"

bash scripts/codec_train_loop.sh model/gauspcgc_r3 \
  --training_data 'data/pcc_corpus_r3/train/*.npy' \
  --val_data 'data/pcc_corpus_r3/val/*.npy' \
  --max_steps 30000 --lr_decay_steps 11000,24500 \
  --val_interval 500 --geo_cache 256
echo "=== codec train finished $(date -u +%FT%TZ) ===" >> "$LOG"
