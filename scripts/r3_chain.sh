#!/bin/bash
# Round-3 TPU job chain. One chip: the 512px HAC soak OOMs any concurrent
# training process (observed 2026-08-18: codec trainer RESOURCE_EXHAUSTED at
# first grad compile while the soak holds HBM), so heavy jobs run strictly
# in sequence:
#   1. wait for the running HAC soak wrapper (pid file) to exit
#   2. codec training: 30k steps on chip, decay [11k, 24.5k] (the reference
#      110k/[40k,90k] schedule scaled to the budget)
#   3. HAC++ / TC-GS / CAT-3DGS soaks at the same textured-scene recipe
#      (shorter budget: smoke-at-scale, not the flagship run)
set -u
cd /root/repo
LOG=/tmp/r3_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"

SOAK_PID=$(cat /tmp/soak_r3y.pid 2>/dev/null || echo "")
if [ -n "$SOAK_PID" ]; then
  while kill -0 "$SOAK_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== hac soak finished $(date -u +%FT%TZ) ===" >> "$LOG"

bash scripts/codec_train_loop.sh model/gauspcgc_r3 \
  --training_data 'data/pcc_corpus_r3/train/*.npy' \
  --val_data 'data/pcc_corpus_r3/val/*.npy' \
  --max_steps 30000 --lr_decay_steps 11000,24500 \
  --val_interval 1000 --geo_cache 256
echo "=== codec train finished $(date -u +%FT%TZ) ===" >> "$LOG"

PCC_CKPT=model/gauspcgc/best_model.npz
if [ -f model/gauspcgc_r3/best_model.npz ]; then PCC_CKPT=model/gauspcgc_r3/best_model.npz; fi
for fam in hac_plus tcgs cat3dgs; do
  bash scripts/soak_loop.sh "runs/soak_${fam}_r3y" \
    --model "$fam" --iters 10000 --hw 512 --cams 64 --scene textured \
    --pcc_ckpt "$PCC_CKPT"
  echo "=== $fam soak finished $(date -u +%FT%TZ) ===" >> "$LOG"
done
echo "=== chain done $(date -u +%FT%TZ) ===" >> "$LOG"
