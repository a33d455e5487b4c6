#!/bin/bash
# Round-4 TPU job chain. One chip — heavy jobs strictly sequential (a
# second JAX process OOMs while a 512px soak holds HBM, observed r3):
#   1. wait for the running HAC 30k soak wrapper (pid file) to exit
#   2. codec training on the sibling-packed path (model/gauspcgc_r4),
#      wall-clock capped; full-state snapshots every 1000 steps make a
#      later resume lossless
#   3. full bench pass immediately after — primes the XLA compile cache
#      for the driver's end-of-round bench and records the numbers with
#      the fresh codec checkpoint
#   4. TC-GS / CAT-3DGS / HAC++ soaks (that order: TC-GS and CAT-3DGS
#      have never run at scene scale on the chip — VERDICT r3 item 5 —
#      while HAC++ already has a round-2 soak) with whatever chip time
#      remains before the round ends
set -u
cd /root/repo
LOG=/tmp/r4_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"

SOAK_PID=$(cat /tmp/soak_r4.pid 2>/dev/null || echo "")
# bounded wait: a stale pid file recycled by an unrelated process must not
# block the chain forever (ADVICE r3)
WAITED=0
if [ -n "$SOAK_PID" ]; then
  while kill -0 "$SOAK_PID" 2>/dev/null && [ "$WAITED" -lt 21600 ]; do
    sleep 30; WAITED=$((WAITED + 30))
  done
fi
echo "=== hac soak finished $(date -u +%FT%TZ) ===" >> "$LOG"

timeout 6000 bash scripts/codec_train_loop.sh model/gauspcgc_r4 \
  --training_data 'data/pcc_corpus_r4/train/*.npy' \
  --val_data 'data/pcc_corpus_r4/val/*.npy' \
  --max_steps 30000 --lr_decay_steps 11000,24500 \
  --val_interval 500 --geo_cache 128
echo "=== codec train finished rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

GAUSPCC_BENCH_BUDGET_S=1350 timeout 1500 python bench.py > BENCH_r4_preview.json 2>/tmp/bench_preview.err
echo "=== bench preview rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

PCC_CKPT=model/gauspcgc/best_model.npz
if [ -f model/gauspcgc_r4/best_model.npz ]; then PCC_CKPT=model/gauspcgc_r4/best_model.npz; fi
for fam in tcgs cat3dgs hac_plus; do
  timeout 4500 bash scripts/soak_loop.sh "runs/soak_${fam}_r4" \
    --model "$fam" --iters 6000 --hw 512 --cams 64 --scene textured \
    --pcc_ckpt "$PCC_CKPT"
  echo "=== $fam soak finished rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
done
echo "=== chain done $(date -u +%FT%TZ) ===" >> "$LOG"
