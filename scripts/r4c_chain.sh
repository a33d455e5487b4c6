#!/bin/bash
# Round-4c TPU job chain (post-reboot: the VM reset to the last commit,
# wiping compile caches and the r4b chain before it started). One chip,
# strictly sequential; everything bounded so the round's end can only cut
# the tail, never the head:
#   1. full bench pass — re-warms the XLA compile cache on THIS boot for
#      the driver's end-of-round bench and records fresh numbers with the
#      sibling-packed codec path (VERDICT r3 items 2+4)
#   2. COMPLETE HAC mini-run with the fixed rasterizer (centered
#      D-windows + adaptive caps + clean canary): 5k iters @ 256px sized
#      to finish train->encode->decode->eval inside the session
#      (VERDICT r3 item 1 evidence at reduced scale)
#   3. TC-GS then CAT-3DGS scene soaks on the chip — first ever
#      (VERDICT r3 item 5)
#   4. HAC++ soak, then a short codec fine-tune (sibling-packed train
#      step on-chip, resuming the r2 checkpoint) with any remaining time
set -u
cd /root/repo
LOG=runs/r4c_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"

GAUSPCC_BENCH_BUDGET_S=800 timeout 950 python bench.py \
  > BENCH_r4_preview2.json 2>runs/bench_preview2.err
echo "=== bench rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A BENCH_r4_preview2.json runs/r4c_chain.log 2>/dev/null
git commit -q -m "Fresh-boot bench pass (warm cache for end-of-round bench)" 2>/dev/null

PCC_CKPT=model/gauspcgc/best_model.npz

STALL_S=600 timeout 1500 bash scripts/soak_loop.sh runs/soak_hac_r4c \
  --model hac --iters 5000 --hw 256 --cams 32 --scene textured \
  --lmbda 5e-4 --pcc_ckpt "$PCC_CKPT" \
  --checkpoint_every 1000 --log_every 100
echo "=== hac r4c soak rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A runs/soak_hac_r4c runs/soak_hac_r4c.log runs/r4c_chain.log 2>/dev/null
git commit -q -m "HAC fixed-rasterizer complete mini-run artifacts (r4c)" 2>/dev/null

for fam in tcgs cat3dgs hac_plus; do
  STALL_S=600 timeout 900 bash scripts/soak_loop.sh "runs/soak_${fam}_r4" \
    --model "$fam" --iters 1500 --hw 256 --cams 32 --scene textured \
    --checkpoint_every 500 --log_every 100 --pcc_ckpt "$PCC_CKPT"
  echo "=== $fam soak rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
  git add -A "runs/soak_${fam}_r4" "runs/soak_${fam}_r4.log" runs/r4c_chain.log 2>/dev/null
  git commit -q -m "${fam} on-chip scene soak artifacts (r4)" 2>/dev/null
done

timeout 1200 bash scripts/codec_train_loop.sh model/gauspcgc_r4 \
  --training_data 'data/pcc_corpus_r4/train/*.npy' \
  --val_data 'data/pcc_corpus_r4/val/*.npy' \
  --resume model/gauspcgc/best_model.npz \
  --max_steps 1500 --lr_decay_steps 600,1200 \
  --val_interval 250 --geo_cache 128
echo "=== codec fine-tune rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A model/gauspcgc_r4 runs/r4c_chain.log 2>/dev/null
git commit -q -m "On-chip codec fine-tune from the r2 checkpoint (sibling-packed train step)" 2>/dev/null
echo "=== chain done $(date -u +%FT%TZ) ===" >> "$LOG"
