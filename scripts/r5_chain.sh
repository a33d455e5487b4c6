#!/bin/bash
# Round-5 TPU job chain — VERDICT r4 "Next round" order, with the round's
# flagship FIRST in the window (r4 inverted this and the flagship died):
#   1. HAC 30k scene soak @512px with the fixed rasterizer (centered
#      D-windows + adaptive caps), compile-aware watchdog (heartbeat
#      file) and canary divergence-abort — through train -> encode ->
#      decode -> eval to results.json (VERDICT item 1)
#   2. codec retrain: >=20k on-chip steps with the remat'd sibling-packed
#      trainer, resumed from the r2 checkpoint; best_model.npz COMMITTED
#      (VERDICT item 3)
#   3. full bench pass (warm cache + fresh codec ckpt) for the driver's
#      end-of-round bench, secondary axes included (VERDICT item 5)
#   4. TC-GS then CAT-3DGS scene soaks — scheduled and skipped in r3 AND
#      r4; they run before any HAC++ repeat (VERDICT item 4)
#   5. cap probe on the trained r5 scene checkpoint: commit the
#      over-budget-Gaussian evidence (VERDICT item 6)
# Every step commits with its exit code in the message (ADVICE r4 low #2:
# no success-implying messages for failed steps).
set -u
cd /root/repo
LOG=runs/r5_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"
PCC_CKPT=model/gauspcgc/best_model.npz

STALL_S=900 timeout 21600 bash scripts/soak_loop.sh runs/soak_hac_r5 \
  --model hac --iters 30000 --hw 512 --cams 64 --scene textured \
  --lmbda 5e-4 --pcc_ckpt "$PCC_CKPT" \
  --checkpoint_every 1000 --log_every 100
rc=$?
echo "=== hac r5 soak rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
# the scene model itself is the durable artifact; runs/** npz is normally
# gitignored but a VM reboot resets to last commit (BASELINE r4) — force-add
if [ -f runs/soak_hac_r5/model.npz ]; then
  git add -f runs/soak_hac_r5/model.npz 2>/dev/null
fi
git add -A runs/soak_hac_r5 runs/soak_hac_r5.log runs/r5_chain.log 2>/dev/null
git commit -q -m "HAC 30k scene soak artifacts (r5, rc=$rc)" 2>/dev/null

timeout 600 python scripts/cap_probe_r5.py --run runs/soak_hac_r5 \
  --out runs/cap_probe_r5 >> "$LOG" 2>&1
rc=$?
echo "=== cap probe rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A runs/cap_probe_r5 runs/r5_chain.log 2>/dev/null
git commit -q -m "Honest-caps probe on the r5 scene checkpoint (rc=$rc)" 2>/dev/null

STALL_S=900 timeout 7800 bash scripts/codec_train_loop.sh model/gauspcgc_r5 \
  --training_data 'data/pcc_corpus_r4/train/*.npy' \
  --val_data 'data/pcc_corpus_r4/val/*.npy' \
  --resume "$PCC_CKPT" \
  --max_steps 21000 --lr_decay_steps 8000,16000 \
  --val_interval 500 --geo_cache 128
rc=$?
echo "=== codec retrain rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -f model/gauspcgc_r5/best_model.npz model/gauspcgc_r5/scalars.jsonl 2>/dev/null
git add -A model/gauspcgc_r5/train.log model/gauspcgc_r5/loop.log runs/r5_chain.log 2>/dev/null
git commit -q -m "On-chip codec retrain from the r2 checkpoint (r5, rc=$rc)" 2>/dev/null
if [ -f model/gauspcgc_r5/best_model.npz ]; then
  PCC_CKPT=model/gauspcgc_r5/best_model.npz
fi

GAUSPCC_BENCH_BUDGET_S=1350 GAUSPCC_PCC_CKPT="$PCC_CKPT" timeout 1500 \
  python bench.py > BENCH_r5_preview.json 2>runs/bench_r5_preview.err
rc=$?
echo "=== bench rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
git add -A BENCH_r5_preview.json runs/bench_r5_preview.err runs/r5_chain.log 2>/dev/null
git commit -q -m "Bench pass with r5 codec checkpoint (rc=$rc)" 2>/dev/null

for fam in tcgs cat3dgs hac_plus; do
  STALL_S=900 timeout 5400 bash scripts/soak_loop.sh "runs/soak_${fam}_r5" \
    --model "$fam" --iters 6000 --hw 512 --cams 48 --scene textured \
    --checkpoint_every 1000 --log_every 100 --pcc_ckpt "$PCC_CKPT"
  rc=$?
  echo "=== $fam soak rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
  git add -A "runs/soak_${fam}_r5" "runs/soak_${fam}_r5.log" runs/r5_chain.log 2>/dev/null
  git commit -q -m "${fam} on-chip scene soak artifacts (r5, rc=$rc)" 2>/dev/null
done
echo "=== chain done $(date -u +%FT%TZ) ===" >> "$LOG"
