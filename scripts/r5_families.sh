#!/bin/bash
# Round-5 endgame takeover: run the TC-GS and CAT-3DGS scene soaks
# (VERDICT r4 item 4 — scheduled and cut in r3 AND r4) sized to the
# REMAINING wall-clock so BOTH reach results.json, instead of the fixed
# 6000-iter/5400s-timeout schedule in r5_chain.sh which would cut
# cat3dgs mid-train with no eval (the exact r4 failure mode: a soak only
# writes results.json after train -> encode -> decode -> eval completes).
#
# Launch AFTER killing the chain bash (between chain steps, never mid-step):
#   DEADLINE_EPOCH=$(date -ud '11:10' +%s) bash scripts/r5_families.sh
set -u
cd /root/repo
LOG=runs/r5_chain.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}
# measured: HAC @512px/64cams = 0.63 s/it; families run 48 cams — assume
# 0.75 s/it to be safe until a real number exists, plus a fixed reserve
# for compile + encode/decode/eval after training.
SPI=${SPI:-0.75}
RESERVE=${RESERVE:-750}
PCC_CKPT=model/gauspcgc/best_model.npz
if [ -f model/gauspcgc_r5/best_model.npz ]; then
  PCC_CKPT=model/gauspcgc_r5/best_model.npz
fi
echo "=== r5_families start $(date -u +%FT%TZ) pcc=$PCC_CKPT ===" >> "$LOG"

FAMS=(tcgs cat3dgs)
for i in "${!FAMS[@]}"; do
  fam=${FAMS[$i]}
  left=$(( ${#FAMS[@]} - i ))
  now=$(date +%s)
  remain=$(( DEADLINE_EPOCH - now ))
  share=$(( remain / left ))
  iters=$(python3 -c "
import sys
share, spi, res = $share, $SPI, $RESERVE
it = int((share - res) / spi)
it = max(1000, min(6000, it))
it = (it // 500) * 500
print(it)")
  if [ "$share" -lt 1200 ]; then
    echo "=== $fam skipped: only ${share}s left $(date -u +%FT%TZ) ===" >> "$LOG"
    continue
  fi
  echo "=== $fam soak start iters=$iters budget=${share}s $(date -u +%FT%TZ) ===" >> "$LOG"
  STALL_S=900 timeout "$share" bash scripts/soak_loop.sh "runs/soak_${fam}_r5" \
    --model "$fam" --iters "$iters" --hw 512 --cams 48 --scene textured \
    --checkpoint_every 1000 --log_every 100 --pcc_ckpt "$PCC_CKPT"
  rc=$?
  echo "=== $fam soak rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
  git add -A "runs/soak_${fam}_r5" "runs/soak_${fam}_r5.log" runs/r5_chain.log 2>/dev/null
  git commit -q -m "${fam} on-chip scene soak, iters sized to window (r5, rc=$rc)" 2>/dev/null
done
echo "=== r5_families done $(date -u +%FT%TZ) ===" >> "$LOG"
