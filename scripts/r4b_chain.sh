#!/bin/bash
# Round-4b TPU job chain (after the renderer root-cause fix, commit
# ab38ff6). One chip — strictly sequential:
#   1. wait for the running codec train loop (pid file) to exit
#   2. full bench pass with the fresh codec checkpoint — also primes the
#      XLA compile cache for the driver's end-of-round bench
#   3. HAC 30k soak with the fixed rasterizer (centered D-windows +
#      adaptive caps + clean-render canary) — VERDICT r3 item 1
#   4. TC-GS / CAT-3DGS / HAC++ soaks with whatever chip time remains
set -u
cd /root/repo
LOG=/tmp/r4b_chain.log
echo "=== chain start $(date -u +%FT%TZ) ===" >> "$LOG"

CT_PID=$(cat /tmp/codec_train.pid 2>/dev/null || echo "")
WAITED=0
if [ -n "$CT_PID" ]; then
  while kill -0 "$CT_PID" 2>/dev/null && [ "$WAITED" -lt 10800 ]; do
    sleep 30; WAITED=$((WAITED + 30))
  done
fi
echo "=== codec train finished $(date -u +%FT%TZ) ===" >> "$LOG"

GAUSPCC_BENCH_BUDGET_S=1350 timeout 1500 python bench.py > BENCH_r4_preview.json 2>/tmp/bench_preview.err
echo "=== bench preview rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

PCC_CKPT=model/gauspcgc/best_model.npz
if [ -f model/gauspcgc_r4/best_model.npz ]; then PCC_CKPT=model/gauspcgc_r4/best_model.npz; fi

timeout 28800 bash scripts/soak_loop.sh runs/soak_hac_r4b \
  --model hac --iters 30000 --hw 512 --cams 64 --scene textured \
  --lmbda 5e-4 --pcc_ckpt "$PCC_CKPT" \
  --checkpoint_every 2000 --log_every 200
echo "=== hac soak finished rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"

for fam in tcgs cat3dgs hac_plus; do
  timeout 4500 bash scripts/soak_loop.sh "runs/soak_${fam}_r4" \
    --model "$fam" --iters 6000 --hw 512 --cams 64 --scene textured \
    --pcc_ckpt "$PCC_CKPT"
  echo "=== $fam soak finished rc=$? $(date -u +%FT%TZ) ===" >> "$LOG"
done
echo "=== chain done $(date -u +%FT%TZ) ===" >> "$LOG"
