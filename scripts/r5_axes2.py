"""Re-time render + train with the real-sync fix (d154682) and append the
corrected record to BENCH_r5_preview.json.

The first axes pass (runs/r5_axes.log) compiled both programs into the
persistent cache but timed them with block_until_ready, which no-ops on
the tunneled backend (0.0 / 0.8 ms). This rerun loads warm and times with
the one-scalar-sync batch method. MFU recomputes from the corrected time.

  timeout 420 python scripts/r5_axes2.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from gauspcc_tpu.utils import compile_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREVIEW = os.path.join(REPO, "BENCH_r5_preview.json")


def main():
    compile_cache.enable()
    # start from the last preview record so batch/profile results (if the
    # first pass got them) survive into this, the newest, line
    rec = None
    try:
        lines = [l for l in open(PREVIEW).read().splitlines() if l.strip()]
        rec = json.loads(lines[-1])
    except (OSError, ValueError, IndexError):
        pass
    if rec is None or "extra" not in rec:
        rec = {"metric": "gauspcgc_encdec_points_per_sec", "value": 30697.1,
               "unit": "points/s", "vs_baseline": 32.6758, "extra": {}}
    extra = rec["extra"]
    extra.pop("provisional_from", None)
    for k in ("render_ms_frame", "train_ms_iter", "train_tflops_per_s",
              "train_mfu_pct"):
        extra.pop(k, None)

    t0 = time.time()
    try:
        bench.bench_render(extra)
    except Exception as e:
        extra["render_error"] = repr(e)[:200]
    extra["render2_wall_s"] = round(time.time() - t0, 1)
    t1 = time.time()
    try:
        bench.bench_train_iter(extra)
    except Exception as e:
        extra["train_error"] = repr(e)[:200]
    extra["train2_wall_s"] = round(time.time() - t1, 1)
    extra["axes2_measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime())
    with open(PREVIEW, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
