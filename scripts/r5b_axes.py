"""Complete the round-5 secondary bench axes in one dedicated chip pass.

What's still missing after the 10:42 pass (BASELINE.md "Bench axes"):
  - render_ms_frame / train_ms_iter / MFU with a REAL device sync
    (the first pass timed 0.0 / 0.8 ms because block_until_ready no-ops
    over the tunneled backend; bench._force_sync is the fix, d154682)
  - batch-vs-sequential speedup (reference per-file loop:
    compress_ue_4stage_conv.py:249-267)
  - decode-transfer profile (host/upload/device/download ms + bytes)

Runs each axis with its own try/except and wall stamp, then appends ONE
measured (non-provisional) record to BENCH_r5_preview.json so bench.py's
prior_axes carry picks every axis up in the driver's final pass.

  timeout 1800 python scripts/r5b_axes.py
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
    budget = float(os.environ.get("R5B_AXES_BUDGET_S", "1500"))
    t_start = time.time()

    # Seed the record from the last MEASURED preview line so the headline
    # numbers (and their measured_at stamp) survive verbatim; strip any
    # previously-invalid timing keys so only this pass's values remain.
    rec = None
    try:
        lines = [l for l in open(PREVIEW).read().splitlines() if l.strip()]
        for line in reversed(lines):
            cand = json.loads(line)
            if "provisional_from" not in cand.get("extra", {}):
                rec = cand
                break
    except (OSError, ValueError):
        pass
    if rec is None:
        rec = {"metric": "gauspcgc_encdec_points_per_sec", "value": 0.0,
               "unit": "points/s", "vs_baseline": 0.0, "extra": {}}
    extra = rec["extra"]
    for k in ("render_ms_frame", "train_ms_iter", "train_tflops_per_s",
              "train_mfu_pct", "render_wall_s", "train_wall_s",
              "axes_timing_note", "render_skipped", "train_skipped",
              "batch_skipped", "profile_skipped", "render_error",
              "train_error", "batch_error", "profile_error"):
        extra.pop(k, None)

    params, cfg = bench.load_codec(extra)
    extra["axes_codec_ckpt"] = extra.get("codec_ckpt", "untrained")

    # decode profile needs a bitstream written by these params
    tmp = "/tmp/gauspcc_r5b_profile.bin"

    def axis_profile():
        from gauspcc_tpu.codecs.gauspcgc import codec
        pts = bench._bench_cloud()
        codec.compress_point_cloud(pts, params, tmp, config=cfg)
        bench.bench_codec_profile(extra, params, cfg, tmp)

    # batch goes LAST: it pays fresh compiles for the merged-pyramid
    # shapes and overran its slot in the 23:47 pass — an external kill
    # there must not cost the axes measured before it.
    axes = [
        ("render", lambda: bench.bench_render(extra)),
        ("train", lambda: bench.bench_train_iter(extra)),
        ("profile", axis_profile),
        ("batch", lambda: bench.bench_codec_batch(extra, params, cfg)),
    ]

    def emit():
        # append after EVERY axis: the 23:47 pass wrote only at the end
        # and a timeout mid-batch erased the render/train measurements
        extra["axes_measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime())
        with open(PREVIEW, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    for name, fn in axes:
        left = budget - (time.time() - t_start)
        if left < 60:
            extra[f"{name}_skipped"] = f"budget ({left:.0f}s left)"
            continue
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            extra[f"{name}_error"] = repr(e)[:200]
        extra[f"{name}_wall_s"] = round(time.time() - t0, 1)
        emit()
        print(f"axis {name} done in {extra[f'{name}_wall_s']}s", flush=True)

    emit()
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
