"""Measure the never-recorded bench secondary axes directly (r5 endgame).

The bench headline (codec enc+dec pts/s) is tunnel-latency/program-load
bound: ~10-15 min of wall per process before the first secondary axis can
start, which is how BENCH_r04 and both r5 passes ended with every
VERDICT-tracked axis budget-skipped. This driver spends a chip window on
ONLY the missing axes — render ms/frame, HAC train ms/iter + MFU, batch8
speedup, decode-transfer profile — reusing bench.py's own axis functions
so the numbers are definitionally the bench's, then appends an enriched
record to BENCH_r5_preview.json: the 08:47 measured headline carried
forward untouched, with `axes_measured_at` marking when these axes ran.

  timeout 1200 python scripts/r5_axes.py
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

# The measured 08:47 headline (commit 28e5dec); axes attach to it.
HEADLINE = {
    "metric": "gauspcgc_encdec_points_per_sec", "value": 30697.1,
    "unit": "points/s", "vs_baseline": 32.6758,
}
HEADLINE_EXTRA = {
    "codec_trained": True, "codec_ckpt": "model/gauspcgc/best_model.npz",
    "codec_enc_points_per_sec": 73042.7,
    "codec_dec_points_per_sec": 52949.9, "codec_bpp": 11.2778,
    "measured_at": "2026-08-20T08:47:46Z",
}


def emit(extra: dict) -> None:
    rec = dict(HEADLINE)
    rec["extra"] = {**HEADLINE_EXTRA, **extra}
    with open(PREVIEW, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    budget = float(os.environ.get("GAUSPCC_AXES_BUDGET_S", "1100"))
    t0 = time.time()
    compile_cache.enable()

    extra: dict = {
        "axes_measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
    }
    # scene-quality rider (same block bench.main runs)
    try:
        r = json.load(open(os.path.join(REPO, "runs/soak_hac_r5",
                                        "results.json")))
        extra["scene_hac"] = {
            "run": "runs/soak_hac_r5", "psnr_db": round(r["psnr"], 2),
            "ssim": round(r["ssim"], 4),
            "codec_delta_db": round(r.get("codec_delta_db", 0.0), 4),
            "size_mb": round(r["size_bits"]["total"] / 8 / 2**20, 3),
            "fps": round(r.get("fps", 0.0), 2),
        }
    except (OSError, ValueError, KeyError):
        pass

    def remaining() -> float:
        return budget - (time.time() - t0)

    codec_state: dict = {}

    def with_codec(fn):
        if "params" not in codec_state:
            codec_state["params"], codec_state["cfg"] = bench.load_codec({})
        return fn(codec_state["params"], codec_state["cfg"])

    def profile_axis(params, cfg):
        from gauspcc_tpu.codecs.gauspcgc import codec as pcc_codec

        pts = bench._bench_cloud()
        tmp = "/tmp/gauspcc_axes_prof.bin"
        pcc_codec.compress_point_cloud(pts, params, tmp, config=cfg)
        bench.bench_codec_profile(extra, params, cfg, tmp)

    # never-measured first; codec-dependent last (their program loads are
    # the expensive part)
    axes = [
        ("render", 240, lambda: bench.bench_render(extra)),
        ("train", 300, lambda: bench.bench_train_iter(extra)),
        ("batch", 300, lambda: with_codec(
            lambda p, c: bench.bench_codec_batch(extra, p, c))),
        ("profile", 120, lambda: with_codec(profile_axis)),
    ]
    for name, est, fn in axes:
        if remaining() < est:
            extra[f"{name}_skipped"] = f"budget ({remaining():.0f}s left)"
            continue
        t_ax = time.time()
        try:
            fn()
            extra[f"{name}_wall_s"] = round(time.time() - t_ax, 1)
        except Exception as e:  # an axis must not sink the others
            extra[f"{name}_error"] = repr(e)[:200]
        emit(extra)
    extra["axes_wall_s"] = round(time.time() - t0, 1)
    emit(extra)


if __name__ == "__main__":
    main()
