"""Headline benchmark: GausPcgc geometry encode+decode on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json configs[0]: geometry encode/decode of one
anchor-scale point cloud (lex 'Morton' sort + voxelize + context-model
inference on device + host arithmetic coder). The reference publishes no
numeric throughput (BASELINE.md), so vs_baseline is the ratio against the
first self-measured round recorded in BENCH_BASELINE.json (created on
first run); >1.0 means faster than round-1 self-baseline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _cache_dir() -> str:
    """Compilation cache, keyed by host CPU fingerprint: XLA:CPU AOT blobs
    are not portable across machines (the loader warns about SIGILL when
    the flags differ), and this repo's cache may travel between hosts."""
    import hashlib
    import platform

    try:
        info = open("/proc/cpuinfo").read()
        flags = next((l for l in info.splitlines() if l.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/root/repo/.jax_cache-{tag}"


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gauspcc_tpu.codecs.gauspcgc import codec, model

    cfg = model.NetConfig(channels=32, kernel_size=5)
    params = model.init_params(jax.random.PRNGKey(0), cfg)

    # anchor-like clustered cloud (~120k voxels; Mip-NeRF360 scenes land in
    # the 10^5 anchor range)
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 4000, size=(200, 3))
    pts = centers[rng.integers(0, len(centers), 160_000)] + rng.normal(
        0, 20, (160_000, 3)
    )
    pts = np.unique(np.round(pts), axis=0).astype(np.int64)
    n = pts.shape[0]

    tmp = "/tmp/gauspcc_bench.bin"
    # warm-up: compile all level programs
    codec.compress_point_cloud(pts, params, tmp, config=cfg)
    codec.decompress_point_cloud(tmp, params, config=cfg)

    enc_times, dec_times = [], []
    for _ in range(3):
        t0 = time.time()
        out = codec.compress_point_cloud(pts, params, tmp, config=cfg)
        enc_times.append(time.time() - t0)
        t0 = time.time()
        dec = codec.decompress_point_cloud(tmp, params, config=cfg)
        dec_times.append(time.time() - t0)
    assert dec["num_points"] == n, "round-trip point count mismatch"

    total = min(enc_times) + min(dec_times)
    value = n / total  # end-to-end points/sec (enc+dec)

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = value
        json.dump(
            {"metric": "gauspcgc_encdec_points_per_sec", "value": value,
             "note": "round-1 self baseline (reference publishes no numbers)"},
            open(baseline_path, "w"),
        )
    print(json.dumps({
        "metric": "gauspcgc_encdec_points_per_sec",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / base, 4),
    }))


if __name__ == "__main__":
    main()
