"""Headline benchmark on one TPU chip — multi-axis.

Prints ONE JSON line. The required driver fields {"metric", "value",
"unit", "vs_baseline"} carry the headline axis (GausPcgc geometry codec
end-to-end enc+dec points/s, BASELINE.json configs[0]); the "extra"
object carries the other axes so rounds are mechanically comparable:
enc/dec split, bpp (with the trained checkpoint when present), eval
render ms/frame at the worst-case raster config, and HAC train ms/iter.

The reference publishes no numeric throughput (BASELINE.md), so
vs_baseline is the ratio against the first self-measured round recorded
in BENCH_BASELINE.json; >1.0 means faster than the round-1 baseline.

Skip the slower secondary axes with GAUSPCC_BENCH_FAST=1.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np




def _force_sync(out) -> float:
    """Real device sync: pull ONE scalar from the output.

    On the tunneled `axon` backend, `block_until_ready()` returns
    immediately (observed 2026-08-20: render/train axes timed at 0.0 ms
    while the wall said otherwise) — execution is only provably finished
    when a value crosses the link. A one-scalar device_get costs one RTT,
    which callers amortize by timing a queued batch of calls.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def _bench_cloud():
    # anchor-like clustered cloud (~160k voxels; Mip-NeRF360 scenes land
    # in the 10^5 anchor range)
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 4000, size=(200, 3))
    pts = centers[rng.integers(0, len(centers), 160_000)] + rng.normal(
        0, 20, (160_000, 3)
    )
    return np.unique(np.round(pts), axis=0).astype(np.int64)


def load_codec(extra: dict):
    import jax
    from gauspcc_tpu.codecs.gauspcgc import model

    cfg = model.NetConfig(channels=32, kernel_size=5)
    here = os.path.dirname(__file__)
    env_ckpt = os.environ.get("GAUSPCC_PCC_CKPT", "")
    ckpt_path = next(
        (p for p in (env_ckpt,
                     os.path.join(here, "model", "gauspcgc_r5", "best_model.npz"),
                     os.path.join(here, "model", "gauspcgc_r4", "best_model.npz"),
                     os.path.join(here, "model", "gauspcgc_r3", "best_model.npz"),
                     os.path.join(here, "model", "gauspcgc", "best_model.npz"))
         if p and os.path.exists(p)), "")
    if ckpt_path:
        from gauspcc_tpu.utils import checkpoint

        params = checkpoint.load_pytree(
            ckpt_path, model.init_params(jax.random.PRNGKey(0), cfg))
        extra["codec_trained"] = True
        extra["codec_ckpt"] = os.path.relpath(ckpt_path, here)
    else:
        params = model.init_params(jax.random.PRNGKey(0), cfg)
        extra["codec_trained"] = False
    return params, cfg


def bench_codec(extra: dict, params, cfg, pts) -> float:
    """Headline axis: host-geometry enc+dec points/s, 160k-pt cloud."""
    from gauspcc_tpu.codecs.gauspcgc import codec

    n = pts.shape[0]
    tmp = "/tmp/gauspcc_bench.bin"
    codec.compress_point_cloud(pts, params, tmp, config=cfg)  # warm-up
    codec.decompress_point_cloud(tmp, params, config=cfg)

    enc_times, dec_times = [], []
    bpp = None
    for _ in range(3):
        t0 = time.time()
        out = codec.compress_point_cloud(pts, params, tmp, config=cfg)
        enc_times.append(time.time() - t0)
        bpp = out["bpp"]
        t0 = time.time()
        dec = codec.decompress_point_cloud(tmp, params, config=cfg)
        dec_times.append(time.time() - t0)
    assert dec["num_points"] == n, "round-trip point count mismatch"

    extra["codec_enc_points_per_sec"] = round(n / min(enc_times), 1)
    extra["codec_dec_points_per_sec"] = round(n / min(dec_times), 1)
    extra["codec_bpp"] = round(bpp, 4)
    return n / (min(enc_times) + min(dec_times))


def bench_codec_hostgeom(extra: dict, params, cfg, pts) -> None:
    """v2 host-window-map engine, for comparison with the default (sib)."""
    from gauspcc_tpu.codecs.gauspcgc import codec

    n = pts.shape[0]
    tmp = "/tmp/gauspcc_bench_host.bin"
    codec.compress_point_cloud(pts, params, tmp, config=cfg, geom="host")
    codec.decompress_point_cloud(tmp, params, config=cfg)  # warm-up
    enc_t, dec_t = [], []
    for _ in range(2):
        t0 = time.time()
        codec.compress_point_cloud(pts, params, tmp, config=cfg, geom="host")
        enc_t.append(time.time() - t0)
        t0 = time.time()
        dd = codec.decompress_point_cloud(tmp, params, config=cfg)
        dec_t.append(time.time() - t0)
    assert dd["num_points"] == n
    extra["codec_enc_pps_hostgeom"] = round(n / min(enc_t), 1)
    extra["codec_dec_pps_hostgeom"] = round(n / min(dec_t), 1)


def bench_codec_devgeom(extra: dict, params, cfg, pts) -> float:
    """v3 device-geometry mode: the pyramid is rebuilt on the accelerator,
    so decode ships only rANS words over the link (codec.py v3 block)."""
    from gauspcc_tpu.codecs.gauspcgc import codec

    n = pts.shape[0]
    tmp_d = "/tmp/gauspcc_bench_dev.bin"
    codec.compress_point_cloud(pts, params, tmp_d, config=cfg,
                               geom="device")  # warm-up
    codec.decompress_point_cloud(tmp_d, params, config=cfg)
    enc_d, dec_d = [], []
    for _ in range(3):
        t0 = time.time()
        codec.compress_point_cloud(pts, params, tmp_d, config=cfg,
                                   geom="device")
        enc_d.append(time.time() - t0)
        t0 = time.time()
        dd = codec.decompress_point_cloud(tmp_d, params, config=cfg)
        dec_d.append(time.time() - t0)
    assert dd["num_points"] == n, "devgeom round-trip count mismatch"
    extra["codec_enc_pps_devgeom"] = round(n / min(enc_d), 1)
    extra["codec_dec_pps_devgeom"] = round(n / min(dec_d), 1)
    return n / (min(enc_d) + min(dec_d))


def bench_codec_profile(extra: dict, params, cfg, tmp: str) -> None:
    """Decode-path serial-latency breakdown per level (VERDICT r2 item 4):
    host geometry build, map/word upload (with byte counts), device
    compute, occupancy download. Profiling inserts barriers, so this runs
    separately from the throughput loop."""
    from gauspcc_tpu.codecs.gauspcgc import codec

    prof: list = []
    codec.decompress_point_cloud(tmp, params, config=cfg, profile=prof)
    tot = {k: round(sum(p.get(k, 0.0) for p in prof) * 1e3, 1)
           for k in ("host_s", "upload_s", "device_s", "download_s")}
    extra["dec_profile_ms"] = {k.replace("_s", ""): v for k, v in tot.items()}
    extra["dec_upload_mb"] = round(
        sum(p.get("upload_bytes", 0) for p in prof) / 1e6, 2)
    extra["dec_profile_levels"] = [
        {"n": p["n_child"],
         "host": round(p.get("host_s", 0.0) * 1e3, 1),
         "up": round(p.get("upload_s", 0.0) * 1e3, 1),
         "dev": round(p.get("device_s", 0.0) * 1e3, 1),
         "down": round(p.get("download_s", 0.0) * 1e3, 1)}
        for p in prof[-3:]  # finest levels dominate; keep the line short
    ]


def bench_codec_batch(extra: dict, params, cfg) -> None:
    """Batched multi-cloud driver vs sequential at M=8 (VERDICT r2 item 5).
    Aggregate enc+dec points/s both ways."""
    from gauspcc_tpu.codecs.gauspcgc import codec

    rng = np.random.default_rng(5)
    clouds = []
    for i in range(8):
        centers = rng.integers(0, 2500, size=(60, 3))
        pts = centers[rng.integers(0, len(centers), 40_000)] + rng.normal(
            0, 18, (40_000, 3))
        clouds.append(np.unique(np.round(pts), axis=0).astype(np.int64))
    n_total = sum(c.shape[0] for c in clouds)

    bpath = "/tmp/gauspcc_bench_batch.binb"
    codec.compress_point_cloud_batch(clouds, params, bpath, config=cfg)
    codec.decompress_point_cloud_batch(bpath, params, config=cfg)  # warm
    t0 = time.time()
    codec.compress_point_cloud_batch(clouds, params, bpath, config=cfg)
    dec = codec.decompress_point_cloud_batch(bpath, params, config=cfg)
    batch_pps = n_total / (time.time() - t0)
    assert dec["num_points"] == n_total

    t0 = time.time()
    for i, c in enumerate(clouds):
        p = f"/tmp/gauspcc_bench_seq_{i}.bin"
        codec.compress_point_cloud(c, params, p, config=cfg)
        codec.decompress_point_cloud(p, params, config=cfg)
    seq_pps = n_total / (time.time() - t0)
    extra["codec_batch8_points_per_sec"] = round(batch_pps, 1)
    extra["codec_seq8_points_per_sec"] = round(seq_pps, 1)
    extra["codec_batch_speedup"] = round(batch_pps / seq_pps, 2)


def bench_render(extra: dict) -> None:
    """Worst-case eval frame: 784x1168, 200k Gaussians, saturated K=256
    (BASELINE.md renderer row; reference surface
    HAC/gaussian_renderer/__init__.py:199-225)."""
    import jax
    import jax.numpy as jnp
    from gauspcc_tpu.render import raster

    rng = np.random.default_rng(1)
    n = 200_000
    cfg = raster.RasterConfig(height=784, width=1168, tanfovx=0.6,
                              tanfovy=0.45, max_gaussians_per_tile=256)
    means = jnp.asarray(rng.normal(0, 1.2, (n, 3)).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.random((n, 1)).astype(np.float32) * 0.9)
    scales = jnp.asarray((rng.random((n, 3)) * 0.04 + 0.005).astype(np.float32))
    rots = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    view = jnp.eye(4).at[3, 2].set(4.0)
    bg = jnp.zeros(3)

    fn = jax.jit(lambda *a: raster.rasterize(*a, cfg=cfg)[0])
    img = fn(means, colors, opac, scales, rots, view, bg)
    _force_sync(img)  # block_until_ready is a no-op on the tunneled
    # backend (observed 2026-08-20: 0.0 ms/frame, runs/r5_axes.log) — a
    # one-scalar device_get is the only real sync; amortize its RTT by
    # timing a queued batch of frames.
    n_frames = 4
    t0 = time.time()
    for _ in range(n_frames):
        img = fn(means, colors, opac, scales, rots, view, bg)
    _force_sync(img)
    extra["render_ms_frame"] = round((time.time() - t0) / n_frames * 1e3, 1)


def bench_train_iter(extra: dict) -> None:
    """HAC train step wall-clock on a synthetic scene (render + rate +
    grads + per-group Adam), post-compile."""
    import jax
    import jax.numpy as jnp
    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import render as hac_render
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.render import raster

    rng = np.random.default_rng(2)
    cfg = hac.HACConfig(voxel_size=0.01)
    pts = hac.voxelize_points(
        (rng.random((20_000, 3)) * 2 - 1).astype(np.float32), cfg.voxel_size)
    state = hac.update_anchor_bound(
        hac.init_state(jax.random.PRNGKey(0), cfg, pts))
    params, rest = hac.split_state(state)
    rcfg = raster.RasterConfig(height=512, width=512, tanfovx=0.5,
                               tanfovy=0.5, max_gaussians_per_tile=256)
    cam = hac_render.CameraArrays(
        viewmatrix=jnp.eye(4).at[3, 2].set(3.0),
        camera_center=jnp.asarray([0.0, 0.0, -3.0]),
        image=jnp.asarray(rng.random((3, 512, 512)).astype(np.float32)),
    )
    opt = hac_train.OptConfig(lmbda=1e-3)
    optimizer = hac_train.make_optimizer(opt, spatial_lr_scale=2.0)
    opt_state = optimizer.init(params)
    stats = hac_train.zero_stats(rest["valid"].shape[0], cfg.n_offsets)
    step = hac_train.make_train_step(cfg, rcfg, optimizer, opt)
    key = jax.random.PRNGKey(3)
    out = step(params, rest, opt_state, stats, cam, key, phase=2)
    _force_sync(out)  # see bench_render: block_until_ready no-ops over
    # the tunnel; sync through a one-scalar device_get
    n_iters = 4
    t0 = time.time()
    for _ in range(n_iters):
        out = step(params, rest, opt_state, stats, cam, key, phase=2)
    _force_sync(out)
    elapsed = time.time() - t0
    times = [elapsed / n_iters]
    extra["train_ms_iter"] = round(min(times) * 1e3, 1)
    extra["train_scene"] = "synthetic 512x512, 20k anchors, phase 2"

    # MFU from XLA's own cost model: compiled-program flops / wall-clock /
    # chip peak. Honest caveat: cost_analysis counts algebraic flops of the
    # lowered HLO (f32-equivalent), so this is the standard "model flops
    # utilization" denominator, not an achieved-bf16-matmul number.
    peak_bf16 = {
        "TPU v4": 275.0, "TPU v5 lite": 197.0, "TPU v5": 459.0,
        "TPU v5e": 197.0, "TPU v5p": 459.0, "TPU v6 lite": 918.0,
        "TPU v6e": 918.0,
    }
    try:
        comp = step.lower(params, rest, opt_state, stats, cam, key,
                          phase=2).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        if fl > 0:
            tflops = fl / min(times) / 1e12
            extra["train_tflops_per_s"] = round(tflops, 3)
            kind = jax.devices()[0].device_kind
            peak = next((v for k, v in peak_bf16.items() if k in kind), None)
            if peak:
                extra["train_mfu_pct"] = round(100.0 * tflops / peak, 2)
                extra["train_mfu_peak"] = f"{kind} bf16 {peak} TFLOP/s"
    except Exception as e:  # cost model optional on experimental backends
        extra["train_mfu_error"] = repr(e)[:120]


def _emit(value: float, base: float, extra: dict) -> None:
    # stamp when the headline was actually measured: provisional replays
    # carry this forward, so staleness is always visible (ADVICE r4)
    extra.setdefault("measured_at",
                     time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
    print(json.dumps({
        "metric": "gauspcgc_encdec_points_per_sec",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / base, 4),
        "extra": extra,
    }), flush=True)


def main():
    """Headline-first bench. The required JSON line is printed and flushed
    the moment the headline codec axis finishes, so an external timeout
    killing the secondary axes can never produce an empty bench (round 3
    shipped rc=124/no-output, BENCH_r03.json). Each secondary axis is
    gated on the remaining wall-clock budget (GAUSPCC_BENCH_BUDGET_S,
    default 540 s) and the line is re-emitted, enriched, after each axis —
    a consumer of the last line sees the fullest completed picture."""
    t_start = time.time()
    # Default raised 540 -> 840 after round 4: the cold-cache codec axes
    # alone took 895 s (BENCH_r04 bench_wall_s) and every secondary axis
    # was budget-skipped, while the driver's external timeout demonstrably
    # tolerated >895 s (rc=0). The headline is emitted before any device
    # work and re-emitted after each axis, so an external kill at any
    # point still leaves a parseable line.
    budget = float(os.environ.get("GAUSPCC_BENCH_BUDGET_S", "840"))

    # Provisional headline BEFORE any device work: a fresh boot wipes the
    # XLA compile cache (observed 2026-08-19: the cold codec axis exceeded
    # a 950 s timeout over the tunneled chip, reproducing BENCH_r03's
    # rc=124/no-output). If a previously MEASURED preview exists, emit it
    # immediately — clearly tagged provisional — so an external kill at ANY
    # point leaves a parseable line; the measured line then overwrites it.
    # A record that is itself a replay (carries provisional_from) is never
    # replayed again: a chain of killed runs must not launder an N-hop
    # stale number into a fresh-looking one (ADVICE r4 medium).
    prior_axes: dict = {}
    for prev in ("BENCH_r5_preview.json", "BENCH_r4_preview2.json",
                 "BENCH_r4_preview.json"):
        path = os.path.join(os.path.dirname(__file__), prev)
        try:
            lines = [l for l in open(path).read().splitlines() if l.strip()]
            rec = json.loads(lines[-1])
            ex = rec.setdefault("extra", {})
            if "provisional_from" in ex:
                continue  # replay-of-a-replay: keep looking for a real one
            # Carry previously-MEASURED secondary axes into this run's
            # record, labeled with their provenance: the headline alone is
            # tunnel-latency bound at ~15 min/process, so a budgeted run
            # routinely re-measures the headline but never reaches the
            # axes — without this, an axis measured once (e.g. by
            # scripts/r5_axes.py in a dedicated window) vanishes from the
            # final recorded line.
            AXIS_KEYS = ("render_ms_frame", "train_ms_iter", "train_scene",
                         "train_tflops_per_s", "train_mfu_pct",
                         "train_mfu_peak", "codec_batch8_points_per_sec",
                         "codec_seq8_points_per_sec", "codec_batch_speedup",
                         "dec_profile_ms", "dec_upload_mb",
                         "dec_profile_levels", "codec_enc_pps_devgeom",
                         "codec_dec_pps_devgeom", "codec_enc_pps_hostgeom",
                         "codec_dec_pps_hostgeom")
            got = {k: ex[k] for k in AXIS_KEYS if k in ex}
            if got:
                prior_axes = dict(got)
                prior_axes["from"] = prev
                for stamp in ("axes_measured_at", "measured_at"):
                    if stamp in ex:
                        prior_axes["measured_at"] = ex[stamp]
                        break
            ex["provisional_from"] = prev
            print(json.dumps(rec), flush=True)
            break
        except (OSError, ValueError, IndexError):
            continue

    from gauspcc_tpu.utils import compile_cache

    compile_cache.enable()  # one caching policy for bench + CLIs (ADVICE r4)

    extra: dict = {}
    if prior_axes:
        extra["prior_axes"] = prior_axes
    # Flagship scene-quality numbers ride along at zero device cost: the
    # completed reference-protocol HAC run (train->encode->decode->eval,
    # runs/soak_hac_r5) is the round's quality headline and belongs in the
    # bench record next to the throughput axes.
    for scene_run in ("runs/soak_hac_r5", "runs/soak_hac_r2"):
        rj = os.path.join(os.path.dirname(__file__), scene_run,
                          "results.json")
        try:
            r = json.load(open(rj))
            extra["scene_hac"] = {
                "run": scene_run,
                "psnr_db": round(r["psnr"], 2),
                "ssim": round(r["ssim"], 4),
                "codec_delta_db": round(r.get("codec_delta_db", 0.0), 4),
                "size_mb": round(r["size_bits"]["total"] / 8 / 2**20, 3),
                "fps": round(r.get("fps", 0.0), 2),
            }
            break
        except (OSError, ValueError, KeyError):
            continue
    params, cfg = load_codec(extra)
    pts = _bench_cloud()
    value = bench_codec(extra, params, cfg, pts)

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
    _emit(value, base, extra)  # the un-killable headline
    if os.environ.get("GAUSPCC_BENCH_FAST") == "1":
        return

    def remaining() -> float:
        return budget - (time.time() - t_start)

    # (name, estimated cold cost s, fn) — most valuable first: devgeom can
    # raise the headline; batch/profile/render/train (incl. MFU) are the
    # VERDICT-tracked secondary axes; hostgeom is a comparison-only engine
    # and goes last so a tight budget never starves the tracked axes.
    axes = [
        ("devgeom", 90, lambda: bench_codec_devgeom(extra, params, cfg, pts)),
        ("batch", 120, lambda: bench_codec_batch(extra, params, cfg)),
        ("profile", 30, lambda: bench_codec_profile(
            extra, params, cfg, "/tmp/gauspcc_bench.bin")),
        ("render", 60, lambda: bench_render(extra)),
        ("train", 120, lambda: bench_train_iter(extra)),
        ("hostgeom", 90, lambda: bench_codec_hostgeom(extra, params, cfg, pts)),
    ]
    for name, est, fn in axes:
        if remaining() < est:
            extra[f"{name}_skipped"] = f"budget ({remaining():.0f}s left)"
            continue
        try:
            out = fn()
            if name == "devgeom" and out:
                value = max(value, out)
        except Exception as e:  # secondary axis must not sink the bench
            extra[f"{name}_error"] = repr(e)[:200]
        _emit(value, base, extra)
    extra["bench_wall_s"] = round(time.time() - t_start, 1)
    _emit(value, base, extra)


if __name__ == "__main__":
    main()
