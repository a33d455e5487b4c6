"""Scene-scale TPU soak: train a family on a synthetic scene at realistic
resolution/anchor count, then encode -> decode -> eval.

The container ships no Mip-NeRF360/DB/T&T data (BASELINE.md), so the soak
substitutes a procedural ground-truth scene — a few thousand colored
Gaussians rendered with this repo's own rasterizer from orbit cameras —
at eval-protocol scale (>=512x512 images, tens of thousands of anchors,
full iteration budget). Everything else is the real pipeline: the same
train_scene / conduct_encoding / conduct_decoding / evaluate path a real
dataset takes (reference protocol: scripts/gs_compress/run_ours_hac.sh).

  python -m gauspcc_tpu.cli.soak --model hac --iters 30000 --hw 512 \
      --out runs/soak_hac
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


class SyntheticScene:
    """Duck-typed Scene (train_cameras/test_cameras/points/cameras_extent)."""

    def __init__(self, cams_train, cams_test, points, extent):
        self.train_cameras = cams_train
        self.test_cameras = cams_test
        self.points = points
        self.cameras_extent = extent


def _orbit_camera(uid, angle, hw, radius=4.0, height=0.6, fov=0.9):
    from gauspcc_tpu.data.cameras import Camera

    pos = np.array([radius * np.cos(angle), height, radius * np.sin(angle)])
    fwd = -pos / np.linalg.norm(pos)
    up0 = np.array([0.0, 1.0, 0.0])
    right = np.cross(up0, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    r_w2v = np.stack([right, up, fwd])
    t = -r_w2v @ pos
    return Camera(uid=uid, R=r_w2v.T, T=t, fovx=fov, fovy=fov,
                  width=hw, height=hw)


def build_scene(rng, hw: int, n_gt: int, n_cams: int, n_seed: int,
                kind: str = "smooth", white_background: bool = True):
    import jax.numpy as jnp

    from gauspcc_tpu.render import raster

    # clustered colored Gaussian field (structure at several scales)
    n_clusters = max(8, n_gt // 150)
    centers = rng.random((n_clusters, 3)) * 1.6 - 0.8
    idx = rng.integers(0, n_clusters, n_gt)
    means = (centers[idx] + rng.normal(0, 0.12, (n_gt, 3))).astype(np.float32)
    if kind == "smooth":
        # fittable GT (the reference is evaluated on photographic scenes,
        # which are locally smooth): colors are a low-frequency function of
        # position, so nearby Gaussians agree and an anchor's neural
        # gaussians can actually represent its neighborhood
        freqs = np.array([[2.1, 0.7, 1.3], [0.9, 2.4, 1.7], [1.5, 1.1, 2.6]])
        phases = np.array([0.0, 2.1, 4.2])
        colors = (0.5 + 0.45 * np.sin(means @ freqs.T + phases)).astype(
            np.float32)
        scales = (rng.random((n_gt, 3)) * 0.06 + 0.03).astype(np.float32)
        opac = (rng.random((n_gt, 1)) * 0.45 + 0.5).astype(np.float32)
    elif kind == "textured":
        # smooth + mid-frequency texture. The all-low-frequency scene is
        # degenerate for the reference's noise schedule: color is nearly a
        # function of the view ray alone, so under phase-1 feat noise the
        # RD-optimal MLPs learn to IGNORE the anchor features (measured:
        # clean and noisy renders agree at ~20.5 dB by iter 6000 while a
        # noise-free run holds ~30). Photographic scenes — the regime the
        # reference actually trains in — have texture that only the
        # per-anchor features can carry, which anchors them against the
        # noise. Mid frequencies (wavelength ~0.8-1.6 units >> anchor
        # spacing ~0.02) keep the scene fittable.
        lo_f = np.array([[2.1, 0.7, 1.3], [0.9, 2.4, 1.7], [1.5, 1.1, 2.6]])
        hi_f = np.array([[5.3, 7.1, 4.2], [6.7, 3.9, 5.8], [4.4, 6.1, 7.3]])
        phases = np.array([0.0, 2.1, 4.2])
        colors = (0.5 + 0.27 * np.sin(means @ lo_f.T + phases)
                  + 0.18 * np.sin(means @ hi_f.T + 1.3 * phases + 0.7))
        colors = np.clip(colors, 0.0, 1.0).astype(np.float32)
        scales = (rng.random((n_gt, 3)) * 0.06 + 0.03).astype(np.float32)
        opac = (rng.random((n_gt, 1)) * 0.45 + 0.5).astype(np.float32)
    else:  # "hard": round-2's high-frequency field, kept for stress runs
        colors = rng.random((n_gt, 3)).astype(np.float32)
        scales = (rng.random((n_gt, 3)) * 0.05 + 0.015).astype(np.float32)
        opac = (rng.random((n_gt, 1)) * 0.6 + 0.3).astype(np.float32)
    rots = np.tile([1.0, 0, 0, 0], (n_gt, 1)).astype(np.float32)

    cams = []
    render_fn = None
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, n_cams, endpoint=False)):
        c = _orbit_camera(i, ang, hw, radius=3.5 + 0.6 * np.sin(3 * ang),
                          height=0.4 + 0.5 * np.cos(2 * ang))
        if render_fn is None:
            import functools

            import jax

            rcfg = raster.RasterConfig(hw, hw, c.tanfovx, c.tanfovy,
                                       max_gaussians_per_tile=256)
            render_fn = jax.jit(functools.partial(raster.rasterize, cfg=rcfg))
        img, _ = render_fn(
            means3d=jnp.asarray(means), colors=jnp.asarray(colors),
            opacities=jnp.asarray(opac), scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots),
            viewmatrix=jnp.asarray(c.world_view_transform),
            # white GT background = the Synthetic-NeRF regime the reference
            # actually trains flat backgrounds in (train bg must match);
            # exact-black flat GT is an SSIM-gradient pathology no reference
            # dataset exhibits (see hac.train.make_train_step docstring)
            bg_color=(jnp.ones(3) if white_background else jnp.zeros(3)))
        c.image = np.asarray(img)
        cams.append(c)

    sel = rng.integers(0, n_gt, n_seed)
    seed_pts = (means[sel]
                + rng.normal(0, 0.02, (n_seed, 3)).astype(np.float32))
    extent = float(np.linalg.norm(
        np.ptp(np.stack([c.camera_center for c in cams]), axis=0)) * 0.5)
    # interleaved holdout, the reference's llffhold=8 split (HAC/scene/
    # dataset_readers.py:142-167): every 8th orbit view is a test view.
    # (A contiguous held-out arc — the old split — leaves a 45-degree
    # coverage hole that costs several dB of test PSNR by itself.)
    hold = 8
    test = [c for i, c in enumerate(cams) if i % hold == 0]
    train = [c for i, c in enumerate(cams) if i % hold != 0]
    return SyntheticScene(train, test, seed_pts.astype(np.float32), extent)


def main(argv=None):
    p = argparse.ArgumentParser(prog="gauspcc-soak")
    p.add_argument("--model", default="hac",
                   choices=("hac", "hac_plus", "tcgs", "cat3dgs"))
    p.add_argument("--iters", type=int, default=30_000)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--gt_gaussians", type=int, default=6000)
    p.add_argument("--cams", type=int, default=24)
    p.add_argument("--seed_points", type=int, default=30_000)
    p.add_argument("--scene", default="textured",
                   choices=("textured", "smooth", "hard"))
    p.add_argument("--bg", default="white", choices=("white", "black"))
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--lmbda", type=float, default=1e-3)
    p.add_argument("--out", default="runs/soak")
    p.add_argument("--pcc_ckpt", default="model/gauspcgc/best_model.npz")
    p.add_argument("--checkpoint_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=200)
    p.add_argument("--resume", default="")
    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    compile_cache.enable()

    import jax

    from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import pipeline
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.utils import checkpoint
    from gauspcc_tpu.utils.heartbeat import Heartbeat
    from gauspcc_tpu.utils.scalars import ScalarLogger

    rng = np.random.default_rng(0)
    t0 = time.time()
    white_bg = args.bg == "white"
    os.makedirs(args.out, exist_ok=True)
    hb = Heartbeat(os.path.join(args.out, "heartbeat"))
    with hb.guard("build_scene"):
        scene = build_scene(rng, args.hw, args.gt_gaussians, args.cams,
                            args.seed_points, kind=args.scene,
                            white_background=white_bg)
    print(f"scene built in {time.time() - t0:.1f}s: "
          f"{len(scene.train_cameras)} train / {len(scene.test_cameras)} "
          f"test cams @ {args.hw}x{args.hw}, {scene.points.shape[0]} seeds")

    fam = registry.get_family(args.model)
    if args.iters < 30_000:
        # compress the phase schedule so a shortened soak still reaches the
        # rate phase — but floor the CLEAN phase in absolute iterations:
        # quantization noise (phase 1's +-q/2 on near-zero features) before
        # the representation exists permanently stalls training (measured:
        # a 10x-compressed run plateaued at 10.5 dB while the same scene
        # reached 27+ dB with a full-length clean phase)
        import dataclasses

        # floor the clean phase at the reference's own absolute gate (3000,
        # gaussian_renderer/__init__.py:51): r3z entered feature noise at
        # 1501 with underdeveloped features and degraded from ~3600 on,
        # still in phase 1 (runs/soak_hac_r3z.log)
        b0 = max(args.iters // 10, min(3000, args.iters // 2))
        b1 = max(args.iters // 3, b0 + (args.iters - b0) // 3)
        fam = dataclasses.replace(
            fam, phase_of_step=lambda it: 0 if it <= b0 else
            (1 if it <= b1 else 2))
    cfg = fam.make_config(voxel_size=args.voxel_size)
    opt = hac_train.OptConfig(
        iterations=args.iters, lmbda=args.lmbda,
        update_until=min(15_000, args.iters // 2))
    pcc_cfg = pcc_model.NetConfig()
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(0), pcc_cfg)
    if args.pcc_ckpt and os.path.exists(args.pcc_ckpt):
        pcc_params = checkpoint.load_pytree(args.pcc_ckpt, pcc_params)
        print(f"codec checkpoint: {args.pcc_ckpt}")

    t0 = time.time()
    state, results = pipeline.train_scene(
        scene, cfg, opt, args.out, pcc_params=pcc_params, pcc_cfg=pcc_cfg,
        family=fam, log_every=args.log_every,
        white_background=white_bg,
        checkpoint_every=args.checkpoint_every,
        start_checkpoint=args.resume or None,
        scalar_logger=ScalarLogger(args.out),
        heartbeat=hb,
    )
    wall = time.time() - t0
    results["train_wall_s"] = wall
    results["ms_per_iter"] = wall / max(args.iters, 1) * 1e3
    json.dump({k: v for k, v in results.items() if k != "per_view"},
              open(os.path.join(args.out, "soak_summary.json"), "w"),
              indent=2, default=float)
    if "aborted_divergence" in results:
        # distinct exit code: the wrapper loop must NOT retry a collapsed
        # run (resuming the diverged checkpoint would re-collapse) — it
        # should surrender the chip to the next job in the chain
        print(f"soak ABORTED (divergence at iter "
              f"{results['aborted_divergence']['iteration']}): "
              f"canary {results['aborted_divergence']['canary_db']:.2f} dB")
        raise SystemExit(3)
    print(f"soak done in {wall/60:.1f} min "
          f"({results['ms_per_iter']:.1f} ms/iter): "
          f"PSNR {results.get('psnr')}, size {results.get('size_mb')} MB")


if __name__ == "__main__":
    main()
