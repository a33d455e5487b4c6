"""Round-4 phase-2 collapse bisection (TPU, single process).

The r4 HAC soak (runs/soak_hac_r4) collapsed in-process: clean test PSNR
22.8 at iter 14k -> 14.3 at 16k, with no resume involved, masks stable,
and newly-densified anchors ruled out (ablating them does not recover).
Swap probes show anchors AND nets co-drifted to a worse optimum, so the
trigger is a phase-2 training-dynamics term. This script resumes the 14k
snapshot under one-variable-at-a-time variants and measures the clean
test PSNR after the same 1200 steps (same rng/camera order: all state
comes from the snapshot).

Fixes the r3 bisect flaws (ADVICE.md): snap_iter is read FROM the
checkpoint (not hardcoded), arms with no scalar rows report null, and
tail parsing filters to train/psnr rows. All arms run in one process so
the scene build (~5 min) and XLA programs are shared.

Usage: python scripts/phase2_bisect_r4.py --snap /tmp/ckpt_r4_14k.pkl \
    --steps 1200 --out runs/bisect_r4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snap", default="/tmp/ckpt_r4_14k.pkl")
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--out", default="runs/bisect_r4")
    p.add_argument("--arms", default="control,rate_off,phase1,q_fixed,"
                   "noise_feat_only,no_densify")
    # the r4 soak's scene/opt settings (runs/soak_hac_r4.log header)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--cams", type=int, default=64)
    p.add_argument("--lmbda", type=float, default=5e-4)
    args = p.parse_args()

    import jax.numpy as jnp

    from gauspcc_tpu.cli.soak import build_scene
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import pipeline, render as hac_render
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.utils import checkpoint, image as img_lib
    from gauspcc_tpu.utils.scalars import ScalarLogger

    os.makedirs(args.out, exist_ok=True)
    snap = checkpoint.load_training_checkpoint(args.snap)
    snap_iter = int(snap["iteration"])  # ADVICE r3: never hardcode
    stop_at = snap_iter + args.steps
    del snap
    print(f"snapshot iter {snap_iter}, arms run to {stop_at}", flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    scene = build_scene(rng, args.hw, 6000, args.cams, 30000,
                        kind="textured", white_background=True)
    print(f"scene built in {time.time()-t0:.0f}s", flush=True)

    cfg = hac.HACConfig(voxel_size=0.01)
    base_fam = registry.get_family("hac")
    summary_path = os.path.join(args.out, "summary.json")
    summary = {"snap_iter": snap_iter, "stop_at": stop_at, "arms": {}}

    def clean_psnr(state):
        ps = []
        for cam in scene.test_cameras[:8]:
            ca = hac_render.CameraArrays.from_camera(cam)
            rcfg = pipeline._raster_cfg(cam)
            img = hac_render.render_image(state, cfg, ca, rcfg, jnp.ones(3))
            ps.append(float(img_lib.psnr(img, jnp.asarray(cam.image))))
        return float(np.mean(ps)), ps

    for arm in args.arms.split(","):
        arm = arm.strip()
        hac.P2_Q_FIXED = arm == "q_fixed"
        hac.P2_NOISE_FEAT_ONLY = arm == "noise_feat_only"
        fam = base_fam
        if arm == "phase1":
            fam = dataclasses.replace(
                base_fam,
                phase_of_step=lambda it: min(hac_train.phase_of_step(it), 1))
        if arm == "phase0":  # no noise, no rate: pure photometric objective
            fam = dataclasses.replace(base_fam, phase_of_step=lambda it: 0)
        opt = hac_train.OptConfig(
            iterations=30_000,
            lmbda=0.0 if arm == "rate_off" else args.lmbda,
            update_until=0 if arm == "no_densify" else 15_000,
        )
        if arm == "lr_low":  # stability probe: every group lr x0.25
            scaled = {
                f.name: getattr(opt, f.name) * 0.25
                for f in dataclasses.fields(opt)
                if "lr" in f.name and isinstance(getattr(opt, f.name), float)
            }
            opt = dataclasses.replace(opt, **scaled)
        out_dir = os.path.join("/tmp/bisect_r4", arm)
        os.makedirs(out_dir, exist_ok=True)
        t1 = time.time()
        print(f"=== arm {arm} start ===", flush=True)
        state, _ = pipeline.train_scene(
            scene, cfg, opt, out_dir, pcc_params=None,
            family=fam, log_every=200, eval_at_end=False,
            white_background=True, start_checkpoint=args.snap,
            stop_at=stop_at, scalar_logger=ScalarLogger(out_dir),
        )
        mean_p, ps = clean_psnr(state)
        # noisy-train tail from scalars (null when no rows — ADVICE r3)
        rows = []
        sc_path = os.path.join(out_dir, "scalars.jsonl")
        if os.path.exists(sc_path):
            rows = [json.loads(l) for l in open(sc_path)]
            rows = [r for r in rows if "train/psnr" in r]
        tail = (float(np.mean([r["train/psnr"] for r in rows[-3:]]))
                if rows else None)
        summary["arms"][arm] = {
            "clean_test_psnr": mean_p,
            "per_view": ps,
            "noisy_tail": tail,
            "wall_s": time.time() - t1,
        }
        json.dump(summary, open(summary_path, "w"), indent=2)
        print(f"=== arm {arm}: clean {mean_p:.2f} noisy_tail {tail} "
              f"({time.time()-t1:.0f}s) ===", flush=True)
        del state

    hac.P2_Q_FIXED = False
    hac.P2_NOISE_FEAT_ONLY = False
    print(json.dumps(summary["arms"], indent=2))


if __name__ == "__main__":
    main()
