"""Phase-2 collapse bisection probe.

Every >=3000-iter phase-2 (rate + context-adaptive-Q noise) run at 512px has
collapsed to ~10-13 dB clean-render PSNR (soak_hac_r2 11.5 dB, pilot_smooth
10.5 dB, soak_hac_r3t2 11.0 dB at iter 14000) while phase 1 holds 20-29 dB;
round 1's "healthy" soak only ran phase 2 for 2000 iters. This driver
isolates the destabilizer: train the textured soak scene to iter 10000
(end of phase 1) once, snapshot, then replay 1500 phase-2 iters under
variants that each remove one suspect:

  A control        — standard schedule (expect degradation)
  B rate-off       — lmbda=0: adaptive-Q noise stays, rate gradient removed
  C stay-phase-1   — no rate, base-Q noise (expect stable; sanity anchor)
  D no-densify     — standard phase 2, densification disabled in the window

Run on the TPU:  python scripts/phase2_probe.py --out runs/probe
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/probe")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--cams", type=int, default=64)
    p.add_argument("--base_iters", type=int, default=10_000)
    p.add_argument("--probe_iters", type=int, default=1_500)
    p.add_argument("--variants", default="A,B,C,D")
    args = p.parse_args(argv)

    from gauspcc_tpu.cli import soak as soak_mod
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import pipeline
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.utils.scalars import ScalarLogger

    rng = np.random.default_rng(0)
    t0 = time.time()
    scene = soak_mod.build_scene(rng, args.hw, 6000, args.cams, 30_000,
                                 kind="textured", white_background=True)
    print(f"scene built in {time.time() - t0:.0f}s", flush=True)

    fam = registry.get_family("hac")  # standard 3000/10000 phase boundaries
    cfg = fam.make_config(voxel_size=0.01)
    base_opt = hac_train.OptConfig(iterations=30_000, lmbda=1e-3,
                                   update_until=15_000)

    base_dir = os.path.join(args.out, "base")
    snap = os.path.join(args.out, "phase1_end.pkl")
    if not os.path.exists(snap):
        os.makedirs(base_dir, exist_ok=True)
        pipeline.train_scene(
            scene, cfg, base_opt, base_dir, family=fam,
            eval_at_end=False, white_background=True,
            checkpoint_every=2000, stop_at=args.base_iters,
            log_every=500, scalar_logger=ScalarLogger(base_dir),
        )
        shutil.copy(os.path.join(base_dir, "train_ckpt.pkl"), snap)
        print(f"phase-1 snapshot -> {snap}", flush=True)

    variants = {
        "A": dict(),
        "B": dict(opt=dataclasses.replace(base_opt, lmbda=0.0)),
        "C": dict(fam=dataclasses.replace(
            fam, phase_of_step=lambda it: 0 if it <= 3000 else 1)),
        "D": dict(opt=dataclasses.replace(base_opt,
                                          update_until=args.base_iters)),
    }
    summary = {}
    for name in args.variants.split(","):
        v = variants[name]
        vdir = os.path.join(args.out, name)
        os.makedirs(vdir, exist_ok=True)
        print(f"=== probe {name} ===", flush=True)
        pipeline.train_scene(
            scene, cfg, v.get("opt", base_opt), vdir,
            family=v.get("fam", fam),
            eval_at_end=False, white_background=True,
            start_checkpoint=snap, checkpoint_every=0,
            stop_at=args.base_iters + args.probe_iters,
            log_every=100, scalar_logger=ScalarLogger(vdir),
        )
        rows = [json.loads(l) for l in open(os.path.join(vdir, "scalars.jsonl"))]
        tail = [r["train/psnr"] for r in rows[-5:]]
        summary[name] = round(float(np.mean(tail)), 2)
        print(f"probe {name}: tail-500-iter mean train PSNR "
              f"{summary[name]}", flush=True)
    print("PROBE SUMMARY:", json.dumps(summary))


if __name__ == "__main__":
    main()
