"""Phase-2 collapse bisection, resumed from a mid-collapse soak snapshot.

Cheaper sibling of phase2_probe.py: instead of training a fresh 10k-iter
base, branch from an existing soak checkpoint that is already in phase 2
and degrading (runs/soak_hac_r3z, iter 6000: noisy-render PSNR fell
20.6 -> 16.5 over 1200 phase-2 iters with densification already off).
Replays N iters under variants that each remove one suspect, then scores
the CLEAN render (training=False) on 4 train views — the quantity that
actually collapses in the end-of-run eval:

  A control      — compressed schedule phase 2 (rate + adaptive-Q noise)
  B rate-off     — lmbda=0: adaptive-Q noise stays, rate gradient removed
  C stay-phase-1 — base-Q noise, no rate, no adaptive Q (sanity anchor)

Run on the TPU: python scripts/phase2_bisect_resume.py --out runs/bisect_r3z
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clean_psnr(state, cfg, cams, out_dir):
    from gauspcc_tpu.models.hac import pipeline

    renders, _ = pipeline.render_sets(state, cfg, cams, out_dir,
                                      white_background=True, decoded=False)
    vals = []
    for img, cam in zip(renders, cams):
        mse = float(np.mean((img - cam.image) ** 2))
        vals.append(-10.0 * np.log10(max(mse, 1e-10)))
    return round(float(np.mean(vals)), 2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/bisect_r3z")
    p.add_argument("--snap", default="runs/soak_hac_r3z/train_ckpt.pkl")
    p.add_argument("--probe_iters", type=int, default=800)
    p.add_argument("--variants", default="Z,A,B,C")
    args = p.parse_args(argv)

    from gauspcc_tpu.cli import soak as soak_mod
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import pipeline
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.utils.scalars import ScalarLogger

    # exact r3z scene: seeded rng, 512px, 6000 GT, 48 cams, 30k seeds
    rng = np.random.default_rng(0)
    t0 = time.time()
    scene = soak_mod.build_scene(rng, 512, 6000, 48, 30_000,
                                 kind="textured", white_background=True)
    print(f"scene built in {time.time() - t0:.0f}s", flush=True)
    probe_cams = scene.train_cameras[::12][:4]

    fam = registry.get_family("hac")
    # r3z's compressed 9000-iter schedule: clean<=1500, noise<=4000, rate>
    fam = dataclasses.replace(
        fam, phase_of_step=lambda it: 0 if it <= 1500 else
        (1 if it <= 4000 else 2))
    cfg = fam.make_config(voxel_size=0.01)
    base_opt = hac_train.OptConfig(iterations=9000, lmbda=1e-3,
                                   update_until=4500)

    variants = {
        "Z": dict(extra_iters=0),  # snapshot itself: baseline clean PSNR
        "A": dict(),
        "B": dict(opt=dataclasses.replace(base_opt, lmbda=0.0)),
        "C": dict(fam=dataclasses.replace(
            fam, phase_of_step=lambda it: 0 if it <= 1500 else 1)),
    }
    # the soak overwrites its snapshot every 2000 iters: read the actual
    # iteration from the checkpoint instead of assuming one, else every
    # variant replays ZERO iterations and the bisect silently reports the
    # same baseline number four times (ADVICE r3, medium)
    from gauspcc_tpu.utils import checkpoint as ckpt_lib

    snap_iter = int(ckpt_lib.load_training_checkpoint(args.snap)["iteration"])
    print(f"snapshot at iteration {snap_iter}", flush=True)
    summary = {}
    for name in args.variants.split(","):
        v = variants[name]
        vdir = os.path.join(args.out, name)
        os.makedirs(vdir, exist_ok=True)
        stale = os.path.join(vdir, "scalars.jsonl")
        if os.path.exists(stale):  # ScalarLogger appends; drop prior-run rows
            os.remove(stale)
        print(f"=== probe {name} ===", flush=True)
        state, _ = pipeline.train_scene(
            scene, cfg, v.get("opt", base_opt), vdir,
            family=v.get("fam", fam),
            eval_at_end=False, white_background=True,
            start_checkpoint=args.snap, checkpoint_every=0,
            stop_at=snap_iter + v.get("extra_iters", args.probe_iters),
            log_every=100, scalar_logger=ScalarLogger(vdir),
        )
        spath = os.path.join(vdir, "scalars.jsonl")
        # rows without train/psnr (eval rows) are skipped; no rows at all
        # (e.g. variant Z replays nothing) reports null, not a fake 0.0
        # PSNR; a stale file from a prior run in the same --out would mix
        # tails, so truncate before each probe instead (handled above by
        # fresh vdir creation + ScalarLogger append) — filter defensively
        tail: list[float] = []
        if os.path.exists(spath):
            rows = [json.loads(l) for l in open(spath)]
            tail = [r["train/psnr"] for r in rows if "train/psnr" in r][-3:]
        cp = clean_psnr(state, cfg, probe_cams, os.path.join(vdir, "probe"))
        summary[name] = {
            "noisy_tail": round(float(np.mean(tail)), 2) if tail else None,
            "clean": cp,
        }
        print(f"probe {name}: noisy-tail {summary[name]['noisy_tail']} "
              f"clean {cp}", flush=True)
    print("BISECT SUMMARY:", json.dumps(summary), flush=True)
    json.dump(summary, open(os.path.join(args.out, "summary.json"), "w"),
              indent=2)


if __name__ == "__main__":
    main()
