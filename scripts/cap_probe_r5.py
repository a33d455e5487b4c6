"""Honest-caps probe: quantify how badly the ORIGINAL fixed training caps
(D=32 tiles/Gaussian, K=256 Gaussians/tile) truncate a trained scene.

VERDICT r4 weak #2: the round-4 root-cause narrative leaned on two
numbers ("92% of alive Gaussians exceed D=32"; "honest caps drop the 14k
checkpoint 28.6 -> 18.2 dB") whose artifacts were lost to the VM reboot.
This re-measures the structural half of that claim on a committed
checkpoint and writes the evidence to a runs/ directory that the chain
commits (VERDICT r4 item 6).

For each probe view it reports, at the legacy caps AND at the adaptive
caps the r5 run actually trained with:
  - frac_gauss_over_d: alive Gaussians whose tile footprint exceeds D
    (under row-major truncation these lost their bottom rows — the r3/r4
    collapse mechanism, BASELINE.md r4)
  - frac_tiles_over_k, max_tile_count

Usage: python scripts/cap_probe_r5.py --run runs/soak_hac_r5 --out runs/cap_probe_r5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# run as `python scripts/cap_probe_r5.py`: sys.path[0] is scripts/, not the
# repo root — the r5 chain's first invocation died on exactly this import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/soak_hac_r5")
    p.add_argument("--out", default="runs/cap_probe_r5")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--cams", type=int, default=64)
    p.add_argument("--n_probe", type=int, default=8)
    p.add_argument("--voxel_size", type=float, default=0.01)
    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    compile_cache.enable()

    import jax

    from gauspcc_tpu.cli.soak import _orbit_camera
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import pipeline, render as hac_render
    from gauspcc_tpu.render import raster
    from gauspcc_tpu.utils import checkpoint

    ckpt = os.path.join(args.run, "train_ckpt.pkl")
    if os.path.exists(ckpt):
        snap = checkpoint.load_training_checkpoint(ckpt)
        state = hac.merge_state(snap["params"], snap["rest"])
        iteration = int(snap["iteration"])
    else:
        # fall back to the final model written by train_scene
        fam = registry.get_family("hac")
        cfg0 = fam.make_config(voxel_size=args.voxel_size)
        npz = os.path.join(args.run, "model.npz")
        tmpl = fam.init_state(
            jax.random.PRNGKey(0), cfg0, np.zeros((1, 3), np.float32))
        state = checkpoint.load_pytree(npz, tmpl)
        iteration = -1

    fam = registry.get_family("hac")
    cfg = fam.make_config(voxel_size=args.voxel_size)

    # same deterministic orbit as cli/soak.py::build_scene — cameras only,
    # no GT renders needed for a saturation probe
    cams = []
    for i, ang in enumerate(
            np.linspace(0, 2 * np.pi, args.cams, endpoint=False)):
        cams.append(_orbit_camera(
            i, ang, args.hw, radius=3.5 + 0.6 * np.sin(3 * ang),
            height=0.4 + 0.5 * np.cos(2 * ang)))
    step = max(1, len(cams) // args.n_probe)
    probe_cams = cams[::step][:args.n_probe]

    os.makedirs(args.out, exist_ok=True)
    report = {"run": args.run, "iteration": iteration, "views": []}
    cap_grid = [
        {"label": "legacy_train_caps", "max_d": 32, "max_k": 256},
        {"label": "grown_caps", "max_d": 64, "max_k": 1024},
        {"label": "eval_caps", "max_d": 256, "max_k": 1024},
    ]
    for ci, cam in enumerate(probe_cams):
        ca = hac_render.CameraArrays.from_camera(cam, with_image=False)
        row = {"view": ci * step}
        for g in cap_grid:
            rcfg = raster.RasterConfig(
                height=cam.height, width=cam.width,
                tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                max_gaussians_per_tile=g["max_k"],
                max_tiles_per_gaussian=g["max_d"])
            over_d, over_k, max_cnt = (
                float(x) for x in pipeline._saturation_jit(cfg, rcfg)(
                    state, ca))
            row[g["label"]] = {
                "frac_gauss_over_d": over_d,
                "frac_tiles_over_k": over_k,
                "max_tile_count": max_cnt,
            }
        report["views"].append(row)
        print(f"view {row['view']}: legacy over_d "
              f"{row['legacy_train_caps']['frac_gauss_over_d']:.3f} "
              f"over_k {row['legacy_train_caps']['frac_tiles_over_k']:.3f}",
              flush=True)

    for g in cap_grid:
        vals = [v[g["label"]]["frac_gauss_over_d"] for v in report["views"]]
        report[f"mean_frac_gauss_over_d[{g['label']}]"] = float(np.mean(vals))
        vals = [v[g["label"]]["frac_tiles_over_k"] for v in report["views"]]
        report[f"mean_frac_tiles_over_k[{g['label']}]"] = float(np.mean(vals))
    out = os.path.join(args.out, "probe.json")
    json.dump(report, open(out, "w"), indent=2)
    print(f"probe -> {out}")
    print(json.dumps({k: v for k, v in report.items() if k != "views"},
                     indent=2))


if __name__ == "__main__":
    main()
