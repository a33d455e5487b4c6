"""Aggregate runs/*/results.json into the BASELINE.md round table.

Usage: python scripts/collect_results.py [runs/soak_*_r3y ...]
Prints a markdown table row per run: PSNR (decoded), float PSNR, codec
delta, SSIM, size MB, fps, ms/iter — the fields VERDICT r2 items 1-2 ask
to be demonstrated.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def row(run_dir: str) -> str | None:
    path = os.path.join(run_dir, "results.json")
    if not os.path.exists(path):
        return None
    r = json.load(open(path))
    # ms_per_iter / train_wall_s live in the soak driver's summary, not
    # in train_scene's results.json — merge when present
    summ = os.path.join(run_dir, "soak_summary.json")
    if os.path.exists(summ):
        r = {**json.load(open(summ)), **r}
    name = os.path.basename(run_dir.rstrip("/"))

    def f(key, fmt="{:.2f}", default="—"):
        v = r.get(key)
        return fmt.format(v) if isinstance(v, (int, float)) else default

    return (f"| {name} | {f('psnr')} | {f('psnr_float')} | "
            f"{f('codec_delta_db', '{:+.3f}')} | {f('ssim', '{:.3f}')} | "
            f"{f('size_mb', '{:.3f}')} | {f('fps', '{:.1f}')} | "
            f"{f('ms_per_iter', '{:.0f}')} |")


def main():
    runs = sys.argv[1:] or sorted(glob.glob("runs/soak_*"))
    print("| run | PSNR(dec) | PSNR(float) | codec Δ dB | SSIM | MB | fps "
          "| ms/iter |")
    print("|---|---|---|---|---|---|---|---|")
    for run in runs:
        if not os.path.isdir(run):
            continue
        line = row(run)
        if line:
            print(line)


if __name__ == "__main__":
    main()
