"""Finish a cut soak's final eval -> results.json, any model family.

Generalizes scripts/finish_hac_eval_r5.py (which resurrected the r5 HAC
flagship after the chain timeout landed mid-metrics) to the registry's
four families: a soak that completed training and checkpointing but was
killed anywhere in the encode -> decode -> eval tail can be finished
without re-spending the training chip-time. Rebuild is deterministic:
cli/soak.py seeds the scene with rng(0), so the same build args
reproduce the scene bit-identically, and train_ckpt.pkl carries
params + rest + iteration (reference eval loop: HAC/train.py:291-382).

  python scripts/finish_soak_eval.py --run runs/soak_cat3dgs_r5 \
      --model cat3dgs --cams 48
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="finish-soak-eval")
    p.add_argument("--run", required=True)
    p.add_argument("--model", default="hac",
                   choices=("hac", "hac_plus", "tcgs", "cat3dgs"))
    # scene-build args: MUST match the original soak invocation
    # (cli/soak.py defaults, overridden per run by its chain script)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--gt_gaussians", type=int, default=6000)
    p.add_argument("--cams", type=int, default=24)
    p.add_argument("--seed_points", type=int, default=30_000)
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--scene", default="textured")
    p.add_argument("--bg", default="white", choices=("white", "black"))
    p.add_argument("--pcc_ckpt", default="model/gauspcgc/best_model.npz")
    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    compile_cache.enable()

    import jax

    from gauspcc_tpu.cli import soak as soak_mod
    from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import codec as hac_codec
    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import pipeline
    from gauspcc_tpu.utils import checkpoint

    fam = registry.get_family(args.model)
    cfg = fam.make_config(voxel_size=args.voxel_size)
    white_bg = args.bg == "white"

    ckpt = os.path.join(args.run, "train_ckpt.pkl")
    snap = checkpoint.load_training_checkpoint(ckpt)
    state = hac.merge_state(snap["params"], snap["rest"])
    it = snap["iteration"]
    print(f"loaded {ckpt} at iteration {it}, "
          f"{int(np.asarray(state['valid']).sum())} anchors", flush=True)

    pcc_cfg = pcc_model.NetConfig()
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(0), pcc_cfg)
    if args.pcc_ckpt and os.path.exists(args.pcc_ckpt):
        pcc_params = checkpoint.load_pytree(args.pcc_ckpt, pcc_params)

    rng = np.random.default_rng(0)  # same seed as the soak -> same scene
    scene = soak_mod.build_scene(rng, args.hw, args.gt_gaussians, args.cams,
                                 args.seed_points, kind=args.scene,
                                 white_background=white_bg)
    print(f"scene rebuilt: {len(scene.train_cameras)} train / "
          f"{len(scene.test_cameras)} test cams", flush=True)

    bs_dir = os.path.join(args.run, "bitstreams")
    if args.model == "hac":
        _, est_log = hac_codec.estimate_final_bits(state, cfg)
        print(est_log, flush=True)
    sizes, enc_log = fam.conduct_encoding(state, cfg, bs_dir, pcc_params,
                                          pcc_cfg)
    print(enc_log, flush=True)
    dec_state, dec_log = fam.conduct_decoding(state, cfg, bs_dir, pcc_params,
                                              pcc_cfg)
    print(dec_log, flush=True)

    results = pipeline.evaluate(
        dec_state, cfg, scene.test_cameras,
        os.path.join(args.run, "test_renders"),
        white_background=white_bg, decoded=True)
    print(f"decoded eval: PSNR {results['psnr']:.3f}", flush=True)
    float_res = pipeline.evaluate(
        state, cfg, scene.test_cameras,
        os.path.join(args.run, "float_renders"),
        white_background=white_bg, decoded=False)
    results["psnr_float"] = float_res["psnr"]
    if results.get("psnr") is not None and float_res["psnr"] is not None:
        results["codec_delta_db"] = float_res["psnr"] - results["psnr"]
    results["size_bits"] = sizes
    results["size_mb"] = sizes["total"] / hac_codec.BIT2MB
    results["iteration"] = it
    json.dump(results, open(os.path.join(args.run, "results.json"), "w"),
              indent=2, default=float)

    # soak_summary.json (normally written by cli/soak.py after train_scene
    # returns): reconstruct train wall / ms-per-iter from the run's own
    # scalars so collect_results.py can merge them
    summ = {k: v for k, v in results.items() if k != "per_view"}
    times = []
    with open(os.path.join(args.run, "scalars.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if "train/loss" in rec:
                times.append((rec["step"], rec["time"]))
    if len(times) >= 2:
        (s0, t0), (s1, t1) = times[0], times[-1]
        if s1 > s0:
            summ["ms_per_iter"] = (t1 - t0) / (s1 - s0) * 1e3
            summ["train_wall_s"] = (t1 - t0) / (s1 - s0) * it
    json.dump(summ, open(os.path.join(args.run, "soak_summary.json"), "w"),
              indent=2, default=float)
    print(f"eval @ iter {it}: PSNR {results['psnr']:.3f} "
          f"(float {results['psnr_float']:.3f}, "
          f"delta {results['codec_delta_db']:+.4f} dB), "
          f"SSIM {results['ssim']:.4f}, size {results['size_mb']:.3f} MB, "
          f"FPS {results['fps']:.2f}", flush=True)


if __name__ == "__main__":
    main()
