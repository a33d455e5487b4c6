"""Encode -> decode -> eval a soak run from its training checkpoint.

Decouples the RD evaluation from finishing the full iteration budget:
loads the mid-train snapshot written by `--checkpoint_every` (or the
final model.npz), rebuilds the deterministic synthetic scene, and runs
the same conduct_encoding / conduct_decoding / evaluate path train_scene
runs at its natural end.

  python -m gauspcc_tpu.cli.soak_eval --run runs/soak_hac_r2 --model hac
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="gauspcc-soak-eval")
    p.add_argument("--run", required=True)
    p.add_argument("--model", default="hac")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--gt_gaussians", type=int, default=6000)
    p.add_argument("--cams", type=int, default=24)
    p.add_argument("--seed_points", type=int, default=30_000)
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--scene", default="textured",
                   choices=("textured", "smooth", "hard"))
    p.add_argument("--pcc_ckpt", default="model/gauspcgc/best_model.npz")
    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    # after arg parsing: --help and usage errors must not pay
    # the jax import cost (ADVICE r4)
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

    ckpt = os.path.join(args.run, "train_ckpt.pkl")
    snap = checkpoint.load_training_checkpoint(ckpt)
    state = hac.merge_state(snap["params"], snap["rest"])
    it = snap["iteration"]
    print(f"loaded {ckpt} at iteration {it}, "
          f"{int(np.asarray(state['valid']).sum())} anchors")

    pcc_cfg = pcc_model.NetConfig()
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(0), pcc_cfg)
    if args.pcc_ckpt and os.path.exists(args.pcc_ckpt):
        pcc_params = checkpoint.load_pytree(args.pcc_ckpt, pcc_params)

    rng = np.random.default_rng(0)  # same seed as the soak -> same scene
    scene = soak_mod.build_scene(rng, args.hw, args.gt_gaussians, args.cams,
                                 args.seed_points, kind=args.scene)

    bs_dir = os.path.join(args.run, "bitstreams")
    if fam.name == "hac":
        _, est_log = hac_codec.estimate_final_bits(state, cfg)
        print(est_log)
    sizes, enc_log = fam.conduct_encoding(state, cfg, bs_dir, pcc_params,
                                          pcc_cfg)
    print(enc_log)
    dec_state, dec_log = fam.conduct_decoding(state, cfg, bs_dir, pcc_params,
                                              pcc_cfg)
    print(dec_log)
    results = pipeline.evaluate(
        dec_state, cfg, scene.test_cameras,
        os.path.join(args.run, "test_renders"), decoded=True)
    results["size_bits"] = sizes
    results["size_mb"] = sizes["total"] / hac_codec.BIT2MB
    results["iteration"] = it
    json.dump({k: v for k, v in results.items() if k != "per_view"},
              open(os.path.join(args.run, "soak_summary.json"), "w"),
              indent=2, default=float)
    print(f"eval @ iter {it}: PSNR {results['psnr']:.3f}, "
          f"SSIM {results['ssim']:.4f}, size {results['size_mb']:.3f} MB, "
          f"FPS {results['fps']:.2f}")


if __name__ == "__main__":
    main()
