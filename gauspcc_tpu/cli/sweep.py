"""Dataset x scene x lambda sweep runner.

Parity: the reference's shell orchestration (scripts/gs_compress/
run_ours_{hac,hac_plus,tcgs,cat3dgs}.sh and per-repo run_all.py) — the
{Mip-NeRF360, DeepBlending, Tanks&Temples} sweeps with per-dataset voxel
sizes {0.001, 0.005, 0.01} and lambda grids. One typed entry point
replaces the bash loops; results aggregate into a single summary.json.

Usage:
  python -m gauspcc_tpu.cli.sweep --model hac \
      --data_root /data --dataset mipnerf360 --scenes bicycle,garden \
      --lmbdas 0.004,0.0005 --out_root runs/
"""

from __future__ import annotations

import argparse
import json
import os

import jax

DATASET_PRESETS = {
    # voxel_size per run_ours_*.sh:4-27
    "mipnerf360": {"voxel_size": 0.001, "images": "images_4"},
    "deepblending": {"voxel_size": 0.005, "images": "images"},
    "tandt": {"voxel_size": 0.01, "images": "images"},
    "nerf_synthetic": {"voxel_size": 0.001, "images": "", "white_background": True},
    # BungeeNeRF city scenes (CAT-3DGS/arguments/bungee.py): lr schedules
    # capped at 30k steps regardless of total iterations
    "bungee": {"voxel_size": 0.005, "images": "images", "lr_max_steps": 30_000},
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="gauspcc-sweep")
    p.add_argument("--model", default="hac",
                   choices=("hac", "hac_plus", "tcgs", "cat3dgs"))
    p.add_argument("--data_root", required=True)
    p.add_argument("--dataset", required=True, choices=sorted(DATASET_PRESETS))
    p.add_argument("--scenes", required=True, help="comma-separated scene dirs")
    p.add_argument("--lmbdas", default="0.004,0.0005")
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--out_root", default="runs")
    p.add_argument("--pcc_ckpt", default="")
    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    # after arg parsing: --help and usage errors must not pay
    # the jax import cost (ADVICE r4)
    compile_cache.enable()

    from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
    from gauspcc_tpu.data.scene import Scene
    from gauspcc_tpu.models import registry
    from gauspcc_tpu.models.hac import pipeline
    from gauspcc_tpu.models.hac import train as hac_train
    from gauspcc_tpu.utils import checkpoint

    preset = DATASET_PRESETS[args.dataset]
    fam = registry.get_family(args.model)
    pcc_cfg = pcc_model.NetConfig()
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(0), pcc_cfg)
    if args.pcc_ckpt:
        pcc_params = checkpoint.load_pytree(args.pcc_ckpt, pcc_params)

    summary = {}
    for scene_name in args.scenes.split(","):
        scene = Scene(
            os.path.join(args.data_root, scene_name),
            images_dir=preset.get("images") or "images",
            white_background=preset.get("white_background", False),
        )
        for lmbda in (float(x) for x in args.lmbdas.split(",")):
            run_dir = os.path.join(
                args.out_root, args.dataset, scene_name,
                f"{args.model}_l{lmbda}")
            cfg = fam.make_config(voxel_size=preset["voxel_size"])
            opt = hac_train.OptConfig(
                iterations=args.iterations, lmbda=lmbda,
                lr_max_steps=preset.get("lr_max_steps"))
            _, results = pipeline.train_scene(
                scene, cfg, opt, run_dir, pcc_params, pcc_cfg,
                white_background=preset.get("white_background", False),
                family=fam,
            )
            summary[f"{scene_name}/l{lmbda}"] = {
                "psnr": results.get("psnr"),
                "size_mb": results.get("size_mb"),
            }
            json.dump(summary, open(
                os.path.join(args.out_root, "summary.json"), "w"), indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
