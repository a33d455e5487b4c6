"""HAC command-line driver.

Parity with the reference entry point (HAC/train.py:583-675 + arguments/):
train a scene end-to-end, then estimate/encode/decode/eval. The saved
config (cfg.json) is merged back for eval-only runs (the reference's
cfg_args mechanism, arguments/__init__.py:153-173, without the eval()).

Usage:
  python -m gauspcc_tpu.models.hac.cli train -s <scene_dir> -m <model_dir> \
      [--voxel_size 0.001 --lmbda 0.004 --iterations 30000 \
       --pcc_ckpt model/best_model.npz]
  python -m gauspcc_tpu.models.hac.cli eval -m <model_dir> -s <scene_dir>
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.data.scene import Scene
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import pipeline
from gauspcc_tpu.models.hac import train as hac_train
from gauspcc_tpu.utils import checkpoint


def _load_pcc(args):
    cfg = pcc_model.NetConfig(args.pcc_channels, args.pcc_kernel_size)
    params = pcc_model.init_params(jax.random.PRNGKey(0), cfg)
    if args.pcc_ckpt and os.path.exists(args.pcc_ckpt):
        params = checkpoint.load_pytree(args.pcc_ckpt, params)
    return params, cfg


def cmd_train(args):
    from gauspcc_tpu.models import registry

    fam = registry.get_family(args.model)
    kw = dict(
        feat_dim=args.feat_dim,
        n_offsets=args.n_offsets,
        voxel_size=args.voxel_size,
        update_depth=args.update_depth,
        update_init_factor=args.update_init_factor,
        update_hierachy_factor=args.update_hierachy_factor,
    )
    if args.model in ("hac", "hac_plus"):
        kw.update(log2_hashmap_size=args.log2, log2_hashmap_size_2d=args.log2_2D,
                  n_features_per_level=args.n_features)
    scene = Scene(args.source_path, eval_split=args.eval,
                  images_dir=args.images,
                  white_background=args.white_background)
    if args.model == "hac_plus":
        # the reference picks the tiny channel context for Synthetic-NeRF
        # scenes (transforms_train.json presence, HAC-plus/train.py:84,96)
        kw["tiny_ctx"] = scene.is_blender
    cfg = fam.make_config(**kw)
    opt = hac_train.OptConfig(iterations=args.iterations, lmbda=args.lmbda)
    pcc_params, pcc_cfg = _load_pcc(args)

    os.makedirs(args.model_path, exist_ok=True)
    json.dump(
        {"model": args.model, "hac": cfg._asdict(),
         "opt": dataclasses.asdict(opt), "source_path": args.source_path},
        open(os.path.join(args.model_path, "cfg.json"), "w"), indent=2,
    )
    gui = None
    if args.gui:
        from gauspcc_tpu.utils.network_gui import NetworkGUI

        gui = NetworkGUI(args.ip, args.port)
    try:
        pipeline.train_scene(
            scene, cfg, opt, args.model_path, pcc_params, pcc_cfg,
            white_background=args.white_background, family=fam,
            start_checkpoint=args.start_checkpoint,
            checkpoint_every=args.checkpoint_every, gui=gui,
        )
    finally:
        if gui is not None:
            gui.close()


def cmd_eval(args):
    meta = json.load(open(os.path.join(args.model_path, "cfg.json")))
    hac_kw = dict(meta["hac"])
    for k in ("resolutions_3d", "resolutions_2d"):
        hac_kw[k] = tuple(hac_kw[k])
    cfg = hac.HACConfig(**hac_kw)
    scene = Scene(args.source_path or meta["source_path"], eval_split=True,
                  images_dir=args.images)
    pcc_params, pcc_cfg = _load_pcc(args)

    # rebuild state template sized like the checkpoint, then load
    import numpy as np

    data = np.load(os.path.join(args.model_path, "model.npz"))
    cap = data["anchors/anchor"].shape[0]
    pts = hac.voxelize_points(scene.points, cfg.voxel_size)[: min(cap, 10)]
    template = hac.init_state(jax.random.PRNGKey(0), cfg, pts, capacity=cap)
    state = checkpoint.load_pytree(
        os.path.join(args.model_path, "model.npz"), template
    )
    bs_dir = os.path.join(args.model_path, "bitstreams")
    from gauspcc_tpu.models.hac import codec as hac_codec

    sizes, enc_log = hac_codec.conduct_encoding(state, cfg, bs_dir,
                                                pcc_params, pcc_cfg)
    print(enc_log)
    dec_state, dec_log = hac_codec.conduct_decoding(state, cfg, bs_dir,
                                                    pcc_params, pcc_cfg)
    print(dec_log)
    results = pipeline.evaluate(
        dec_state, cfg, scene.test_cameras,
        os.path.join(args.model_path, "test_renders"), decoded=True,
    )
    results["size_bits"] = sizes
    json.dump(results, open(os.path.join(args.model_path, "results.json"), "w"),
              indent=2, default=float)
    print(f"PSNR {results['psnr']}, size {sizes['total']/hac_codec.BIT2MB:.3f} MB")


def main(argv=None):
    p = argparse.ArgumentParser(prog="hac")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--model", default="hac",
                        choices=("hac", "hac_plus", "tcgs", "cat3dgs"))
        sp.add_argument("-s", "--source_path", default="")
        sp.add_argument("-m", "--model_path", required=True)
        sp.add_argument("--images", default="images")
        sp.add_argument("--pcc_ckpt", default="")
        sp.add_argument("--pcc_channels", type=int, default=32)
        sp.add_argument("--pcc_kernel_size", type=int, default=5)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--feat_dim", type=int, default=50)
    t.add_argument("--n_offsets", type=int, default=10)
    t.add_argument("--voxel_size", type=float, default=0.001)
    t.add_argument("--update_depth", type=int, default=3)
    t.add_argument("--update_init_factor", type=int, default=16)
    t.add_argument("--update_hierachy_factor", type=int, default=4)
    t.add_argument("--log2", type=int, default=19)
    t.add_argument("--log2_2D", type=int, default=17)
    t.add_argument("--n_features", type=int, default=2)
    t.add_argument("--iterations", type=int, default=30_000)
    t.add_argument("--lmbda", type=float, default=1e-3)
    t.add_argument("--eval", action="store_true", default=True)
    t.add_argument("--white_background", action="store_true")
    t.add_argument("--start_checkpoint", default=None,
                   help="resume from a train_ckpt.pkl snapshot")
    t.add_argument("--checkpoint_every", type=int, default=0,
                   help="write train_ckpt.pkl every N iterations")
    t.add_argument("--gui", action="store_true",
                   help="serve the SIBR remote-viewer protocol while training")
    t.add_argument("--ip", default="127.0.0.1")
    t.add_argument("--port", type=int, default=6009)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    common(e)
    e.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)

    from gauspcc_tpu.utils import compile_cache

    # after arg parsing: --help and usage errors must not pay
    # the jax import cost (ADVICE r4)
    compile_cache.enable()
    args.fn(args)


if __name__ == "__main__":
    main()
