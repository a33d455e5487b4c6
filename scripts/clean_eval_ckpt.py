"""Clean-render PSNR of a training checkpoint: is the 'collapse' real?

Round-3 runs logged train/psnr from the TRAINING step, whose render
carries the phase-1 quantization noise (+-Q/2 on feat/scaling/offsets,
HAC/gaussian_renderer/__init__.py:51-55). That metric must drop once
step > b0 — the reference's own training logs dip the same way. This
probe loads a snapshot and renders WITHOUT noise on the held-out views
(and a few train views), which is the quantity eval actually reports.

  python scripts/clean_eval_ckpt.py --ckpt runs/soak_hac_r3z/train_ckpt.pkl
"""
import argparse
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/soak_hac_r3z/train_ckpt.pkl")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--scene", default="textured")
    p.add_argument("--gt_gaussians", type=int, default=6000)
    p.add_argument("--cams", type=int, default=24)
    p.add_argument("--seed_points", type=int, default=30000)
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--n_train_views", type=int, default=4)
    args = p.parse_args()

    import jax.numpy as jnp
    from gauspcc_tpu.cli.soak import build_scene
    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import pipeline, render as hac_render
    from gauspcc_tpu.utils import checkpoint, image as img_lib

    rng = np.random.default_rng(0)
    scene = build_scene(rng, args.hw, args.gt_gaussians, args.cams,
                        args.seed_points, kind=args.scene,
                        white_background=True)
    snap = checkpoint.load_training_checkpoint(args.ckpt)
    state = hac.merge_state(snap["params"], snap["rest"])
    cfg = hac.HACConfig(voxel_size=args.voxel_size)
    it = snap["iteration"]
    n_valid = int(np.asarray(state["valid"]).sum())
    feat = np.asarray(state["anchors"]["anchor_feat"])[np.asarray(state["valid"])]
    print(f"ckpt iter={it} anchors={n_valid} "
          f"feat std={feat.std():.3f} absmax={np.abs(feat).max():.2f}")

    bg = jnp.ones(3)
    for name, cams in (("test", scene.test_cameras),
                       ("train", scene.train_cameras[: args.n_train_views])):
        psnrs = []
        for cam in cams:
            ca = hac_render.CameraArrays.from_camera(cam)
            rcfg = pipeline._raster_cfg(cam)
            img = hac_render.render_image(state, cfg, ca, rcfg, bg)
            psnrs.append(float(img_lib.psnr(img, jnp.asarray(cam.image))))
        print(f"clean {name} PSNR: mean {np.mean(psnrs):.2f} "
              f"min {np.min(psnrs):.2f} max {np.max(psnrs):.2f} "
              f"({[round(x, 1) for x in psnrs]})")


if __name__ == "__main__":
    main()
