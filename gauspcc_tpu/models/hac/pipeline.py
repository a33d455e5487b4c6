"""Full HAC scene pipeline: train -> estimate -> encode -> decode -> eval.

Parity: HAC/train.py (training() :88-257, training_report codec eval
:291-382, render_sets :440-480, evaluate :496-563). Produces the same
artifacts: per-view renders, results.json with PSNR/SSIM/LPIPS* and FPS,
bitstream directory with per-component sizes.

(*) LPIPS requires pretrained VGG features; in this zero-egress
environment it is reported as null unless a weights file is provided
(utils/lpips.py).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.data.scene import Scene
from gauspcc_tpu.models.hac import codec as hac_codec
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.hac import train as hac_train
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import checkpoint, image as img_lib
from gauspcc_tpu.utils.heartbeat import DivergenceMonitor, NullHeartbeat


def _raster_cfg(cam, max_k: int = 256, max_d: int = 32) -> raster.RasterConfig:
    return raster.RasterConfig(
        height=cam.height, width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        max_gaussians_per_tile=max_k,
        max_tiles_per_gaussian=max_d,
    )


@functools.lru_cache(maxsize=16)
def _saturation_jit(cfg, rcfg):
    """Bounded-work cap diagnostics for the training raster config: are
    Gaussian footprints overflowing D, or tile lists overflowing K?"""
    import jax

    def f(state, cam):
        visible = hac_render.prefilter_voxel(state, cfg, cam, rcfg)
        ng, _ = hac.generate_neural_gaussians(
            state, cfg, cam.camera_center, visible)
        s = raster.tile_saturation(
            ng.xyz, ng.scaling, ng.rot, cam.viewmatrix, rcfg, valid=ng.valid)
        return (s["frac_gauss_over_d"], s["frac_tiles_over_k"],
                s["max_tile_count"])

    return jax.jit(f)


@functools.lru_cache(maxsize=16)
def _footprint_jit(cfg, rcfg, decoded: bool):
    import jax

    def f(state, cam):
        visible = hac_render.prefilter_voxel(state, cfg, cam, rcfg, decoded)
        ng, _ = hac.generate_neural_gaussians(
            state, cfg, cam.camera_center, visible, decoded=decoded)
        return raster.max_tile_footprint(
            ng.xyz, ng.scaling, ng.rot, cam.viewmatrix, rcfg, valid=ng.valid)

    return jax.jit(f)


def select_eval_d(state, cfg, cameras, decoded: bool = False,
                  cap: int = 128) -> int:
    """Smallest power-of-two per-Gaussian tile cap D that covers the
    largest footprint over all eval views — EXACTLY equal to an unbounded
    D, so shrinking it only cuts the binning sort's N*D pair buffer (the
    frame-time wall at worst-case load, BASELINE.md). One cheap
    project-only program per shape bucket; no probe renders."""
    worst = 0
    for cam in cameras:
        rcfg = _raster_cfg(cam)
        ca = hac_render.CameraArrays.from_camera(cam, with_image=False)
        fp = int(_footprint_jit(cfg, rcfg, bool(decoded))(state, ca))
        worst = max(worst, fp)
    d = 4
    while d < min(worst, cap):
        d *= 2
    return d


def select_eval_k(state, cfg, cam, decoded: bool = False,
                  start_k: int = 256, max_k: int = 4096,
                  tol_db: float = 45.0) -> int:
    """Pick the smallest per-tile cap K whose render matches the 2K render
    to >= tol_db PSNR (VERDICT r2 item 6: the reference rasterizer blends
    unbounded lists, HAC/gaussian_renderer/__init__.py:217-225; our
    bounded-K eval must provably lose nothing). Doubles K until the
    truncation tail is invisible; the consecutive-K PSNR bounds the gap to
    the unbounded render since dropped Gaussians sit behind ever-smaller
    transmittance."""
    import jax.numpy as jnp  # local: keep module import surface stable

    ca = hac_render.CameraArrays.from_camera(cam, with_image=False)
    bg = jnp.zeros(3)
    k = start_k
    img_k = hac_render.render_image(state, cfg, ca, _raster_cfg(cam, k), bg,
                                    decoded=decoded)
    while k < max_k:
        img_2k = hac_render.render_image(
            state, cfg, ca, _raster_cfg(cam, 2 * k), bg, decoded=decoded)
        if float(img_lib.psnr(img_k, img_2k)) >= tol_db:
            return k
        k *= 2
        img_k = img_2k
    return k


def adapt_caps(state, cfg, rc: raster.RasterConfig, cam,
               log=print, max_d: int = 256, max_k: int = 1024):
    """Grow the bounded-work raster caps when the scene outgrows them.

    Training against an over-truncated forward is what collapsed the
    round-3/4 soaks: the model co-adapts to the truncation and the true
    render falls apart (runs/soak_hac_r4, BASELINE.md r4). The reference
    rasterizer is unbounded, so cap growth is the price of static shapes —
    checked every cap_adapt_every steps inside train_scene, doubling D/K
    (one recompile each, a handful per run). Returns (rc, grew)."""
    cfg_h = cfg.as_hac() if hasattr(cfg, "as_hac") else cfg
    over_d, over_k, max_cnt = (
        float(x) for x in _saturation_jit(cfg_h, rc)(state, cam))
    grew = False
    if over_d > 0.05 and rc.max_tiles_per_gaussian < max_d:
        rc = rc._replace(
            max_tiles_per_gaussian=rc.max_tiles_per_gaussian * 2)
        grew = True
    if over_k > 0.02 and rc.max_gaussians_per_tile < max_k:
        rc = rc._replace(
            max_gaussians_per_tile=rc.max_gaussians_per_tile * 2)
        grew = True
    if grew:
        log(f"raster caps -> D={rc.max_tiles_per_gaussian} "
            f"K={rc.max_gaussians_per_tile} (over_d {over_d:.3f}, "
            f"over_k {over_k:.3f}, max_tile {max_cnt:.0f})")
    return rc, grew


def train_scene(
    scene: Scene,
    cfg,
    opt: hac_train.OptConfig,
    model_dir: str,
    pcc_params=None,
    pcc_cfg=None,
    seed: int = 0,
    log_every: int = 200,
    eval_at_end: bool = True,
    white_background: bool = False,
    logger=None,
    family=None,
    start_checkpoint: str | None = None,
    checkpoint_every: int = 0,
    gui=None,
    stop_at: int | None = None,
    scalar_logger=None,
    heartbeat=None,
    divergence_drop_db: float = 3.0,
):
    """Train one scene end-to-end; returns (state, results dict).

    `family` (models.registry.Family) switches the context model + codec;
    default is HAC. cfg must be the family's config type.

    `start_checkpoint`: resume a snapshot written by `checkpoint_every > 0`
    (params + optimizer state + stats + iteration + rng streams), parity
    with HAC/train.py:108-110,250-252. `gui`: a utils.network_gui.NetworkGUI
    polled every iteration (HAC/train.py:122-136).

    `heartbeat`: a utils.heartbeat.Heartbeat proving liveness to an
    external stall watchdog through recompiles (r4c failure mode).
    `divergence_drop_db`: abort once the clean-render canary falls this
    far below its running max (r4's soak burned 2h post-collapse); the
    aborted run returns results with an "aborted_divergence" record and
    skips the final codec eval."""
    from gauspcc_tpu.models import registry

    if family is None:
        family = registry.get_family("hac")
    hb = heartbeat if heartbeat is not None else NullHeartbeat()
    canary_mon = DivergenceMonitor(drop_db=divergence_drop_db, warmup=1)
    diverged = None
    os.makedirs(model_dir, exist_ok=True)
    log = logger.info if logger else print
    ckpt_path = os.path.join(model_dir, "train_ckpt.pkl")

    optimizer = hac_train.make_optimizer(opt, scene.cameras_extent)
    cams = scene.train_cameras
    rcfg = _raster_cfg(cams[0])
    cam_arrays = [hac_render.CameraArrays.from_camera(c) for c in cams]

    if start_checkpoint:
        snap = checkpoint.load_training_checkpoint(start_checkpoint)
        params, rest, opt_state, stats = (
            snap["params"], snap["rest"], snap["opt_state"], snap["stats"]
        )
        key = jnp.asarray(snap["key"])
        rng = snap["rng"]
        order = list(snap["order"])
        first_it = snap["iteration"] + 1
        log(f"resumed from {start_checkpoint} at iteration {snap['iteration']}")
    else:
        points = hac.voxelize_points(scene.points, cfg.voxel_size, seed)
        state = family.init_state(jax.random.PRNGKey(seed), cfg, points)
        state = hac.update_anchor_bound(state)
        log(f"anchors at init: {points.shape[0]}")
        params, rest = hac.split_state(state)
        opt_state = optimizer.init(params)
        stats = hac_train.zero_stats(rest["valid"].shape[0], cfg.n_offsets)
        key = jax.random.PRNGKey(seed + 1)
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(cam_arrays)).tolist()
        first_it = 1

    def _mk_step(rc):
        return hac_train.make_train_step(
            cfg, rc, optimizer, opt, loss_fn=family.training_loss,
            grad_mask=family.grad_mask, white_background=white_background)

    step_fn = _mk_step(rcfg)

    def _adapt_caps(rc, params, rest, cam):
        st = hac.merge_state(params, rest)
        return adapt_caps(st, cfg, rc, cam, log=log)

    cap_adapt_every = 500
    last_it = min(opt.iterations, stop_at) if stop_at else opt.iterations
    t0 = time.time()
    for it in range(first_it, last_it + 1):
        if cap_adapt_every and (it == first_it or it % cap_adapt_every == 0):
            with hb.guard("adapt_caps"):
                rcfg, grew = _adapt_caps(rcfg, params, rest, cam_arrays[0])
            if grew:
                step_fn = _mk_step(rcfg)
        if gui is not None:
            _poll_gui(gui, hac.merge_state(params, rest), cfg, model_dir)
        if not order:
            order = rng.permutation(len(cam_arrays)).tolist()
        cam = cam_arrays[order.pop()]
        key, sub = jax.random.split(key)
        phase = family.phase_of_step(it)
        if phase >= 2 and family.phase_of_step(it - 1) < 2:
            # re-fit the context AABB to the densified anchors before the
            # rate phase (the reference's update_anchor_bound at step 10000,
            # gaussian_renderer/__init__.py:57-58) + family extras (PCA fit)
            state = hac.merge_state(params, rest)
            state = hac.update_anchor_bound(state)
            if family.extra_init is not None:
                state = family.extra_init(state, cfg)
            params, rest = hac.split_state(state)
        # any step may recompile (cap growth just above, or an anchor
        # bucket crossing after densification); the guard keeps the
        # watchdog's heartbeat file warm through the compile, bounded so
        # a true device hang still surfaces (utils/heartbeat.py)
        with hb.guard("step"):
            params, opt_state, stats, metrics = step_fn(
                params, rest, opt_state, stats, cam, sub, phase=phase,
            )
        hb.beat()
        if it % log_every == 0:
            log(
                f"iter {it}: loss {float(metrics['loss']):.4f} "
                f"psnr {float(metrics['psnr']):.2f} "
                f"bpp {float(metrics['bit_per_param']):.4f} "
                f"({(time.time()-t0)/(it - first_it + 1):.3f} s/it)"
            )
            if scalar_logger is not None:
                # TB/wandb scalar streams (HAC/train.py:283-286,634-645)
                scalar_logger.log(it, {
                    "train/loss": metrics["loss"],
                    "train/l1": metrics["l1"],
                    "train/psnr": metrics["psnr"],
                    "train/bit_per_param": metrics["bit_per_param"],
                    "train/iter_time": (time.time() - t0) / (it - first_it + 1),
                })
        # densification (train.py:229-240; paused 3000-4000 to settle Q)
        densify = (
            opt.start_stat < it < opt.update_until
            and it > opt.update_from
            and it % opt.update_interval == 0
            and not (3000 <= it < 4000)
        )
        if densify:
            state = hac.merge_state(params, rest)
            state, stats, opt_state, info = hac_train.adjust_anchor(
                state, stats, opt_state, cfg, opt, rng
            )
            params, rest = hac.split_state(state)
            if it % (opt.update_interval * 10) == 0:
                log(f"iter {it}: anchors {info['n_anchors']} "
                    f"(+{info['n_added']}/-{info['n_pruned']})")
        if checkpoint_every and it % checkpoint_every == 0:
            if os.path.exists(ckpt_path):  # keep one generation of history
                os.replace(ckpt_path, ckpt_path + ".prev")
            checkpoint.save_training_checkpoint(ckpt_path, {
                "params": params, "rest": rest, "opt_state": opt_state,
                "stats": stats, "iteration": it, "key": key, "rng": rng,
                "order": list(order),
            })
            log(f"iter {it}: checkpoint -> {ckpt_path}")
            # clean-render canary: the training-time psnr metric renders
            # through quantization noise AND the bounded training caps, so
            # it can look healthy while the true render rots (exactly how
            # the r3/r4 collapses stayed invisible until final eval).
            # Render 2 held-out views with honest caps every checkpoint.
            if scene.test_cameras:
                st = hac.merge_state(params, rest)
                cfg_h = cfg.as_hac() if hasattr(cfg, "as_hac") else cfg
                bg = (jnp.ones(3, jnp.float32) if white_background
                      else jnp.zeros(3, jnp.float32))
                ps = []
                with hb.guard("canary"):
                    for c in scene.test_cameras[:2]:
                        ca = hac_render.CameraArrays.from_camera(c)
                        rc_eval = _raster_cfg(c, max_k=1024, max_d=256)
                        img = hac_render.render_image(
                            st, cfg_h, ca, rc_eval, bg)
                        ps.append(
                            float(img_lib.psnr(img, jnp.asarray(c.image))))
                canary = float(np.mean(ps))
                log(f"iter {it}: clean-render canary PSNR "
                    f"{canary:.2f} {['%.1f' % p for p in ps]}")
                if scalar_logger is not None:
                    scalar_logger.log(it, {"eval/psnr_clean": canary})
                if canary_mon.update(canary):
                    # the model has collapsed (r4 failure mode: train-time
                    # metrics look alive while the true render rots).
                    # Surrender the chip: checkpoint is already on disk
                    # for this iter; record the evidence and stop.
                    diverged = {
                        "iteration": it,
                        "canary_db": canary,
                        "canary_best_db": canary_mon.best,
                        "drop_db": canary_mon.best - canary,
                    }
                    json.dump(diverged, open(
                        os.path.join(model_dir, "DIVERGED.json"), "w"),
                        indent=2)
                    log(f"iter {it}: DIVERGENCE ABORT — canary "
                        f"{canary:.2f} dB is "
                        f"{canary_mon.best - canary:.2f} dB below the "
                        f"running max {canary_mon.best:.2f}; stopping "
                        f"(checkpoint at {ckpt_path})")
                    break

    state = hac.merge_state(params, rest)
    checkpoint.save_pytree(os.path.join(model_dir, "model.npz"), state)

    results = {}
    if diverged is not None:
        results["aborted_divergence"] = diverged
        return state, results
    if eval_at_end and pcc_params is not None:
        if family.name == "hac":
            _, est_log = hac_codec.estimate_final_bits(state, cfg)
            log(est_log)
        bs_dir = os.path.join(model_dir, "bitstreams")
        with hb.guard("encode"):
            sizes, enc_log = family.conduct_encoding(
                state, cfg, bs_dir, pcc_params, pcc_cfg
            )
        log(enc_log)
        with hb.guard("decode"):
            dec_state, dec_log = family.conduct_decoding(
                state, cfg, bs_dir, pcc_params, pcc_cfg
            )
        log(dec_log)
        with hb.guard("eval_decoded"):
            results = evaluate(
                dec_state, cfg,
                scene.test_cameras or scene.train_cameras[:2],
                os.path.join(model_dir, "test_renders"),
                white_background=white_background, decoded=True,
            )
        # the reference's core claim is that coding costs ~nothing: report
        # the float-model PSNR on the same views and the encode->decode
        # delta alongside (HAC/train.py:291-382 logs both paths)
        with hb.guard("eval_float"):
            float_res = evaluate(
                state, cfg, scene.test_cameras or scene.train_cameras[:2],
                os.path.join(model_dir, "float_renders"),
                white_background=white_background, decoded=False,
            )
        results["psnr_float"] = float_res["psnr"]
        if results.get("psnr") is not None and float_res["psnr"] is not None:
            results["codec_delta_db"] = float_res["psnr"] - results["psnr"]
        results["size_bits"] = sizes
        results["size_mb"] = sizes["total"] / hac_codec.BIT2MB
        json.dump(results, open(os.path.join(model_dir, "results.json"), "w"),
                  indent=2, default=float)
        log(f"eval: PSNR {results['psnr']:.3f}, "
            f"size {results['size_mb']:.3f} MB")
        if scalar_logger is not None:
            scalar_logger.log(last_it, {
                "eval/psnr": results.get("psnr"),
                "eval/ssim": results.get("ssim"),
                "eval/fps": results.get("fps"),
                "eval/size_mb": results.get("size_mb"),
            })
    return state, results


def render_sets(state, cfg, cameras, out_dir: str,
                white_background: bool = False, decoded: bool = False,
                max_k: int = 256, max_d: int = 32):
    """Render all views; saves PNGs when PIL is available; returns arrays
    + FPS (render_set, HAC/train.py:385-437)."""
    cfg = cfg.as_hac() if hasattr(cfg, "as_hac") else cfg
    os.makedirs(out_dir, exist_ok=True)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    renders = []
    t_total = 0.0
    warmed: set = set()
    for i, cam in enumerate(cameras):
        rcfg = _raster_cfg(cam, max_k, max_d)
        ca = hac_render.CameraArrays.from_camera(cam, with_image=False)
        if (rcfg, cam.height, cam.width) not in warmed:
            # compile once per shape bucket outside the FPS clock (the
            # reference's CUDA kernels are pre-built; counting XLA compile
            # as render time would misreport steady-state FPS)
            hac_render.render_image(
                state, cfg, ca, rcfg, bg, decoded=decoded
            ).block_until_ready()
            warmed.add((rcfg, cam.height, cam.width))
        t0 = time.time()
        img = np.asarray(
            hac_render.render_image(state, cfg, ca, rcfg, bg, decoded=decoded)
        )  # blocks
        t_total += time.time() - t0
        renders.append(img)
        _save_png(img, os.path.join(out_dir, f"{i:05d}.png"))
    fps = len(cameras) / max(t_total, 1e-9)
    return renders, fps


def evaluate(state, cfg, cameras, out_dir: str,
             white_background: bool = False, decoded: bool = False,
             auto_k: bool = True) -> dict:
    """PSNR/SSIM(/LPIPS when available) against ground-truth views
    (evaluate, HAC/train.py:496-563). Works for every family: the decoded
    render path only touches the shared scaffold. auto_k probes the first
    camera for the smallest visually-lossless per-tile cap."""
    cfg = cfg.as_hac() if hasattr(cfg, "as_hac") else cfg
    max_k, max_d = 256, 32
    if auto_k and cameras:
        max_k = select_eval_k(state, cfg, cameras[0], decoded=decoded)
        max_d = select_eval_d(state, cfg, cameras, decoded=decoded)
    # progress heartbeat: the eval phase is otherwise silent for minutes,
    # which external stall watchdogs misread as a hung device
    print(f"eval: K={max_k} D={max_d}, rendering {len(cameras)} views",
          flush=True)
    renders, fps = render_sets(state, cfg, cameras, out_dir,
                               white_background, decoded,
                               max_k=max_k, max_d=max_d)
    print(f"eval: {len(renders)} views rendered, computing metrics",
          flush=True)
    psnrs, ssims, lpipss = [], [], []
    lpips_fn = _try_lpips()
    # the bare "lpips" key is reserved for the real pretrained metric: a
    # surrogate value under that name WILL be compared against published
    # LPIPS by some reader (VERDICT r3 weak #5). The random-feature
    # surrogate publishes only as "lpips_surrogate" + variant tag.
    variant = getattr(lpips_fn, "variant", None) if lpips_fn else None
    lpips_key = "lpips" if variant == "vgg16_pretrained" else "lpips_surrogate"
    per_view = {}
    for i, (cam, img) in enumerate(zip(cameras, renders)):
        if cam.image is None:
            continue
        gt = jnp.asarray(cam.image)
        im = jnp.asarray(img)
        p = float(img_lib.psnr(im, gt))
        s = float(img_lib.ssim(im, gt))
        psnrs.append(p)
        ssims.append(s)
        entry = {"psnr": p, "ssim": s}
        if lpips_fn is not None:
            entry[lpips_key] = float(lpips_fn(im, gt))
            lpipss.append(entry[lpips_key])
        per_view[f"{i:05d}"] = entry
    return {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "eval_k": max_k,
        "eval_d": max_d,
        lpips_key: float(np.mean(lpipss)) if lpipss else None,
        # "vgg16_pretrained" when a real weights npz is supplied;
        # "vgg_random_v1" = deterministic surrogate (not paper-comparable)
        "lpips_variant": variant,
        "fps": fps,
        "per_view": per_view,
    }


def _poll_gui(gui, state, cfg, verify: str) -> None:
    """Serve the SIBR remote viewer between training steps
    (HAC/train.py:122-136): render the requested camera and keep serving
    while the viewer has training paused (do_training=False)."""
    from gauspcc_tpu.utils import network_gui

    while gui.try_connect():
        try:
            cam_dict, do_training, keep_alive, _scale = gui.receive()
            img_bytes = None
            if cam_dict is not None:
                wvt = cam_dict["world_view_transform"]
                cc = np.linalg.inv(wvt)[3, :3]
                cam = hac_render.CameraArrays(
                    viewmatrix=jnp.asarray(wvt),
                    camera_center=jnp.asarray(cc),
                    image=jnp.zeros(
                        (3, cam_dict["height"], cam_dict["width"]), jnp.float32
                    ),
                )
                rcfg = raster.RasterConfig(
                    height=cam_dict["height"], width=cam_dict["width"],
                    tanfovx=float(np.tan(cam_dict["fovx"] * 0.5)),
                    tanfovy=float(np.tan(cam_dict["fovy"] * 0.5)),
                    max_gaussians_per_tile=256,
                )
                out = hac_render.render_view(
                    state, cfg, cam, rcfg, jnp.zeros(3)
                )
                img_bytes = network_gui.image_to_bytes(np.asarray(out["render"]))
            gui.send(img_bytes, verify)
            if do_training or not keep_alive:
                break
        except Exception:
            gui.disconnect()
            break


def _save_png(img_chw: np.ndarray, path: str) -> None:
    try:
        from PIL import Image
    except ImportError:
        np.save(path.replace(".png", ".npy"), img_chw)
        return
    arr = np.clip(img_chw.transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _try_lpips():
    try:
        from gauspcc_tpu.utils.lpips import load_default_lpips

        return load_default_lpips()
    except Exception:
        return None
