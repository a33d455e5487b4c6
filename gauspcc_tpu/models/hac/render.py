"""HAC rendering glue: prefilter + neural-Gaussian render + training loss.

Parity: HAC/gaussian_renderer/__init__.py (render :175-247,
prefilter_voxel :250-305) and the loss in HAC/train.py:190-202.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gauspcc_tpu.core import entropy
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import image as img_lib


class CameraArrays(NamedTuple):
    """Device-side camera (host Camera -> arrays once per view)."""

    viewmatrix: jax.Array  # [4,4] W2V^T
    camera_center: jax.Array  # [3]
    image: jax.Array  # [3, H, W] ground truth (zeros at eval)

    @staticmethod
    def from_camera(cam, with_image: bool = True):
        import numpy as np

        img = cam.image if (with_image and cam.image is not None) else np.zeros(
            (3, cam.height, cam.width), np.float32
        )
        return CameraArrays(
            viewmatrix=jnp.asarray(cam.world_view_transform),
            camera_center=jnp.asarray(cam.camera_center),
            image=jnp.asarray(img),
        )


def prefilter_voxel(state, cfg: hac.HACConfig, cam: CameraArrays,
                    rcfg: raster.RasterConfig, decoded: bool = False):
    """Anchor visibility mask [cap] (prefilter_voxel)."""
    return raster.visible_filter(
        hac.get_anchor(state, cfg, decoded),
        hac.get_scaling(state, decoded)[:, :3],
        state["anchors"]["rotation"],
        cam.viewmatrix,
        rcfg,
        valid=state["valid"],
    )


def render_view(state, cfg: hac.HACConfig, cam: CameraArrays,
                rcfg: raster.RasterConfig, bg_color: jax.Array,
                *, training: bool = False, phase: int = 0, key=None,
                decoded: bool = False, means2d_extra=None):
    visible = prefilter_voxel(state, cfg, cam, rcfg, decoded)
    ng, rate = hac.generate_neural_gaussians(
        state, cfg, cam.camera_center, visible,
        training=training, phase=phase, key=key, decoded=decoded,
    )
    img, radii = raster.rasterize(
        means3d=ng.xyz, colors=ng.color, opacities=ng.opacity,
        scales=ng.scaling, rotations=ng.rot, viewmatrix=cam.viewmatrix,
        bg_color=bg_color, cfg=rcfg, valid=ng.valid,
        means2d_extra=means2d_extra,
    )
    return {
        "render": img,
        "radii": radii,
        "gaussians": ng,
        "visible_anchor": visible,
        "rate": rate,
    }


@functools.lru_cache(maxsize=64)
def _eval_render_jit(cfg, rcfg, decoded: bool):
    """One compiled eval-render program per (config, raster shape, decoded)
    triple; further shape variation (anchor capacity) is handled by jit's
    own cache. Returns only the image so nothing else transfers back over
    the device link (the reference's render_set path reuses one CUDA
    graphically-identical kernel per view, HAC/train.py:385-437)."""

    def f(state, cam, bg_color):
        out = render_view(state, cfg, cam, rcfg, bg_color, decoded=decoded)
        return out["render"]

    return jax.jit(f)


def render_image(state, cfg: hac.HACConfig, cam: CameraArrays,
                 rcfg: raster.RasterConfig, bg_color: jax.Array,
                 *, decoded: bool = False) -> jax.Array:
    """Jitted eval render: [3, H, W] image only."""
    return _eval_render_jit(cfg, rcfg, bool(decoded))(state, cam, bg_color)


def training_loss(params, rest, cfg: hac.HACConfig, cam: CameraArrays,
                  rcfg: raster.RasterConfig, bg_color, phase, key,
                  means2d_extra, lmbda: float, lambda_dssim: float = 0.2):
    """Full HAC objective (train.py:190-202). phase: static schedule stage
    (see generate_neural_gaussians). Returns (loss, aux)."""
    state = hac.merge_state(params, rest)
    out = render_view(
        state, cfg, cam, rcfg, bg_color,
        training=True, phase=phase, key=key, means2d_extra=means2d_extra,
    )
    img = out["render"]
    gt = cam.image
    l1 = img_lib.l1_loss(img, gt)
    ssim_v = img_lib.ssim(img, gt)
    ng = out["gaussians"]
    vmask = ng.valid.astype(jnp.float32)
    scaling_reg = jnp.sum(
        jnp.prod(ng.scaling, axis=1) * vmask
    ) / jnp.maximum(jnp.sum(vmask), 1.0)

    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)
    loss = loss + 0.01 * scaling_reg

    rate = out["rate"]
    if rate is not None:
        flat = hac.encoding_params_flat(state)
        _, bit_hash = entropy.binary_size_bits((flat + 1.0) / 2.0)
        n_valid = jnp.maximum(jnp.sum(state["valid"].astype(jnp.float32)), 1.0)
        denom = n_valid * (cfg.feat_dim + 6 + 3 * cfg.n_offsets)
        loss = loss + lmbda * (rate["bit_per_param"] + bit_hash / denom)
        loss = loss + 5e-4 * jnp.mean(jax.nn.sigmoid(state["anchors"]["mask"]))

    aux = {
        "l1": l1,
        "ssim": ssim_v,
        "psnr": img_lib.psnr(img, gt),
        "radii": out["radii"],
        "visible_anchor": out["visible_anchor"],
        "neural_opacity": ng.neural_opacity,
        "g_valid": ng.valid,
        "bit_per_param": rate["bit_per_param"] if rate else jnp.float32(0.0),
    }
    return loss, aux
