"""CAT-3DGS training objective: triplane-ARM rate + chcm feature rate +
view-frequency-aware masking.

Parity: CAT-3DGS train.py:156-258 (loss: photometric + lmbda * (attribute
bits + ARM latent bits) / denom + mask reg; phases: scaffold warm-up ->
triplane fit -> joint RD) and scene/gaussian_model.py:293-314
(get_mask(weighted_mask) with per-anchor view-frequency weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gauspcc_tpu.core import entropy
from gauspcc_tpu.core.quant import uniform_noise_quant
from gauspcc_tpu.models.cat3dgs import field as cat_field
from gauspcc_tpu.models.cat3dgs import model as cat
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import image as img_lib


def phase_of_step(step: int, fit_iter: int = 10_000) -> int:
    """0: scaffold warm-up; 1: base-Q noise; 2: joint RD (after the PCA
    fit at `fit_iter`, CAT train.py:200-212)."""
    if step <= 3000:
        return 0
    if step <= fit_iter:
        return 1
    return 2


def weighted_mask(state, weights: jax.Array | None):
    """Sigmoid-STE mask with optional view-frequency weights
    (gaussian_model.py:293-314)."""
    logits = state["anchors"]["mask"]
    if weights is not None:
        logits = logits * weights[:, None, None]
    s = jax.nn.sigmoid(logits)
    return jax.lax.stop_gradient((s > 0.01).astype(jnp.float32) - s) + s


def training_loss(params, rest, cfg: cat.CATConfig, cam, rcfg, bg_color,
                  phase, key, means2d_extra, lmbda: float,
                  mask_weights=None, lambda_dssim: float = 0.2):
    state = hac.merge_state(params, rest)
    base = cfg.as_hac()
    visible = hac_render.prefilter_voxel(state, base, cam, rcfg)

    rate_total = None
    if phase < 2:
        ng, _ = hac.generate_neural_gaussians(
            state, base, cam.camera_center, visible,
            training=True, phase=min(phase, 1), key=key,
        )
    else:
        vis = visible & state["valid"]
        anchors = state["anchors"]
        anchor = hac.get_anchor(state, base)
        binary_mask = weighted_mask(state, mask_weights)
        mask_anchor = (jnp.sum(binary_mask, axis=1)[:, 0] > 0) & state["valid"]
        sel = (vis & mask_anchor)[:, None].astype(jnp.float32)
        k = cfg.n_offsets

        key, kq, k1, k2, k3 = jax.random.split(key, 5)
        planes_q = cat_field.quantized_planes(
            state["nets"]["field"], cfg.field, noise_key=kq
        )
        hyper = cat.hyper_split(state, cfg, anchor, planes_q)
        feat = uniform_noise_quant(anchors["anchor_feat"], hyper["q_feat"], k1)
        grid_scaling = uniform_noise_quant(
            hac.get_scaling(state), hyper["q_scaling"], k2)
        grid_offsets = uniform_noise_quant(
            anchors["offset"], hyper["q_offsets"][:, None, :], k3)

        hyper = cat.chcm_adjust(state, cfg, hyper, feat)
        f_mean, f_scale = cat.feature_stats(state, cfg, hyper, feat)
        bit_feat = entropy.gaussian_bits(
            feat, f_mean, f_scale, hyper["q_feat"],
            x_mean=jnp.mean(anchors["anchor_feat"])) * sel
        bit_scaling = entropy.gaussian_bits(
            grid_scaling, hyper["mean_scaling"], hyper["scale_scaling"],
            hyper["q_scaling"], x_mean=jnp.mean(hac.get_scaling(state))) * sel
        mask3 = jnp.repeat(binary_mask, 3, axis=-1).reshape(-1, 3 * k)
        bit_offsets = entropy.gaussian_bits(
            grid_offsets.reshape(-1, 3 * k), hyper["mean_offsets"],
            hyper["scale_offsets"], hyper["q_offsets"],
            x_mean=jnp.mean(anchors["offset"])) * mask3 * sel

        arm_bits = cat_field.field_rate_bits(
            state["nets"]["field"], cfg.field, planes_q)
        denom = jnp.maximum(jnp.sum(sel), 1.0) * (
            cfg.feat_dim + 6 + 3 * k)
        rate_total = (
            jnp.sum(bit_feat) + jnp.sum(bit_scaling) + jnp.sum(bit_offsets)
            + arm_bits
        ) / denom

        noisy = dict(state)
        na = dict(anchors)
        na["anchor_feat"] = feat
        na["offset"] = grid_offsets
        na["scaling"] = jnp.log(jnp.maximum(grid_scaling, 1e-9))
        na["mask"] = state["anchors"]["mask"]
        noisy["anchors"] = na
        ng, _ = hac.generate_neural_gaussians(
            noisy, base, cam.camera_center, visible, training=False)

    img, radii = raster.rasterize(
        means3d=ng.xyz, colors=ng.color, opacities=ng.opacity,
        scales=ng.scaling, rotations=ng.rot, viewmatrix=cam.viewmatrix,
        bg_color=bg_color, cfg=rcfg, valid=ng.valid,
        means2d_extra=means2d_extra,
    )
    gt = cam.image
    l1 = img_lib.l1_loss(img, gt)
    ssim_v = img_lib.ssim(img, gt)
    vmask = ng.valid.astype(jnp.float32)
    scaling_reg = jnp.sum(jnp.prod(ng.scaling, axis=1) * vmask) / jnp.maximum(
        jnp.sum(vmask), 1.0)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)
    loss = loss + 0.01 * scaling_reg
    if rate_total is not None:
        loss = loss + lmbda * rate_total
        loss = loss + 5e-4 * jnp.mean(jax.nn.sigmoid(state["anchors"]["mask"]))
    aux = {
        "l1": l1, "ssim": ssim_v, "psnr": img_lib.psnr(img, gt),
        "radii": radii, "visible_anchor": visible,
        "neural_opacity": ng.neural_opacity, "g_valid": ng.valid,
        "bit_per_param": rate_total if rate_total is not None
        else jnp.float32(0.0),
    }
    return loss, aux


def update_view_frequency(counts: jax.Array, visible: jax.Array) -> jax.Array:
    """Accumulate per-anchor visibility (CAT train.py:160-175 cam_mask)."""
    return counts + visible.astype(jnp.float32)


def view_frequency_weights(counts: jax.Array, valid: jax.Array) -> jax.Array:
    """weights = p / mean(p) over valid anchors (mask_weight modulation)."""
    p = counts
    mean_p = jnp.sum(jnp.where(valid, p, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    w = p / jnp.maximum(mean_p, 1e-9)
    return jnp.where(valid, w, 1.0)
