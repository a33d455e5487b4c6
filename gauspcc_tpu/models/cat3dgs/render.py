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


FIT_ITER = 10_000


def phase_of_step(step: int, fit_iter: int = FIT_ITER) -> int:
    """CAT's dedicated training phases (train.py:235-238 rate-only window,
    :279-317 per-phase optimizer gating):

      0: scaffold warm-up (<=3000)
      1: scaffold + mask reg (<=fit_iter; PCA fit happens at the 1->2 edge)
      2: joint RD, ARMs frozen              [fit, fit+5000)
      3: rate-only (loss = ARM latent bits), only ARMs train  [+5000, +6000)
      4: joint RD, triplane latents frozen  [+6000, +9000)
      5: joint RD, everything trains        [+9000, ...)

    Phases >= 2 all run the RD objective; the freeze sets are applied by
    :func:`grad_mask` (the JAX analogue of the reference's four optimizers
    stepping selectively)."""
    if step <= 3000:
        return 0
    if step <= fit_iter:
        return 1
    if step <= fit_iter + 5000:
        return 2
    if step <= fit_iter + 6000:
        return 3
    if step <= fit_iter + 9000:
        return 4
    return 5


def _zero_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def grad_mask(grads, phase: int):
    """Freeze parameter groups per phase (CAT train.py:279-317):
    phase 2 freezes the ARMs; phase 3 trains ONLY the ARMs; phase 4
    freezes the triplane latents. `phase` is static under jit so the
    masking costs nothing at runtime."""
    if phase not in (2, 3, 4):
        return grads
    grads = dict(grads)
    nets = dict(grads["nets"])
    field = dict(nets["field"])
    if phase == 2:
        field["arms"] = _zero_tree(field["arms"])
    elif phase == 3:
        arms = field["arms"]
        grads = _zero_tree(grads)
        nets = dict(grads["nets"])
        field = dict(nets["field"])
        field["arms"] = arms
    elif phase == 4:
        field["scales"] = _zero_tree(field["scales"])
    nets["field"] = field
    grads["nets"] = nets
    return grads


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
                  lambda_dssim: float = 0.2, mask_weights=None):
    state = hac.merge_state(params, rest)
    base = cfg.as_hac()
    visible = hac_render.prefilter_voxel(state, base, cam, rcfg)

    rate_total = None
    arm_rate = None
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
        arm_rate = arm_bits / denom
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
    if phase >= 1:
        # mask reg from iter 3000 with coeff max(1e-3, 0.3*lmbda)
        # (CAT train.py:230-233)
        loss = loss + max(1e-3, 0.3 * lmbda) * jnp.mean(
            jax.nn.sigmoid(state["anchors"]["mask"]))
    if rate_total is not None:
        loss = loss + lmbda * rate_total
    if phase == 3:
        # dedicated 1000-iter rate-only window: the objective is the ARM
        # latent rate alone (CAT train.py:235-236 `loss = feat_rate_per_param`)
        loss = arm_rate
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
