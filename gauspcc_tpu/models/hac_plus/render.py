"""HAC++ rendering/training loss: HAC's path with mixture-coded features.

Parity: HAC-plus/gaussian_renderer/__init__.py:55-120 (rate terms via
EG_mix_prob_2 over (hyperprior, channel-AR) components) and the same
photometric/regularizer structure as HAC (HAC-plus/train.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gauspcc_tpu.core import entropy
from gauspcc_tpu.core.quant import uniform_noise_quant
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.hac_plus import model as hacp
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import image as img_lib


def rate_terms(state, cfg: hacp.HACPlusConfig, anchor, feat, grid_scaling,
               grid_offsets, binary_mask, sel, key):
    """Noise-quantized rate estimate with the 2-component feature mixture."""
    k = cfg.n_offsets
    k1, k2, k3 = jax.random.split(key, 3)
    ctx = hacp.grid_mlp_split(
        state, cfg, hac.calc_interp_feat(state, cfg.as_hac(), anchor)
    )
    feat = uniform_noise_quant(feat, ctx["q_feat"], k1)
    grid_scaling = uniform_noise_quant(grid_scaling, ctx["q_scaling"], k2)
    grid_offsets = uniform_noise_quant(grid_offsets, ctx["q_offsets"][:, None, :], k3)

    means, scales, probs = hacp.mixture_components(
        ctx, state["nets"]["channel_ctx"], cfg, feat
    )
    bit_feat = entropy.gaussian_mixture_bits(
        feat, means, scales, probs, ctx["q_feat"],
        x_mean=jnp.mean(state["anchors"]["anchor_feat"]),
    ) * sel
    bit_scaling = entropy.gaussian_bits(
        grid_scaling, ctx["mean_scaling"], ctx["scale_scaling"],
        ctx["q_scaling"], x_mean=jnp.mean(hac.get_scaling(state)),
    ) * sel
    mask3 = jnp.repeat(binary_mask, 3, axis=-1).reshape(-1, 3 * k)
    bit_offsets = entropy.gaussian_bits(
        grid_offsets.reshape(-1, 3 * k), ctx["mean_offsets"],
        ctx["scale_offsets"], ctx["q_offsets"],
        x_mean=jnp.mean(state["anchors"]["offset"]),
    ) * mask3 * sel
    denom = jnp.maximum(jnp.sum(sel), 1.0)
    rate = {
        "bit_per_feat_param": jnp.sum(bit_feat) / (denom * cfg.feat_dim),
        "bit_per_scaling_param": jnp.sum(bit_scaling) / (denom * 6),
        "bit_per_offsets_param": jnp.sum(bit_offsets) / (denom * 3 * k),
    }
    rate["bit_per_param"] = (
        jnp.sum(bit_feat) + jnp.sum(bit_scaling) + jnp.sum(bit_offsets)
    ) / (denom * (cfg.feat_dim + 6 + 3 * k))
    return rate, (feat, grid_scaling, grid_offsets)


def generate_neural_gaussians(state, cfg: hacp.HACPlusConfig, camera_center,
                              visible_mask, *, training=False, phase=0,
                              key=None, decoded=False):
    """HAC++ variant of hac.generate_neural_gaussians (mixture rate path)."""
    base = cfg.as_hac()
    if not (training and not decoded and phase == 2):
        return hac.generate_neural_gaussians(
            state, base, camera_center, visible_mask,
            training=training, phase=phase, key=key, decoded=decoded,
        )

    vis = visible_mask & state["valid"]
    anchors = state["anchors"]
    anchor = hac.get_anchor(state, base)
    binary_mask = hac.get_mask(state)
    mask_anchor = hac.get_mask_anchor(state)
    sel = (vis & mask_anchor)[:, None].astype(jnp.float32)

    rate, (feat, grid_scaling, grid_offsets) = rate_terms(
        state, cfg, anchor, anchors["anchor_feat"], hac.get_scaling(state),
        anchors["offset"], binary_mask, sel, key,
    )
    # rebuild gaussians from the noise-quantized attributes via the shared
    # tail of hac.generate_neural_gaussians
    noisy = dict(state)
    noisy_anchors = dict(anchors)
    noisy_anchors["anchor_feat"] = feat
    noisy_anchors["offset"] = grid_offsets
    # scaling is an activated quantity; write back through log
    noisy_anchors["scaling"] = jnp.log(jnp.maximum(grid_scaling, 1e-9))
    noisy["anchors"] = noisy_anchors
    ng, _ = hac.generate_neural_gaussians(
        noisy, base, camera_center, visible_mask,
        training=False, decoded=False,
    )
    return ng, rate


def training_loss(params, rest, cfg: hacp.HACPlusConfig, cam, rcfg, bg_color,
                  phase, key, means2d_extra, lmbda: float,
                  lambda_dssim: float = 0.2):
    state = hac.merge_state(params, rest)
    base = cfg.as_hac()
    visible = hac_render.prefilter_voxel(state, base, cam, rcfg)
    ng, rate = generate_neural_gaussians(
        state, cfg, cam.camera_center, visible,
        training=True, phase=phase, key=key,
    )
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
        jnp.sum(vmask), 1.0
    )
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)
    loss = loss + 0.01 * scaling_reg
    if rate is not None:
        flat = hac.encoding_params_flat(state)
        _, bit_hash = entropy.binary_size_bits((flat + 1.0) / 2.0)
        n_valid = jnp.maximum(jnp.sum(state["valid"].astype(jnp.float32)), 1.0)
        denom = n_valid * (cfg.feat_dim + 6 + 3 * cfg.n_offsets)
        loss = loss + lmbda * (rate["bit_per_param"] + bit_hash / denom)
        loss = loss + 5e-4 * jnp.mean(jax.nn.sigmoid(state["anchors"]["mask"]))
    aux = {
        "l1": l1, "ssim": ssim_v, "psnr": img_lib.psnr(img, gt),
        "radii": radii, "visible_anchor": visible,
        "neural_opacity": ng.neural_opacity, "g_valid": ng.valid,
        "bit_per_param": rate["bit_per_param"] if rate else jnp.float32(0.0),
    }
    return loss, aux
