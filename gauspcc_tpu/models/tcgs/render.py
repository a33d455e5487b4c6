"""TC-GS training objective: triplane-conditioned rate + AE recon loss.

Parity: TC-GS gaussian_renderer/__init__.py:40-110 (phases, lae after
15k) and train.py loss assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gauspcc_tpu.core import entropy
from gauspcc_tpu.core.quant import uniform_noise_quant
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.tcgs import model as tcgs
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import image as img_lib


def phase_of_step(step: int) -> int:
    """0: warm-up; 1: base-Q noise (3k..10k]; 2: triplane ctx + rate
    (10k..15k]; 3: + autoencoder loss (>15k)."""
    if step <= 3000:
        return 0
    if step <= 10000:
        return 1
    if step <= 15000:
        return 2
    return 3


def generate_neural_gaussians(state, cfg: tcgs.TCGSConfig, camera_center,
                              visible_mask, *, training=False, phase=0,
                              key=None, decoded=False):
    base = cfg.as_hac()
    if not (training and not decoded and phase >= 2):
        return (*hac.generate_neural_gaussians(
            state, base, camera_center, visible_mask,
            training=training, phase=min(phase, 1), key=key, decoded=decoded,
        ), None)

    vis = visible_mask & state["valid"]
    anchors = state["anchors"]
    anchor = hac.get_anchor(state, base)
    binary_mask = hac.get_mask(state)
    mask_anchor = hac.get_mask_anchor(state)
    sel = (vis & mask_anchor)[:, None].astype(jnp.float32)
    k = cfg.n_offsets

    lae = None
    ctx_feats = tcgs.triplane_context(state, cfg, anchor)
    if phase >= 3:
        _, recon = tcgs.reconstructed_planes(state)
        lae = img_lib.l1_loss(state["nets"]["planes"], recon)
    ctx = tcgs.grid_mlp_split(state, cfg, ctx_feats)

    k1, k2, k3 = jax.random.split(key, 3)
    feat = uniform_noise_quant(anchors["anchor_feat"], ctx["q_feat"], k1)
    grid_scaling = uniform_noise_quant(hac.get_scaling(state), ctx["q_scaling"], k2)
    grid_offsets = uniform_noise_quant(
        anchors["offset"], ctx["q_offsets"][:, None, :], k3
    )

    mask3 = jnp.repeat(binary_mask, 3, axis=-1).reshape(-1, 3 * k)
    bit_feat = entropy.gaussian_bits(
        feat, ctx["mean"], ctx["scale"], ctx["q_feat"],
        x_mean=jnp.mean(anchors["anchor_feat"])) * sel
    bit_scaling = entropy.gaussian_bits(
        grid_scaling, ctx["mean_scaling"], ctx["scale_scaling"],
        ctx["q_scaling"], x_mean=jnp.mean(hac.get_scaling(state))) * sel
    bit_offsets = entropy.gaussian_bits(
        grid_offsets.reshape(-1, 3 * k), ctx["mean_offsets"],
        ctx["scale_offsets"], ctx["q_offsets"],
        x_mean=jnp.mean(anchors["offset"])) * mask3 * sel
    denom = jnp.maximum(jnp.sum(sel), 1.0)
    rate = {
        "bit_per_param": (
            jnp.sum(bit_feat) + jnp.sum(bit_scaling) + jnp.sum(bit_offsets)
        ) / (denom * (cfg.feat_dim + 6 + 3 * k)),
    }

    noisy = dict(state)
    na = dict(anchors)
    na["anchor_feat"] = feat
    na["offset"] = grid_offsets
    na["scaling"] = jnp.log(jnp.maximum(grid_scaling, 1e-9))
    noisy["anchors"] = na
    ng, _ = hac.generate_neural_gaussians(
        noisy, base, camera_center, visible_mask, training=False
    )
    return ng, rate, lae


def training_loss(params, rest, cfg: tcgs.TCGSConfig, cam, rcfg, bg_color,
                  phase, key, means2d_extra, lmbda: float,
                  lambda_dssim: float = 0.2, lambda_ae: float = 1.0):
    state = hac.merge_state(params, rest)
    base = cfg.as_hac()
    visible = hac_render.prefilter_voxel(state, base, cam, rcfg)
    ng, rate, lae = generate_neural_gaussians(
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
        jnp.sum(vmask), 1.0)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)
    loss = loss + 0.01 * scaling_reg
    if rate is not None:
        loss = loss + lmbda * rate["bit_per_param"]
        loss = loss + 5e-4 * jnp.mean(jax.nn.sigmoid(state["anchors"]["mask"]))
    if lae is not None:
        loss = loss + lambda_ae * lae
    aux = {
        "l1": l1, "ssim": ssim_v, "psnr": img_lib.psnr(img, gt),
        "radii": radii, "visible_anchor": visible,
        "neural_opacity": ng.neural_opacity, "g_valid": ng.valid,
        "bit_per_param": rate["bit_per_param"] if rate else jnp.float32(0.0),
        "lae": lae if lae is not None else jnp.float32(0.0),
    }
    return loss, aux
