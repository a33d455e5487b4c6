"""HAC scene training: jitted step, densification, optimizer plumbing.

Parity: HAC/train.py:88-257 (loop, loss, schedule gates) and
gaussian_model.py:758-968 (training_statis, anchor_growing, adjust_anchor).

TPU-first split: the gradient/update step and the per-step densification
statistics are one jitted program over fixed-capacity buffers; anchor
growth/pruning every `update_interval` steps runs on host (numpy) and
rewrites the buffers + Adam moments, re-bucketing capacity when needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import optax

from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.render import raster
from gauspcc_tpu.utils import optim


@dataclass
class OptConfig:
    """OptimizationParams defaults (HAC/arguments/__init__.py:80-151)."""

    iterations: int = 30_000
    offset_lr_init: float = 0.01
    offset_lr_final: float = 0.0001
    mask_lr_init: float = 0.01
    mask_lr_final: float = 0.0001
    feature_lr: float = 0.0075
    scaling_lr: float = 0.007
    mlp_opacity_lr_init: float = 2e-3
    mlp_opacity_lr_final: float = 2e-5
    mlp_cov_lr_init: float = 4e-3
    mlp_cov_lr_final: float = 4e-3
    mlp_color_lr_init: float = 8e-3
    mlp_color_lr_final: float = 5e-5
    encoding_lr_init: float = 5e-3
    encoding_lr_final: float = 1e-5
    encoding_lr_delay_mult: float = 0.33
    mlp_grid_lr_init: float = 5e-3
    mlp_grid_lr_final: float = 1e-5
    mlp_deform_lr_init: float = 5e-3
    mlp_deform_lr_final: float = 5e-4
    lambda_dssim: float = 0.2
    lmbda: float = 1e-3  # rate weight (run scripts use 4e-3 / 5e-4)
    start_stat: int = 500
    update_from: int = 1500
    update_interval: int = 100
    update_until: int = 15_000
    min_opacity: float = 0.005
    success_threshold: float = 0.8
    densify_grad_threshold: float = 0.0002
    # cap for every per-group lr schedule; None = iterations. The CAT
    # bungee variant pins all *_lr_max_steps to 30000 while training 40k
    # iterations (CAT-3DGS/arguments/bungee.py).
    lr_max_steps: int | None = None


def make_optimizer(opt: OptConfig, spatial_lr_scale: float):
    """Per-group Adam; unknown groups (family-specific nets like planes,
    autoencoder, channel_ctx, field, mlp_attr, mlp_chcm, mlp_triplane)
    fall back to the mlp_grid schedule."""
    m = opt.lr_max_steps or opt.iterations
    lrs = {
        "offset": optim.expon_lr(opt.offset_lr_init * spatial_lr_scale,
                                 opt.offset_lr_final * spatial_lr_scale, m,
                                 lr_delay_mult=0.01),
        "mask": optim.expon_lr(opt.mask_lr_init * spatial_lr_scale,
                               opt.mask_lr_final * spatial_lr_scale, m,
                               lr_delay_mult=0.01),
        "anchor_feat": optim.expon_lr(opt.feature_lr, opt.feature_lr, m),
        "scaling": optim.expon_lr(opt.scaling_lr, opt.scaling_lr, m),
        "mlp_opacity": optim.expon_lr(opt.mlp_opacity_lr_init,
                                      opt.mlp_opacity_lr_final, m),
        "mlp_cov": optim.expon_lr(opt.mlp_cov_lr_init, opt.mlp_cov_lr_final, m),
        "mlp_color": optim.expon_lr(opt.mlp_color_lr_init,
                                    opt.mlp_color_lr_final, m),
        "tables": optim.expon_lr(opt.encoding_lr_init, opt.encoding_lr_final,
                                 m, lr_delay_mult=opt.encoding_lr_delay_mult),
        "mlp_grid": optim.expon_lr(opt.mlp_grid_lr_init, opt.mlp_grid_lr_final, m),
        "mlp_deform": optim.expon_lr(opt.mlp_deform_lr_init,
                                     opt.mlp_deform_lr_final, m),
    }

    def group_of(path):
        keys = optim.path_key(path)
        if keys[0] == "anchors":
            return keys[1]  # offset/mask/anchor_feat/scaling
        return keys[1] if keys[1] in lrs else "mlp_grid"

    return optim.group_adam(lrs, group_of)


def phase_of_step(step: int) -> int:
    """Static schedule stage from the iteration number
    (gaussian_renderer/__init__.py:50-71)."""
    if step <= 3000:
        return 0
    if step <= 10000:
        return 1
    return 2


def zero_stats(capacity: int, n_offsets: int):
    return {
        "opacity_accum": jnp.zeros((capacity, 1), jnp.float32),
        "anchor_demon": jnp.zeros((capacity, 1), jnp.float32),
        "offset_gradient_accum": jnp.zeros((capacity * n_offsets, 1), jnp.float32),
        "offset_denom": jnp.zeros((capacity * n_offsets, 1), jnp.float32),
    }


def make_train_step(cfg, rcfg: raster.RasterConfig,
                    optimizer, opt: OptConfig, loss_fn=None, grad_mask=None,
                    white_background: bool = False):
    """Builds the jitted (per-capacity) training step.

    `loss_fn` defaults to HAC's objective; other families pass theirs
    (same signature/aux contract: hac_plus.render.training_loss,
    tcgs.render.training_loss, cat3dgs.render.training_loss).
    `grad_mask(grads, phase)` freezes family-specific parameter groups
    per phase (CAT's selective optimizer stepping, train.py:279-317).
    `white_background` composites training renders over white instead of
    black (HAC/train.py:116 uses the dataset's bg; upstream forces white
    for Synthetic-NeRF). Matters beyond parity: exact-black GT regions
    put SSIM's luminance term at mu~0 where its gradient is amplified by
    ~2eps/C1 (= 2e4*eps), which destabilizes the DSSIM loss term."""
    if loss_fn is None:
        loss_fn = hac_render.training_loss

    @partial(jax.jit, static_argnames=("phase",))
    def step_fn(params, rest, opt_state, stats, cam, key, phase=0):
        cap_k = params["anchors"]["offset"].shape[0] * cfg.n_offsets
        m2d = jnp.zeros((cap_k, 2), jnp.float32)
        bg = (jnp.ones(3, jnp.float32) if white_background
              else jnp.zeros(3, jnp.float32))

        (loss, aux), (grads, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 8), has_aux=True
        )(params, rest, cfg, cam, rcfg, bg, phase, key, m2d,
          opt.lmbda, opt.lambda_dssim)

        if grad_mask is not None:
            grads = grad_mask(grads, phase)
        # NaN guard: a single non-finite gradient event would poison the
        # Adam moments and destroy the run (observed in a 512px soak);
        # drop non-finite components and surface the count as a metric
        nonfinite = sum(
            jnp.sum(~jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # densification statistics (training_statis, gaussian_model.py:758-775)
        k = cfg.n_offsets
        vis = aux["visible_anchor"] & rest["valid"]
        opac = jnp.maximum(aux["neural_opacity"].reshape(-1, k), 0.0)
        stats = dict(stats)
        stats["opacity_accum"] = stats["opacity_accum"] + jnp.where(
            vis[:, None], jnp.sum(opac, axis=1, keepdims=True), 0.0
        )
        stats["anchor_demon"] = stats["anchor_demon"] + vis[:, None].astype(
            jnp.float32
        )
        update_filter = aux["g_valid"] & (aux["radii"] > 0)
        # our rasterizer's screen positions are in PIXELS; the reference's
        # viewspace grads are NDC-scaled by half-resolution (3DGS CUDA
        # backward: ddelx_dx = 0.5*W), and densify_grad_threshold=0.0002 is
        # tuned for that scale. Without this factor the accumulated norms
        # are ~W/2 smaller than the threshold expects and anchor growth
        # never fires (observed: +0 anchors for 6k iters, runs/soak_hac_r3z)
        ndc_scale = jnp.asarray(
            [0.5 * rcfg.width, 0.5 * rcfg.height], jnp.float32)
        gnorm = jnp.linalg.norm(g_m2d * ndc_scale, axis=-1, keepdims=True)
        stats["offset_gradient_accum"] = stats["offset_gradient_accum"] + jnp.where(
            update_filter[:, None], gnorm, 0.0
        )
        stats["offset_denom"] = stats["offset_denom"] + update_filter[
            :, None
        ].astype(jnp.float32)

        metrics = {
            "loss": loss, "l1": aux["l1"], "psnr": aux["psnr"],
            "bit_per_param": aux["bit_per_param"],
            "nonfinite_grads": nonfinite,
        }
        return params, opt_state, stats, metrics

    return step_fn


# ---------------------------------------------------------------------------
# densification (host side)
# ---------------------------------------------------------------------------

def adjust_anchor(state, stats, opt_state, cfg: hac.HACConfig, opt: OptConfig,
                  rng: np.random.Generator):
    """Anchor growth + pruning (adjust_anchor / anchor_growing,
    gaussian_model.py:823-968), on host over the valid prefix.

    Rewrites the fixed-capacity buffers (possibly growing the bucket) and
    remaps the Adam moments of the per-anchor parameter groups.
    Returns (state, stats, opt_state).
    """
    k = cfg.n_offsets
    anchors = {n: np.asarray(v) for n, v in state["anchors"].items()}
    valid = np.asarray(state["valid"])
    n = int(valid.sum())
    cap = valid.shape[0]
    idx_valid = np.nonzero(valid)[0]

    grads = np.asarray(stats["offset_gradient_accum"]) / np.maximum(
        np.asarray(stats["offset_denom"]), 1e-12
    )
    grads = np.nan_to_num(grads, nan=0.0)
    grads_norm = np.abs(grads[:, 0])  # 1-D accum already a norm
    offset_mask = (
        np.asarray(stats["offset_denom"])[:, 0]
        > opt.update_interval * opt.success_threshold * 0.5
    )
    anchor_alive = np.repeat(valid, k)
    offset_mask &= anchor_alive

    scaling = np.exp(anchors["scaling"][:, :3])
    anchor_q = np.round(anchors["anchor"] / cfg.voxel_size) * cfg.voxel_size
    all_xyz = (
        anchor_q[:, None, :] + anchors["offset"] * scaling[:, None, :]
    ).reshape(-1, 3)

    new_rows = {name: [] for name in anchors}
    existing = set(map(tuple, np.round(
        anchor_q[idx_valid] / cfg.voxel_size
    ).astype(np.int64).tolist()))

    for i in range(cfg.update_depth):
        cur_threshold = opt.densify_grad_threshold * (
            (cfg.update_hierachy_factor // 2) ** i
        )
        candidate = (grads_norm >= cur_threshold) & offset_mask
        rand_keep = rng.random(candidate.shape[0]) > (0.5 ** (i + 1))
        candidate &= rand_keep
        if not candidate.any():
            continue
        size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor**i)
        cur_size = cfg.voxel_size * max(size_factor, 1)
        sel_xyz = all_xyz[candidate]
        grid = np.round(sel_xyz / cur_size).astype(np.int64)
        uniq, inv = np.unique(grid, axis=0, return_inverse=True)
        # drop candidates whose coarse cell already hosts an anchor
        coarse_existing = set(map(tuple, np.round(
            anchor_q[idx_valid] / cur_size
        ).astype(np.int64).tolist()))
        keep = np.array(
            [tuple(g) not in coarse_existing for g in uniq.tolist()], bool
        )
        if not keep.any():
            continue
        cand_anchor = uniq[keep].astype(np.float32) * cur_size
        # also ensure fine-grid uniqueness vs existing + previously added
        fine = np.round(cand_anchor / cfg.voxel_size).astype(np.int64)
        keep2 = np.array([tuple(g) not in existing for g in fine.tolist()], bool)
        cand_anchor = cand_anchor[keep2]
        if cand_anchor.shape[0] == 0:
            continue
        existing.update(map(tuple, np.round(
            cand_anchor / cfg.voxel_size
        ).astype(np.int64).tolist()))

        # feat seeding = element-wise max over every candidate landing in
        # the cell (torch_scatter.scatter_max in the reference,
        # gaussian_model.py:881-882), not just the first candidate
        sel_feat = np.repeat(anchors["anchor_feat"], k, axis=0)[candidate]
        feat_max = np.full((uniq.shape[0], sel_feat.shape[1]), -np.inf,
                           sel_feat.dtype)
        np.maximum.at(feat_max, inv, sel_feat)
        feat_src = feat_max[keep][keep2]

        m = cand_anchor.shape[0]
        new_rows["anchor"].append(cand_anchor)
        new_rows["scaling"].append(
            np.log(np.full((m, 6), cur_size, np.float32))
        )
        new_rows["rotation"].append(np.tile([1.0, 0, 0, 0], (m, 1)).astype(np.float32))
        new_rows["anchor_feat"].append(feat_src)
        new_rows["offset"].append(np.zeros((m, k, 3), np.float32))
        new_rows["mask"].append(np.ones((m, k, 1), np.float32))
        new_rows["opacity"].append(
            np.full((m, 1), hac._inverse_sigmoid(0.1), np.float32)
        )

    n_new = sum(a.shape[0] for a in new_rows["anchor"]) if new_rows["anchor"] else 0

    # pruning (gaussian_model.py:936-939)
    op_accum = np.asarray(stats["opacity_accum"])[:, 0]
    demon = np.asarray(stats["anchor_demon"])[:, 0]
    prune = (op_accum < opt.min_opacity * demon) & (
        demon > opt.update_interval * opt.success_threshold
    ) & valid
    keep_mask = valid & ~prune

    # assemble new valid prefix
    keep_idx = np.nonzero(keep_mask)[0]
    parts = {name: [anchors[name][keep_idx]] for name in anchors}
    for name in anchors:
        parts[name].extend(new_rows[name])
    merged = {name: np.concatenate(parts[name], axis=0) for name in anchors}
    n_total = merged["anchor"].shape[0]
    new_cap = hac.bucket_capacity(n_total, minimum=cap if n_total <= cap else cap * 2)
    if n_total <= cap:
        new_cap = cap  # avoid shrink-recompile churn

    def pad_to(x, c):
        out = np.zeros((c,) + x.shape[1:], x.dtype)
        out[: x.shape[0]] = x
        return out

    new_anchors = {n_: jnp.asarray(pad_to(v, new_cap)) for n_, v in merged.items()}
    new_valid = np.zeros(new_cap, bool)
    new_valid[:n_total] = True

    new_state = dict(state)
    new_state["anchors"] = new_anchors
    new_state["valid"] = jnp.asarray(new_valid)

    # remap Adam moments for per-anchor groups: kept anchors keep moments,
    # new anchors start at zero (cat_tensors_to_optimizer semantics)
    adam_state, step_count = opt_state
    mu, nu = adam_state.mu, adam_state.nu

    def remap(tree):
        out = dict(tree)
        a = dict(tree["anchors"])
        for name in hac.TRAINABLE_ANCHOR_FIELDS:
            old = np.asarray(a[name])
            gathered = old[keep_idx]
            padded = pad_to(
                np.concatenate(
                    [gathered, np.zeros((n_total - gathered.shape[0],) + old.shape[1:],
                                        old.dtype)], axis=0
                ),
                new_cap,
            )
            a[name] = jnp.asarray(padded)
        out["anchors"] = a
        return out

    adam_state = adam_state._replace(mu=remap(mu), nu=remap(nu))

    # selective stat resets (gaussian_model.py:923-933,952-965): only
    # offset entries that were growth-counted (offset_mask) and anchors
    # that were prune-counted (demon over threshold) restart their
    # accumulators; under-threshold entries KEEP accumulating across
    # adjust rounds, so rarely-visible anchors still reach the prune /
    # growth thresholds eventually. New anchors start at zero.
    off_acc = np.asarray(stats["offset_gradient_accum"]).copy()
    off_den = np.asarray(stats["offset_denom"]).copy()
    off_acc[offset_mask] = 0.0
    off_den[offset_mask] = 0.0
    counted = demon > opt.update_interval * opt.success_threshold
    op_acc2 = op_accum.copy()
    dem2 = demon.copy()
    op_acc2[counted] = 0.0
    dem2[counted] = 0.0

    def remap_stat(per_anchor: np.ndarray, width: int) -> jnp.ndarray:
        rows = per_anchor.reshape(cap, width)[keep_idx]
        out = np.zeros((new_cap, width), rows.dtype)
        out[: rows.shape[0]] = rows
        return jnp.asarray(out.reshape(new_cap * width, 1)
                           if width == k else out)

    new_stats = {
        "opacity_accum": remap_stat(op_acc2[:, None], 1),
        "anchor_demon": remap_stat(dem2[:, None], 1),
        "offset_gradient_accum": remap_stat(off_acc, k),
        "offset_denom": remap_stat(off_den, k),
    }
    return new_state, new_stats, (adam_state, step_count), {
        "n_anchors": n_total, "n_added": int(n_new), "n_pruned": int(prune.sum()),
        "recompiled": new_cap != cap,
    }
