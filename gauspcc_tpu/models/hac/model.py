"""HAC scene model: Scaffold-GS anchors + hash-grid entropy machinery.

Parity target: HAC/scene/gaussian_model.py (GaussianModel :111-271 state &
MLPs, get_* activations :346-410, create_from_pcd :451-490) and the
neural-Gaussian generation in HAC/gaussian_renderer/__init__.py:25-172.

TPU-first structure: the model is a pytree over fixed-capacity anchor
buffers + a `valid` mask, so every train/eval step jits once per capacity
bucket. Growth/pruning (densification) rewrites the buffers on host and
re-pads. The rate estimate runs on ALL visible anchors instead of the
reference's 5% subsample — sampling saves nothing under static shapes and
the full estimate has lower gradient variance.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import entropy
from gauspcc_tpu.core.nn import mlp2, mlp2_init
from gauspcc_tpu.core.quant import ste_round, uniform_noise_quant
from gauspcc_tpu.fields import hashgrid

State = dict[str, Any]

# --- phase-2 bisection knobs (diagnostic; default off = reference parity).
# Set before building the train step; they are read at trace time.
# P2_Q_FIXED: keep the base quantization steps in phase 2 (no context-
#   adaptive 1+tanh scaling of the injected noise or the bit estimate).
# P2_NOISE_FEAT_ONLY: inject phase-2 noise only into anchor features,
#   leaving scaling/offsets un-noised (bits still estimated on them).
P2_Q_FIXED = False
P2_NOISE_FEAT_ONLY = False


class HACConfig(NamedTuple):
    feat_dim: int = 50
    n_offsets: int = 10
    voxel_size: float = 0.001
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    log2_hashmap_size_2d: int = 17
    resolutions_3d: tuple = (18, 24, 33, 44, 59, 80, 108, 148, 201, 275, 376, 514)
    resolutions_2d: tuple = (130, 258, 514, 1026)
    # base quantization steps (gaussian_renderer/__init__.py:47-49)
    q_feat: float = 1.0
    q_scaling: float = 0.001
    q_offsets: float = 0.2

    @property
    def grid_spec(self) -> hashgrid.MixedGridSpec:
        return hashgrid.make_mixed_spec(
            self.n_features_per_level, self.resolutions_3d,
            self.log2_hashmap_size, self.resolutions_2d,
            self.log2_hashmap_size_2d,
        )

    @property
    def grid_out_dim(self) -> int:
        # mean/scale for feat(2x), scaling(2x6), offsets(2x3K), 3 Q adjusters
        return (self.feat_dim + 6 + 3 * self.n_offsets) * 2 + 3


def bucket_capacity(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b = int(b * 2)
    return b


def knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (simple_knn
    distCUDA2 equivalent, used for voxel size + initial scales)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)
    return (d[:, 1:] ** 2).mean(axis=1)


def voxelize_points(points: np.ndarray, voxel_size: float, seed: int = 0
                    ) -> np.ndarray:
    """Shuffle + unique on the voxel grid (gaussian_model.py:446-449)."""
    rng = np.random.default_rng(seed)
    pts = points.copy()
    rng.shuffle(pts)
    return np.unique(np.round(pts / voxel_size), axis=0) * voxel_size


def init_networks(key, cfg: HACConfig) -> dict:
    keys = jax.random.split(key, 6)
    in_dim = cfg.feat_dim + 3 + 1
    enc_dim = cfg.grid_spec.output_dim
    nets = {
        "tables": hashgrid.init_mixed_tables(keys[0], cfg.grid_spec),
        "mlp_opacity": mlp2_init(keys[1], in_dim, cfg.feat_dim, cfg.n_offsets),
        "mlp_cov": mlp2_init(keys[2], in_dim, cfg.feat_dim, 7 * cfg.n_offsets),
        "mlp_color": mlp2_init(keys[3], in_dim, cfg.feat_dim, 3 * cfg.n_offsets),
        "mlp_grid": mlp2_init(keys[4], enc_dim, cfg.feat_dim * 2, cfg.grid_out_dim),
        # kept for size parity with the reference (unused in the loss path,
        # gaussian_model.py:264-269)
        "mlp_deform": mlp2_init(keys[5], enc_dim, cfg.feat_dim * 2, 2 * cfg.n_offsets),
    }
    nets["mlp_deform"]["fc1"]["b"] = (
        nets["mlp_deform"]["fc1"]["b"].at[0::2].add(10.0)
    )
    return nets


def init_state(key, cfg: HACConfig, points: np.ndarray,
               capacity: int | None = None) -> State:
    """Create model state from a voxelized seed cloud (create_from_pcd)."""
    n = points.shape[0]
    cap = capacity or bucket_capacity(n)
    k = cfg.n_offsets

    dist2 = np.maximum(knn_mean_dist(points), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

    def pad(x, shape, fill=0.0):
        out = np.full(shape, fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    anchors = {
        "anchor": pad(points, (cap, 3)),
        "offset": jnp.zeros((cap, k, 3), jnp.float32),
        "mask": jnp.ones((cap, k, 1), jnp.float32),  # logits; sigmoid(1)>0.01
        "anchor_feat": jnp.zeros((cap, cfg.feat_dim), jnp.float32),
        "scaling": pad(scales, (cap, 6)),
        "rotation": pad(np.tile([1.0, 0, 0, 0], (n, 1)), (cap, 4)),
        "opacity": jnp.full((cap, 1), _inverse_sigmoid(0.1), jnp.float32),
    }
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return {
        "anchors": anchors,
        "valid": jnp.asarray(valid),
        "nets": init_networks(key, cfg),
        "x_bound_min": jnp.zeros((1, 3), jnp.float32),
        "x_bound_max": jnp.ones((1, 3), jnp.float32),
    }


def _inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1 - x)))


TRAINABLE_ANCHOR_FIELDS = ("offset", "mask", "anchor_feat", "scaling")
# anchor positions train at lr 0 in the reference (OptimizationParams
# position_lr_* = 0, arguments/__init__.py:84-87) and rotation/opacity have
# requires_grad=False (gaussian_model.py:488-489) -> all three are frozen.
FROZEN_ANCHOR_FIELDS = ("anchor", "rotation", "opacity")


def split_state(state: State):
    """(trainable params, rest). merge_state inverts."""
    params = {
        "anchors": {k: state["anchors"][k] for k in TRAINABLE_ANCHOR_FIELDS},
        "nets": state["nets"],
    }
    rest = {
        "anchors": {k: state["anchors"][k] for k in FROZEN_ANCHOR_FIELDS},
        "valid": state["valid"],
        "x_bound_min": state["x_bound_min"],
        "x_bound_max": state["x_bound_max"],
    }
    return params, rest


def merge_state(params, rest) -> State:
    anchors = dict(rest["anchors"])
    anchors.update(params["anchors"])
    return {
        "anchors": anchors,
        "valid": rest["valid"],
        "nets": params["nets"],
        "x_bound_min": rest["x_bound_min"],
        "x_bound_max": rest["x_bound_max"],
    }


# ---------------------------------------------------------------------------
# activations / derived quantities (gaussian_model.py:346-410)
# ---------------------------------------------------------------------------

def get_anchor(state: State, cfg: HACConfig, decoded: bool = False) -> jax.Array:
    if decoded:
        return state["anchors"]["anchor"]
    return ste_round(state["anchors"]["anchor"] / cfg.voxel_size) * cfg.voxel_size


def get_scaling(state: State, decoded: bool = False) -> jax.Array:
    if decoded:
        return state["anchors"]["scaling"]
    return jnp.exp(state["anchors"]["scaling"])


def get_mask(state: State, decoded: bool = False) -> jax.Array:
    """Hard {0,1} mask with sigmoid STE (gaussian_model.py:353-357)."""
    if decoded:
        return state["anchors"]["mask"]
    s = jax.nn.sigmoid(state["anchors"]["mask"])
    return jax.lax.stop_gradient((s > 0.01).astype(jnp.float32) - s) + s


def get_mask_anchor(state: State, decoded: bool = False) -> jax.Array:
    m = get_mask(state, decoded)
    return (jnp.sum(m, axis=1)[:, 0] > 0) & state["valid"]


def update_anchor_bound(state: State) -> State:
    """Expand the anchor AABB by 20% (gaussian_model.py:412-422)."""
    a = state["anchors"]["anchor"]
    v = state["valid"][:, None]
    big = jnp.float32(1e9)
    mn = jnp.min(jnp.where(v, a, big), axis=0, keepdims=True)
    mx = jnp.max(jnp.where(v, a, -big), axis=0, keepdims=True)
    mn = jnp.where(mn < 0, mn * 1.2, mn * 0.8)
    mx = jnp.where(mx > 0, mx * 1.2, mx * 0.8)
    out = dict(state)
    out["x_bound_min"] = mn
    out["x_bound_max"] = mx
    return out


def calc_interp_feat(state: State, cfg: HACConfig, x: jax.Array) -> jax.Array:
    xn = (x - state["x_bound_min"]) / (
        state["x_bound_max"] - state["x_bound_min"]
    )
    return hashgrid.mixed_encode(cfg.grid_spec, state["nets"]["tables"], xn)


def grid_mlp_split(state: State, cfg: HACConfig, feat_context: jax.Array):
    """mlp_grid output split into the 9 context heads
    (gaussian_renderer/__init__.py:62-68)."""
    out = mlp2(state["nets"]["mlp_grid"], feat_context)
    fd, k = cfg.feat_dim, cfg.n_offsets
    sizes = [fd, fd, 6, 6, 3 * k, 3 * k, 1, 1, 1]
    idx = np.cumsum([0] + sizes)
    parts = [out[:, idx[i]:idx[i + 1]] for i in range(len(sizes))]
    (mean, scale, mean_sc, scale_sc, mean_of, scale_of,
     q_feat_adj, q_sc_adj, q_of_adj) = parts
    q_feat = cfg.q_feat * (1 + jnp.tanh(q_feat_adj))
    q_scaling = cfg.q_scaling * (1 + jnp.tanh(q_sc_adj))
    q_offsets = cfg.q_offsets * (1 + jnp.tanh(q_of_adj))
    return {
        "mean": mean, "scale": scale,
        "mean_scaling": mean_sc, "scale_scaling": scale_sc,
        "mean_offsets": mean_of, "scale_offsets": scale_of,
        "q_feat": q_feat, "q_scaling": q_scaling, "q_offsets": q_offsets,
    }


def encoding_params_flat(state: State, binarize: bool = True) -> jax.Array:
    flat = hashgrid.flat_tables(state["nets"]["tables"])
    if binarize:
        from gauspcc_tpu.core.quant import ste_binary

        flat = ste_binary(flat)
    return flat


def mlp_size_bits(state: State, digit: int = 32) -> int:
    """Networks-sizes accounting (get_mlp_size, gaussian_model.py:287-292):
    every 'mlp*' net except the deform slot, whichever family owns it."""
    total = 0
    for name, net in state["nets"].items():
        if not name.startswith("mlp") or "deform" in name:
            continue
        total += sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(net)
        )
    return total * digit


# ---------------------------------------------------------------------------
# neural gaussian generation (gaussian_renderer/__init__.py:25-172)
# ---------------------------------------------------------------------------

class NeuralGaussians(NamedTuple):
    xyz: jax.Array  # [cap*K, 3]
    color: jax.Array  # [cap*K, 3]
    opacity: jax.Array  # [cap*K, 1]
    scaling: jax.Array  # [cap*K, 3]
    rot: jax.Array  # [cap*K, 4]
    valid: jax.Array  # [cap*K] bool (anchor visible & mask & opacity > 0)
    neural_opacity: jax.Array  # [cap*K, 1] pre-clip opacity (for stats)


def generate_neural_gaussians(
    state: State,
    cfg: HACConfig,
    camera_center: jax.Array,
    visible_mask: jax.Array,
    *,
    training: bool = False,
    phase: int = 0,
    key: jax.Array | None = None,
    decoded: bool = False,
):
    """Returns (NeuralGaussians, rate_terms dict or None).

    visible_mask: [cap] bool from prefilter; combined with validity.
    `phase` is the STATIC training-schedule stage derived from the step on
    host (the reference's step comparisons, gaussian_renderer:51-71):
      0: warm-up (step <= 3000) — no quantization proxy
      1: base-Q uniform noise (3000 < step <= 10000)
      2: context-adaptive Q noise + rate estimate (step > 10000)
    """
    k = cfg.n_offsets
    anchors = state["anchors"]
    vis = visible_mask & state["valid"]

    anchor = get_anchor(state, cfg, decoded)
    feat = anchors["anchor_feat"]
    grid_offsets = anchors["offset"]
    grid_scaling = get_scaling(state, decoded)
    binary_mask = get_mask(state, decoded)  # [cap, K, 1]
    mask_anchor = get_mask_anchor(state, decoded)

    def _live_means():
        # attribute means over LIVE rows only (capacity padding is zeros
        # and would bias the STE clamp window toward 0); the reference
        # uses plain .mean() over its dense tensors
        valid_f = state["valid"].astype(jnp.float32)[:, None]
        n_live = jnp.maximum(jnp.sum(valid_f), 1.0)
        feat_mean = jnp.sum(
            anchors["anchor_feat"] * valid_f) / (n_live * cfg.feat_dim)
        scaling_mean = jnp.sum(get_scaling(state) * valid_f) / (n_live * 6)
        offset_mean = jnp.sum(
            anchors["offset"] * valid_f[:, :, None]) / (n_live * 3 * k)
        return feat_mean, scaling_mean, offset_mean

    rate = None
    nets = state.get("nets", {})
    has_hac_ctx = (
        "tables" in nets and "mlp_grid" in nets
        and nets["mlp_grid"]["fc1"]["w"].shape[-1] == cfg.grid_out_dim
    )  # HAC++/TC-GS/CAT reuse this scaffold with their own contexts;
    # their float-eval quantization lives in their own codecs
    if not training and not decoded and has_hac_ctx:
        # eval path: STE-quantize the attributes through the learned
        # context exactly as the encoder will (gaussian_renderer
        # __init__.py:104-110) — the float eval must render what ships
        from gauspcc_tpu.core.quant import ste_multistep

        ctx = grid_mlp_split(state, cfg, calc_interp_feat(state, cfg, anchor))
        feat_mean, scaling_mean, offset_mean = _live_means()
        feat = ste_multistep(feat, ctx["q_feat"], feat_mean)
        grid_scaling = ste_multistep(
            grid_scaling, ctx["q_scaling"], scaling_mean)
        grid_offsets = ste_multistep(
            grid_offsets, ctx["q_offsets"][:, None, :], offset_mean)
    if training and not decoded:
        assert key is not None
        k1, k2, k3 = jax.random.split(key, 3)
        if phase == 1:
            feat = uniform_noise_quant(feat, cfg.q_feat, k1)
            grid_scaling = uniform_noise_quant(grid_scaling, cfg.q_scaling, k2)
            grid_offsets = uniform_noise_quant(grid_offsets, cfg.q_offsets, k3)
        elif phase == 2:
            ctx = grid_mlp_split(state, cfg, calc_interp_feat(state, cfg, anchor))
            if P2_Q_FIXED:
                ctx = dict(ctx)
                ctx["q_feat"] = jnp.full_like(ctx["q_feat"], cfg.q_feat)
                ctx["q_scaling"] = jnp.full_like(ctx["q_scaling"], cfg.q_scaling)
                ctx["q_offsets"] = jnp.full_like(ctx["q_offsets"], cfg.q_offsets)
            feat = uniform_noise_quant(feat, ctx["q_feat"], k1)
            if not P2_NOISE_FEAT_ONLY:
                grid_scaling = uniform_noise_quant(
                    grid_scaling, ctx["q_scaling"], k2)
                grid_offsets = uniform_noise_quant(
                    grid_offsets, ctx["q_offsets"][:, None, :], k3
                )
            # rate estimate over all valid & mask-on & visible anchors.
            # (The reference samples 5% of them, gaussian_renderer:73-96 —
            # same expectation, lower variance here.) x_mean clamps must
            # average over LIVE rows only: the capacity padding is zeros
            # and would bias the clamp window toward 0.
            sel = (vis & mask_anchor)[:, None].astype(jnp.float32)
            feat_mean, scaling_mean, offset_mean = _live_means()
            mask3 = jnp.repeat(binary_mask, 3, axis=-1).reshape(-1, 3 * k)
            bit_feat = entropy.gaussian_bits(
                feat, ctx["mean"], ctx["scale"], ctx["q_feat"],
                x_mean=feat_mean,
            ) * sel
            bit_scaling = entropy.gaussian_bits(
                grid_scaling, ctx["mean_scaling"], ctx["scale_scaling"],
                ctx["q_scaling"], x_mean=scaling_mean,
            ) * sel
            bit_offsets = entropy.gaussian_bits(
                grid_offsets.reshape(-1, 3 * k), ctx["mean_offsets"],
                ctx["scale_offsets"], ctx["q_offsets"],
                x_mean=offset_mean,
            ) * mask3 * sel
            # reference scales the mean-bits by the mask-on fraction of
            # visible anchors (mask_anchor_rate, gaussian_renderer:41,92-96):
            # mask-off anchors ship no attribute bits
            n_vis = jnp.maximum(jnp.sum(vis.astype(jnp.float32)), 1.0)
            mask_anchor_rate = jnp.sum(sel) / n_vis
            denom = jnp.maximum(jnp.sum(sel), 1.0)
            rate = {
                "bit_per_feat_param": jnp.sum(bit_feat)
                / (denom * cfg.feat_dim) * mask_anchor_rate,
                "bit_per_scaling_param": jnp.sum(bit_scaling)
                / (denom * 6) * mask_anchor_rate,
                "bit_per_offsets_param": jnp.sum(bit_offsets)
                / (denom * 3 * k) * mask_anchor_rate,
            }
            rate["bit_per_param"] = (
                jnp.sum(bit_feat) + jnp.sum(bit_scaling) + jnp.sum(bit_offsets)
            ) / (denom * (cfg.feat_dim + 6 + 3 * k)) * mask_anchor_rate

    ob_view = anchor - camera_center[None, :]
    ob_dist = jnp.linalg.norm(ob_view, axis=1, keepdims=True) + 1e-9
    ob_view = ob_view / ob_dist

    cat_local = jnp.concatenate([feat, ob_view, ob_dist], axis=1)
    neural_opacity = mlp2(state["nets"]["mlp_opacity"], cat_local, jnp.tanh)
    neural_opacity = neural_opacity.reshape(-1, 1)  # [cap*K, 1]
    neural_opacity = neural_opacity * binary_mask.reshape(-1, 1)
    g_valid = (neural_opacity[:, 0] > 0.0) & jnp.repeat(vis, k)

    color = mlp2(state["nets"]["mlp_color"], cat_local, jax.nn.sigmoid)
    color = color.reshape(-1, 3)
    scale_rot = mlp2(state["nets"]["mlp_cov"], cat_local).reshape(-1, 7)

    scaling_rep = jnp.repeat(grid_scaling, k, axis=0)  # [cap*K, 6]
    anchor_rep = jnp.repeat(anchor, k, axis=0)
    offsets = grid_offsets.reshape(-1, 3)

    scaling = scaling_rep[:, 3:] * jax.nn.sigmoid(scale_rot[:, :3])
    rot = scale_rot[:, 3:7] / (
        jnp.linalg.norm(scale_rot[:, 3:7], axis=-1, keepdims=True) + 1e-9
    )
    xyz = anchor_rep + offsets * scaling_rep[:, :3]

    ng = NeuralGaussians(
        xyz=xyz, color=color, opacity=neural_opacity, scaling=scaling,
        rot=rot, valid=g_valid, neural_opacity=neural_opacity,
    )
    return ng, rate
