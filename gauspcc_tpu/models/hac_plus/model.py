"""HAC++ model deltas over HAC.

Parity: HAC-plus/scene/gaussian_model.py — mlp_grid grows a per-channel
`prob` head (:370-374 split [fd,fd,fd,6,6,3K,3K,1,1,1]) and the feature
channel gets a 5-chunk autoregressive context (`Channel_CTX_fea` :117-169,
tiny variant :170-221 chosen for Blender scenes), whose (mean, scale,
prob) adjustments form a 2-component Gaussian mixture with the hyperprior
(utils/entropy_models.py:52-86; renderer usage gaussian_renderer:82-119).

Everything else (anchors, scaffold MLPs, hash grids, rendering,
densification) is shared with gauspcc_tpu.models.hac.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.nn import dense, dense_init
from gauspcc_tpu.fields import hashgrid
from gauspcc_tpu.models.hac import model as hac

N_CHUNKS = 5


class HACPlusConfig(NamedTuple):
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
    q_feat: float = 1.0
    q_scaling: float = 0.001
    q_offsets: float = 0.2
    tiny_ctx: bool = False  # Channel_CTX_fea_tiny for Synthetic-NeRF scenes

    @property
    def chunk(self) -> int:
        assert self.feat_dim % N_CHUNKS == 0
        return self.feat_dim // N_CHUNKS

    @property
    def grid_spec(self) -> hashgrid.MixedGridSpec:
        return hashgrid.make_mixed_spec(
            self.n_features_per_level, self.resolutions_3d,
            self.log2_hashmap_size, self.resolutions_2d,
            self.log2_hashmap_size_2d,
        )

    @property
    def grid_out_dim(self) -> int:
        # + feat_dim for the prob head (HAC-plus delta)
        return self.feat_dim * 3 + (6 + 3 * self.n_offsets) * 2 + 3

    def as_hac(self) -> hac.HACConfig:
        """View as a base-HAC config for the shared paths."""
        return hac.HACConfig(
            feat_dim=self.feat_dim, n_offsets=self.n_offsets,
            voxel_size=self.voxel_size, update_depth=self.update_depth,
            update_init_factor=self.update_init_factor,
            update_hierachy_factor=self.update_hierachy_factor,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            log2_hashmap_size_2d=self.log2_hashmap_size_2d,
            resolutions_3d=self.resolutions_3d,
            resolutions_2d=self.resolutions_2d,
            q_feat=self.q_feat, q_scaling=self.q_scaling,
            q_offsets=self.q_offsets,
        )


def init_channel_ctx(key, cfg: HACPlusConfig) -> dict:
    """5 chunk-conditional MLPs (Channel_CTX_fea) or the tiny variant."""
    c = cfg.chunk
    params = {}
    if cfg.tiny_ctx:
        params["mean_d0"] = jnp.zeros((1, c), jnp.float32)
        params["scale_d0"] = jnp.zeros((1, c), jnp.float32)
        params["prob_d0"] = jnp.zeros((1, c), jnp.float32)
        for i in range(1, N_CHUNKS):
            k1, k2, key = jax.random.split(key, 3)
            params[f"mlp_d{i}"] = {
                "fc0": dense_init(k1, c * i, c * 3),
                "fc1": dense_init(k2, c * 3, c * 3),
            }
    else:
        hyper = cfg.feat_dim * 3
        for i in range(N_CHUNKS):
            k1, k2, key = jax.random.split(key, 3)
            params[f"mlp_d{i}"] = {
                "fc0": dense_init(k1, hyper + c * i, 2 * cfg.chunk * 2),
                "fc1": dense_init(k2, 2 * cfg.chunk * 2, c * 3),
            }
    return params


def _leaky_mlp(p, x):
    h = jax.nn.leaky_relu(dense(p["fc0"], x), negative_slope=0.01)
    return dense(p["fc1"], h)


def channel_ctx_apply(params: dict, cfg: HACPlusConfig, feat_q: jax.Array,
                      mean_scale: jax.Array, to_dec: int = -1):
    """(mean_adj, scale_adj, prob_adj): full [N, feat_dim] when to_dec < 0,
    else the single chunk `to_dec` (decode path)."""
    c = cfg.chunk
    chunks = [feat_q[:, i * c:(i + 1) * c] for i in range(N_CHUNKS)]
    outs = []
    for i in range(N_CHUNKS):
        if to_dec >= 0 and i != to_dec:
            outs.append(None)
            continue
        if cfg.tiny_ctx:
            if i == 0:
                n = feat_q.shape[0]
                outs.append((
                    jnp.broadcast_to(params["mean_d0"], (n, c)),
                    jnp.broadcast_to(params["scale_d0"], (n, c)),
                    jnp.broadcast_to(params["prob_d0"], (n, c)),
                ))
                continue
            inp = jnp.concatenate(chunks[:i], axis=-1)
        else:
            inp = jnp.concatenate(chunks[:i] + [mean_scale], axis=-1)
        out = _leaky_mlp(params[f"mlp_d{i}"], inp)
        outs.append((out[:, :c], out[:, c:2 * c], out[:, 2 * c:]))
    if to_dec >= 0:
        return outs[to_dec]
    mean_adj = jnp.concatenate([o[0] for o in outs], axis=-1)
    scale_adj = jnp.concatenate([o[1] for o in outs], axis=-1)
    prob_adj = jnp.concatenate([o[2] for o in outs], axis=-1)
    return mean_adj, scale_adj, prob_adj


def init_networks(key, cfg: HACPlusConfig) -> dict:
    """HAC networks with the wider mlp_grid + channel context."""
    from gauspcc_tpu.core.nn import mlp2_init

    k0, k1 = jax.random.split(key)
    nets = hac.init_networks(k0, cfg.as_hac())
    enc_dim = cfg.grid_spec.output_dim
    keys = jax.random.split(k1, 2)
    nets["mlp_grid"] = mlp2_init(keys[0], enc_dim, cfg.feat_dim * 2,
                                 cfg.grid_out_dim)
    nets["channel_ctx"] = init_channel_ctx(keys[1], cfg)
    del nets["mlp_deform"]  # replaced by channel_ctx (the reference reuses
    # the deform slot for Channel_CTX_fea — get_deform_mlp, HAC-plus)
    return nets


def init_state(key, cfg: HACPlusConfig, points: np.ndarray,
               capacity: int | None = None) -> hac.State:
    state = hac.init_state(key, cfg.as_hac(), points, capacity)
    state["nets"] = init_networks(key, cfg)
    return state


def grid_mlp_split(state, cfg: HACPlusConfig, feat_context: jax.Array):
    """HAC++ 10-way split including the prob head."""
    from gauspcc_tpu.core.nn import mlp2

    out = mlp2(state["nets"]["mlp_grid"], feat_context)
    fd, k = cfg.feat_dim, cfg.n_offsets
    sizes = [fd, fd, fd, 6, 6, 3 * k, 3 * k, 1, 1, 1]
    idx = np.cumsum([0] + sizes)
    parts = [out[:, idx[i]:idx[i + 1]] for i in range(len(sizes))]
    (mean, scale, prob, mean_sc, scale_sc, mean_of, scale_of,
     q_feat_adj, q_sc_adj, q_of_adj) = parts
    return {
        "mean": mean, "scale": scale, "prob": prob,
        "mean_scaling": mean_sc, "scale_scaling": scale_sc,
        "mean_offsets": mean_of, "scale_offsets": scale_of,
        "q_feat": cfg.q_feat * (1 + jnp.tanh(q_feat_adj)),
        "q_scaling": cfg.q_scaling * (1 + jnp.tanh(q_sc_adj)),
        "q_offsets": cfg.q_offsets * (1 + jnp.tanh(q_of_adj)),
    }


def mixture_components(ctx: dict, ctx_params: dict, cfg: HACPlusConfig,
                       feat_q: jax.Array, to_dec: int = -1):
    """Hyperprior + AR mixture pieces for the feature channel.

    Returns (means, scales, probs) lists of 2 components, full-width or a
    single chunk when to_dec >= 0 (encode/decode loop)."""
    mean_scale = jnp.concatenate([ctx["mean"], ctx["scale"], ctx["prob"]], -1)
    adj = channel_ctx_apply(ctx_params, cfg, feat_q, mean_scale, to_dec)
    mean_adj, scale_adj, prob_adj = adj
    if to_dec >= 0:
        c = cfg.chunk
        sl = slice(to_dec * c, (to_dec + 1) * c)
        prob_hyper = ctx["prob"][:, sl]
        mean_h, scale_h = ctx["mean"][:, sl], ctx["scale"][:, sl]
    else:
        prob_hyper = ctx["prob"]
        mean_h, scale_h = ctx["mean"], ctx["scale"]
    probs = jax.nn.softmax(jnp.stack([prob_hyper, prob_adj], -1), axis=-1)
    means = [mean_h, mean_adj]
    scales = [scale_h, scale_adj]
    return means, scales, [probs[..., 0], probs[..., 1]]
