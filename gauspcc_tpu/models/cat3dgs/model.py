"""CAT-3DGS model: PCA triplane hyperprior + channel-wise feature context.

Parity: CAT-3DGS scene/gaussian_model.py — scaffold anchors as in HAC;
the hash grids are replaced by the PCA-oriented multi-scale triplane field
(field.py) whose sampled features drive an attribute MLP with the HAC-style
9-way split for slice-0 feature stats, scaling, offsets and Q adjusters;
feature slices >= 1 get their (mean, scale) from `mlp_chcm_list[i]`
conditioned on the already-(de)coded slices (:172-203, chcm_slices_list
default [25, 25]); view-frequency-aware mask weighting (train.py:160-175)
is a per-anchor weight maintained by the trainer.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.nn import mlp2, mlp2_init
from gauspcc_tpu.models.cat3dgs import field as cat_field
from gauspcc_tpu.models.hac import model as hac


class CATConfig(NamedTuple):
    feat_dim: int = 50
    n_offsets: int = 10
    voxel_size: float = 0.001
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    chcm_slices: tuple = (25, 25)
    chcm_for_offsets: bool = False
    chcm_for_scaling: bool = False
    tri_feat: int = 1
    base_resolution: int = 64
    multiscale: tuple = (1, 2, 4)
    contract: bool = True
    q_feat: float = 1.0
    q_scaling: float = 0.001
    q_offsets: float = 0.2

    @property
    def field(self) -> cat_field.FieldConfig:
        return cat_field.FieldConfig(
            n_feat=self.tri_feat, base_resolution=self.base_resolution,
            multiscale=self.multiscale, contract=self.contract,
        )

    @property
    def ctx_dim(self) -> int:
        return 3 * self.tri_feat * len(self.multiscale)

    @property
    def slice0(self) -> int:
        return self.chcm_slices[0]

    @property
    def grid_out_dim(self) -> int:
        # slice-0 mean/scale + scaling/offsets stats + 3 Q adjusters
        return self.slice0 * 2 + (6 + 3 * self.n_offsets) * 2 + 3

    def as_hac(self) -> hac.HACConfig:
        return hac.HACConfig(
            feat_dim=self.feat_dim, n_offsets=self.n_offsets,
            voxel_size=self.voxel_size, update_depth=self.update_depth,
            update_init_factor=self.update_init_factor,
            update_hierachy_factor=self.update_hierachy_factor,
            q_feat=self.q_feat, q_scaling=self.q_scaling,
            q_offsets=self.q_offsets,
        )


def init_state(key, cfg: CATConfig, points: np.ndarray,
               capacity: int | None = None) -> hac.State:
    assert sum(cfg.chcm_slices) == cfg.feat_dim
    k0, k1, k2, *ks = jax.random.split(key, 3 + len(cfg.chcm_slices))
    state = hac.init_state(k0, cfg.as_hac(), points, capacity)
    nets = state["nets"]
    del nets["tables"]
    del nets["mlp_grid"]
    del nets["mlp_deform"]
    nets["field"] = cat_field.init_field(k1, cfg.field)
    nets["mlp_attr"] = mlp2_init(k2, cfg.ctx_dim, cfg.feat_dim * 2,
                                 cfg.grid_out_dim)
    nets["mlp_chcm"] = []
    in_dim = 0
    for i in range(len(cfg.chcm_slices) - 1):
        in_dim += cfg.chcm_slices[i]
        nets["mlp_chcm"].append(
            mlp2_init(ks[i], in_dim, 2 * cfg.feat_dim,
                      2 * cfg.chcm_slices[i + 1])
        )
    if cfg.chcm_for_offsets:
        key, sub = jax.random.split(key)
        nets["mlp_chcm_offsets"] = mlp2_init(
            sub, cfg.feat_dim, 2 * cfg.feat_dim, 6 * cfg.n_offsets)
    if cfg.chcm_for_scaling:
        key, sub = jax.random.split(key)
        nets["mlp_chcm_scaling"] = mlp2_init(
            sub, cfg.feat_dim, 2 * cfg.feat_dim, 12)
    return state


def set_pca_frame(state: hac.State, cfg: CATConfig) -> hac.State:
    """Fit the PCA frame + plane resolution to the current anchors
    (triplane_init_fit phase, CAT train.py:200-212)."""
    valid = np.asarray(state["valid"])
    pts = np.asarray(state["anchors"]["anchor"])[valid]
    rot, mean, std = cat_field.fit_pca(pts)
    f = dict(state["nets"]["field"])
    f["rotation"] = jnp.asarray(rot)
    f["pca_mean"] = jnp.asarray(mean)
    f["pca_std"] = jnp.asarray(std)
    nets = dict(state["nets"])
    nets["field"] = f
    return dict(state, nets=nets)


def hyper_split(state: hac.State, cfg: CATConfig, anchor: jax.Array,
                planes_q=None):
    """Triplane-conditioned hyperprior for slice 0 + scaling/offsets."""
    feats = cat_field.sample(state["nets"]["field"], cfg.field, anchor,
                             planes_q)
    out = mlp2(state["nets"]["mlp_attr"], feats)
    s0, k = cfg.slice0, cfg.n_offsets
    sizes = [s0, s0, 6, 6, 3 * k, 3 * k, 1, 1, 1]
    idx = np.cumsum([0] + sizes)
    parts = [out[:, idx[i]:idx[i + 1]] for i in range(len(sizes))]
    (mean0, scale0, mean_sc, scale_sc, mean_of, scale_of, qf, qs, qo) = parts
    return {
        "mean0": mean0, "scale0": scale0,
        "mean_scaling": mean_sc, "scale_scaling": scale_sc,
        "mean_offsets": mean_of, "scale_offsets": scale_of,
        "q_feat": cfg.q_feat * (1 + jnp.tanh(qf)),
        "q_scaling": cfg.q_scaling * (1 + jnp.tanh(qs)),
        "q_offsets": cfg.q_offsets * (1 + jnp.tanh(qo)),
    }


def chcm_adjust(state: hac.State, cfg: CATConfig, hyper: dict,
                feat_q: jax.Array) -> dict:
    """Additive (mean, scale) adjustments for offsets/scaling conditioned on
    the (de)coded features (CAT gaussian_model.py:1107-1109, off by default).
    Returns a hyper dict with adjusted stats."""
    out = dict(hyper)
    k = cfg.n_offsets
    if cfg.chcm_for_offsets:
        d = mlp2(state["nets"]["mlp_chcm_offsets"], feat_q)
        out["mean_offsets"] = hyper["mean_offsets"] + d[:, : 3 * k]
        out["scale_offsets"] = hyper["scale_offsets"] + d[:, 3 * k :]
    if cfg.chcm_for_scaling:
        d = mlp2(state["nets"]["mlp_chcm_scaling"], feat_q)
        out["mean_scaling"] = hyper["mean_scaling"] + d[:, :6]
        out["scale_scaling"] = hyper["scale_scaling"] + d[:, 6:]
    return out


def chcm_slice_stats(state: hac.State, cfg: CATConfig, feat_q: jax.Array,
                     i: int):
    """(mean, scale) for slice i >= 1 from the (de)coded slices < i."""
    bounds = np.cumsum([0] + list(cfg.chcm_slices))
    ctx = feat_q[:, : bounds[i]]
    out = mlp2(state["nets"]["mlp_chcm"][i - 1], ctx)
    c = cfg.chcm_slices[i]
    return out[:, :c], out[:, c:]


def feature_stats(state: hac.State, cfg: CATConfig, hyper: dict,
                  feat_q: jax.Array):
    """Full-width (mean, scale) for the feature vector (training path,
    teacher-forced on the quantized features)."""
    means = [hyper["mean0"]]
    scales = [hyper["scale0"]]
    for i in range(1, len(cfg.chcm_slices)):
        m, s = chcm_slice_stats(state, cfg, feat_q, i)
        means.append(m)
        scales.append(s)
    return jnp.concatenate(means, -1), jnp.concatenate(scales, -1)
