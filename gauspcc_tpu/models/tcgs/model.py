"""TC-GS model: triplane context field + conv-AE compressed planes.

Parity: TC-GS scene/gaussian_model.py + utils/triplane.py — the hash grids
of HAC are replaced by a single-scale triplane [3, C, R, R] sampled at K
points per anchor (repeat mode; TC-GS gaussian_renderer:58-63), features
concatenated with the anchor position and fed to `mlp_triplane` with the
same 9-way hyperprior split as HAC (scene/gaussian_model.py:170-176).
After step 15k an L1 autoencoder reconstruction loss (`lae`) joins the
objective and the stored artifact becomes the AE latent
(utils/triplane.py:241-271; save_triplane :922-925). Q_offsets base 0.3.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.nn import mlp2, mlp2_init
from gauspcc_tpu.fields import triplane as tri
from gauspcc_tpu.models.hac import model as hac


class TCGSConfig(NamedTuple):
    feat_dim: int = 50
    n_offsets: int = 10
    voxel_size: float = 0.001
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    tri_feat: int = 16  # triplane channels C
    tri_res: int = 32  # R (16 or 32 per dataset in run scripts)
    tri_samples: int = 4  # K sample points per anchor
    knn_sampling: bool = False  # sample at K nearest anchors (post-15k mode)
    ae_compressed: int = 8
    q_feat: float = 1.0
    q_scaling: float = 0.001
    q_offsets: float = 0.3  # TC-GS base (gaussian_renderer:44)

    @property
    def ctx_dim(self) -> int:
        return self.tri_samples * 3 * self.tri_feat + 3

    @property
    def grid_out_dim(self) -> int:
        return (self.feat_dim + 6 + 3 * self.n_offsets) * 2 + 3

    def as_hac(self) -> hac.HACConfig:
        return hac.HACConfig(
            feat_dim=self.feat_dim, n_offsets=self.n_offsets,
            voxel_size=self.voxel_size, update_depth=self.update_depth,
            update_init_factor=self.update_init_factor,
            update_hierachy_factor=self.update_hierachy_factor,
            q_feat=self.q_feat, q_scaling=self.q_scaling,
            q_offsets=self.q_offsets,
        )


def init_state(key, cfg: TCGSConfig, points: np.ndarray,
               capacity: int | None = None) -> hac.State:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    state = hac.init_state(k0, cfg.as_hac(), points, capacity)
    nets = state["nets"]
    del nets["tables"]
    del nets["mlp_grid"]
    del nets["mlp_deform"]
    nets["planes"] = tri.init_triplane(k1, cfg.tri_feat, cfg.tri_res)
    nets["autoencoder"] = tri.init_autoencoder(
        k2, tri.AEConfig(cfg.tri_feat, cfg.ae_compressed)
    )
    nets["mlp_triplane"] = mlp2_init(k3, cfg.ctx_dim, cfg.feat_dim * 2,
                                     cfg.grid_out_dim)
    return state


def normalize_coords(state: hac.State, x: jax.Array) -> jax.Array:
    """Center + radius-normalize into the triplane's unit ball."""
    center = 0.5 * (state["x_bound_min"] + state["x_bound_max"])
    radius = 0.5 * jnp.max(state["x_bound_max"] - state["x_bound_min"]) + 1e-9
    return (x - center) / radius


def triplane_context(state: hac.State, cfg: TCGSConfig, anchor: jax.Array,
                     planes: jax.Array | None = None,
                     knn_pos: jax.Array | None = None) -> jax.Array:
    """Context features for mlp_triplane: K plane samples + anchor.

    Sampling positions are the K nearest-neighbor anchor positions when
    `knn_pos` [N, K, 3] is given (TC-GS gaussian_renderer/__init__.py:
    56-63 knnanchor, positions detached), else the anchor itself repeated
    K times (the reference's pre-15k `anchor.unsqueeze(1).repeat(1,K,1)`
    mode). `planes` overrides the field (decode path uses
    AE-reconstructed planes).
    """
    if planes is None:
        planes = state["nets"]["planes"]
    if knn_pos is not None:
        n = anchor.shape[0]
        pos = jax.lax.stop_gradient(knn_pos)
        xn = normalize_coords(state, pos.reshape(-1, 3))
        feats = tri.sample_triplane(planes, xn).reshape(n, -1)  # [N, K*3C]
    else:
        xn = normalize_coords(state, anchor)
        feats = tri.sample_triplane(planes, xn)  # [N, 3C]
        feats = jnp.tile(feats, (1, cfg.tri_samples))
    return jnp.concatenate([feats, anchor], axis=-1)


def knn_positions(anchor_valid: np.ndarray, k: int) -> np.ndarray:
    """K nearest-neighbor positions per anchor (self included, distance
    order), float32 [N, K, 3] (TC-GS gaussian_model.py:1052-1059
    init_knn_indice; cKDTree replaces sklearn NearestNeighbors). Falls
    back to self-repeat when fewer than k anchors exist. Deterministic in
    the input, so encoder and decoder derive identical positions from the
    decoded quantized anchors."""
    from scipy.spatial import cKDTree

    pts = np.asarray(anchor_valid, np.float32)
    n = pts.shape[0]
    if n < k or n == 0:
        return np.repeat(pts[:, None, :], max(k, 1), axis=1)
    tree = cKDTree(pts)
    _, nn = tree.query(pts, k=k)
    return pts[np.atleast_2d(nn)].astype(np.float32)


def grid_mlp_split(state: hac.State, cfg: TCGSConfig, ctx_feats: jax.Array):
    out = mlp2(state["nets"]["mlp_triplane"], ctx_feats)
    fd, k = cfg.feat_dim, cfg.n_offsets
    sizes = [fd, fd, 6, 6, 3 * k, 3 * k, 1, 1, 1]
    idx = np.cumsum([0] + sizes)
    parts = [out[:, idx[i]:idx[i + 1]] for i in range(len(sizes))]
    (mean, scale, mean_sc, scale_sc, mean_of, scale_of,
     qf, qs, qo) = parts
    return {
        "mean": mean, "scale": scale,
        "mean_scaling": mean_sc, "scale_scaling": scale_sc,
        "mean_offsets": mean_of, "scale_offsets": scale_of,
        "q_feat": cfg.q_feat * (1 + jnp.tanh(qf)),
        "q_scaling": cfg.q_scaling * (1 + jnp.tanh(qs)),
        "q_offsets": cfg.q_offsets * (1 + jnp.tanh(qo)),
    }


def reconstructed_planes(state: hac.State):
    """(latent, reconstruction) via the AE — the storable artifact pair."""
    return tri.autoencode(state["nets"]["autoencoder"], state["nets"]["planes"])
