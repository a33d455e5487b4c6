"""CAT-3DGS PCA-oriented multi-scale triplane hyperprior field.

Parity: CAT-3DGS scene/triplane.py (TriPlaneField :149-342) +
gaussian_model.py:378-410: LOF outlier removal (n_neighbors=50,
contamination=0.05) then PCA via eigh of the covariance; anchors are
rotated/standardized, optionally contracted to the unisphere, and sampled
from per-scale triplanes whose base resolution adapts to anchor count
(x = round((N/36)^0.5), gaussian_model.py:405-407). Latents are quantized
with per-scale encoder gains 2^g (log_2_encoder_gains = arange(0, 5));
rate comes from the per-plane-group ARMs (arm.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.quant import ste_round
from gauspcc_tpu.fields import triplane as tri
from gauspcc_tpu.models.cat3dgs import arm


class FieldConfig(NamedTuple):
    n_feat: int = 1  # output_coordinate_dim per plane (CAT uses low-dim latents)
    base_resolution: int = 64
    multiscale: tuple = (1, 2, 4)
    contract: bool = True
    layers_arm: tuple = (16, 16, 16, 16)

    def resolutions(self):
        return [self.base_resolution * m for m in self.multiscale]


def adapt_resolution(n_anchors: int) -> int:
    """Base plane resolution from anchor count (gaussian_model.py:405-407)."""
    return max(16, int(round((n_anchors / 36.0) ** 0.5)))


def fit_pca(points: np.ndarray, n_neighbors: int = 50,
            contamination: float = 0.05):
    """(rotation [3,3], mean [3], std [3]) after LOF outlier removal."""
    pts = points
    if pts.shape[0] > n_neighbors * 2:
        try:
            from sklearn.neighbors import LocalOutlierFactor

            lof = LocalOutlierFactor(n_neighbors=n_neighbors,
                                     contamination=contamination)
            keep = lof.fit_predict(pts) == 1
            pts = pts[keep]
        except ImportError:
            pass
    mean = pts.mean(axis=0)
    cov = np.cov((pts - mean).T)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1]
    rot = eigvec[:, order]  # columns = principal axes
    std = np.sqrt(np.maximum(eigval[order], 1e-12))
    return rot.astype(np.float32), mean.astype(np.float32), std.astype(np.float32)


def init_field(key, cfg: FieldConfig) -> dict:
    params = {"scales": [], "arms": {}, "gains": jnp.arange(
        0.0, float(len(cfg.multiscale)) + 2.0)[: max(len(cfg.multiscale), 1)]}
    for r in cfg.resolutions():
        key, sub = jax.random.split(key)
        params["scales"].append(tri.init_triplane(sub, cfg.n_feat, r, std=0.2))
    for g in ("xy", "xz", "yz"):
        key, sub = jax.random.split(key)
        params["arms"][g] = arm.init_arm(sub, cfg.layers_arm)
    # PCA frame (set after warm-up; trained thereafter like the reference's
    # rotation_matrix/pca_mean/variance Parameters)
    params["rotation"] = jnp.eye(3)
    params["pca_mean"] = jnp.zeros(3)
    params["pca_std"] = jnp.ones(3)
    return params


def normalize(params: dict, cfg: FieldConfig, x: jax.Array) -> jax.Array:
    """PCA-rotate, standardize, optionally contract to the unit ball."""
    z = (x - params["pca_mean"]) @ params["rotation"]
    z = z / (3.0 * params["pca_std"] + 1e-9)
    if cfg.contract:
        z = tri.contract(z) * 0.5  # radius-2 ball -> [-1, 1]
    return z


def quantized_planes(params: dict, cfg: FieldConfig, noise_key=None):
    """Per-scale planes quantized with gain 2^g (STE round, or uniform
    noise when a key is given — training's UniformNoiseQuantizer)."""
    out = []
    for i, planes in enumerate(params["scales"]):
        gain = 2.0 ** params["gains"][i]
        scaled = planes * gain
        if noise_key is not None:
            noise_key, sub = jax.random.split(noise_key)
            q = scaled + jax.random.uniform(sub, scaled.shape, minval=-0.5,
                                            maxval=0.5)
        else:
            q = ste_round(scaled)
        out.append(q)
    return out


def sample(params: dict, cfg: FieldConfig, x: jax.Array,
           planes_q: list | None = None) -> jax.Array:
    """Sampled features [N, 3 * n_feat * n_scales] from (de)quantized planes."""
    z = normalize(params, cfg, x)
    feats = []
    for i, planes in enumerate(planes_q or quantized_planes(params, cfg)):
        gain = 2.0 ** params["gains"][i]
        feats.append(tri.sample_triplane(planes / gain, z, apply_contract=False))
    return jnp.concatenate(feats, axis=-1)


def field_rate_bits(params: dict, cfg: FieldConfig,
                    planes_q: list | None = None) -> jax.Array:
    """Total ARM-modeled bits of all quantized latents (train-time rate)."""
    total = 0.0
    for planes in planes_q or quantized_planes(params, cfg):
        for p, g in enumerate(("xy", "xz", "yz")):
            for c in range(planes.shape[1]):
                bits, _, _ = arm.plane_rate(params["arms"][g], planes[p, c])
                total = total + bits
    return total
