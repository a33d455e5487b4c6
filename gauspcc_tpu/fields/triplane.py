"""Triplane feature fields + conv autoencoder (pure XLA).

Parity targets:
  - TC-GS utils/triplane.py: single-scale [3, C, R, R] planes, axis-aligned
    projections (plane 0 reads (y,z), 1 reads (x,z), 2 reads (x,y) —
    sample_from_planes decomposed_x), radius normalization + Mip-NeRF-360
    contraction (contract, eq. 10), bilinear grid_sample with zero padding,
    and the 3-layer conv Autoencoder (:241-271) whose 8-channel latent is
    what gets stored after step 15k.
  - CAT-3DGS scene/triplane.py: multi-scale planes over PCA-rotated and
    standardized anchors (handled by the caller; this module provides the
    plane sampling primitive).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


_PLANE_AXES = ((1, 2), (0, 2), (0, 1))  # (y,z), (x,z), (x,y)


def contract(x: jax.Array) -> jax.Array:
    """Mip-NeRF-360 contraction: identity inside the unit ball, else
    (2 - 1/|x|) * x/|x| (TC-GS utils/triplane.py contract)."""
    eps = jnp.finfo(jnp.float32).eps
    mag_sq = jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps)
    mag = jnp.sqrt(mag_sq)
    return jnp.where(mag_sq <= 1.0, x, ((2.0 * mag - 1.0) / mag_sq) * x)


def grid_sample_2d(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample, zero padding, align_corners=False semantics.

    plane [C, H, W]; uv [N, 2] in [-1, 1] ((u, v) = (x->W, y->H)).
    Returns [N, C].
    """
    c, h, w = plane.shape
    x = (uv[:, 0] + 1.0) * 0.5 * w - 0.5
    y = (uv[:, 1] + 1.0) * 0.5 * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = plane[:, yi_c, xi_c].T  # [N, C]
        return jnp.where(inside[:, None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = fx[:, None]
    wy = fy[:, None]
    return (
        v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy + v11 * wx * wy
    )


def sample_triplane(planes: jax.Array, coords: jax.Array,
                    apply_contract: bool = True) -> jax.Array:
    """planes [3, C, R, R]; coords [N, 3] normalized (unit-ball-ish).

    Returns [N, 3*C] concatenated per-plane features (TC-GS Triplane.sample
    flattening order)."""
    x = contract(coords) if apply_contract else coords
    outs = []
    for p, (a, b) in enumerate(_PLANE_AXES):
        uv = jnp.stack([x[:, a], x[:, b]], axis=-1)
        outs.append(grid_sample_2d(planes[p], uv))
    return jnp.concatenate(outs, axis=-1)


def init_triplane(key, n_feat: int, resolution: int, std: float = 0.1,
                  n_planes: int = 3) -> jax.Array:
    return jax.random.normal(key, (n_planes, n_feat, resolution, resolution)) * std


# ---------------------------------------------------------------------------
# conv autoencoder over plane images (TC-GS Autoencoder)
# ---------------------------------------------------------------------------

class AEConfig(NamedTuple):
    feat: int
    compressed_dim: int = 8


def _conv_init(key, cin, cout, k=3):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * k * k)
    return {
        "w": jax.random.uniform(k1, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def init_autoencoder(key, cfg: AEConfig) -> dict:
    keys = jax.random.split(key, 6)
    return {
        "enc0": _conv_init(keys[0], cfg.feat, 16),
        "enc1": _conv_init(keys[1], 16, 32),
        "enc2": _conv_init(keys[2], 32, cfg.compressed_dim),
        "dec0": _conv_init(keys[3], cfg.compressed_dim, 32),
        "dec1": _conv_init(keys[4], 32, 16),
        "dec2": _conv_init(keys[5], 16, cfg.feat),
    }


def _conv2d(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _deconv2d(p, x, stride):
    y = jax.lax.conv_transpose(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def autoencode(params: dict, planes: jax.Array):
    """planes [P, C, R, R] -> (latent [P, comp, R/8, R/8],
    reconstruction [P, C, R, R] in (0, 1) via sigmoid)."""
    x = planes.transpose(0, 2, 3, 1)  # NHWC
    h = jax.nn.relu(_conv2d(params["enc0"], x, 2))
    h = jax.nn.relu(_conv2d(params["enc1"], h, 2))
    z = jax.nn.relu(_conv2d(params["enc2"], h, 2))
    d = jax.nn.relu(_deconv2d(params["dec0"], z, 2))
    d = jax.nn.relu(_deconv2d(params["dec1"], d, 2))
    r = jax.nn.sigmoid(_deconv2d(params["dec2"], d, 2))
    return z.transpose(0, 3, 1, 2), r.transpose(0, 3, 1, 2)


def decode_latent(params: dict, latent: jax.Array) -> jax.Array:
    z = latent.transpose(0, 2, 3, 1)
    d = jax.nn.relu(_deconv2d(params["dec0"], z, 2))
    d = jax.nn.relu(_deconv2d(params["dec1"], d, 2))
    r = jax.nn.sigmoid(_deconv2d(params["dec2"], d, 2))
    return r.transpose(0, 3, 1, 2)
