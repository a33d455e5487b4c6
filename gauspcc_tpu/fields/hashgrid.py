"""Multi-resolution hash-grid encoder (Instant-NGP style) in pure XLA.

Functional-parity target: the reference `gridencoder` CUDA extension as
configured by HAC (gridencoder.zip kernel_grid, HAC/utils/encodings.py
GridEncoder :224-311, mix_3D2D_encoding gaussian_model.py:43-109):

  - per level: pos = x * (R - 2) + 0.5; trilinear corners at pos_grid and
    min(pos_grid + 1, R - 1)
  - corners touching the border (component 0 or R-1) are EXCLUDED and the
    remaining weights renormalized (kernel_grid zero_flag/wn logic)
  - dense indexing while R^d fits the level's table, else XOR-prime hash
    (fast_hash, primes {1, 2654435761, 805459861})
  - table sizes: min(2^log2_hashmap_size, R^d) rounded up to multiple of 8
  - inputs outside [0, 1] produce zeros
  - HAC binarizes embeddings with STE sign (ste_binary) before lookup

Implemented as a static Python loop over levels (each level one gather +
weighted sum, fully fused by XLA); gradients flow to the table via the
gather's scatter-add transpose. The gridencoder's `binary_vxl` masked
variant (corners with no occupied voxel in their Rb-grid window are
excluded like border corners — kernel_grid gridencoder.cu:266-322) is
supported via a summed-area table; HAC's main path passes None
(calc_interp_feat). The extension's plane-average ops (avg_2D_*,
cnt_np_embed*, grid_encode_mix2D) have NO Python call sites anywhere in
the reference — dead kernels, intentionally not reproduced.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.quant import ste_binary

_PRIMES = (1, 2654435761, 805459861)


class HashGridSpec(NamedTuple):
    """Static layout of one multi-level grid."""

    num_dim: int
    n_features: int
    resolutions: tuple[int, ...]
    offsets: tuple[int, ...]  # per-level row offsets into the table, +end

    @property
    def n_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return len(self.resolutions) * self.n_features


def make_spec(num_dim: int, n_features: int, resolutions, log2_hashmap_size: int
              ) -> HashGridSpec:
    offsets = [0]
    max_params = 2**log2_hashmap_size
    for r in resolutions:
        rows = min(max_params, r**num_dim)
        rows = int(np.ceil(rows / 8) * 8)
        offsets.append(offsets[-1] + rows)
    return HashGridSpec(
        num_dim=num_dim,
        n_features=n_features,
        resolutions=tuple(int(r) for r in resolutions),
        offsets=tuple(offsets),
    )


def init_table(key, spec: HashGridSpec, std: float = 1e-4) -> jax.Array:
    return jax.random.uniform(
        key, (spec.n_rows, spec.n_features), jnp.float32, -std, std
    )


def _corner_offsets(num_dim: int) -> np.ndarray:
    return np.array(
        [[(i >> d) & 1 for d in range(num_dim)] for i in range(2**num_dim)],
        dtype=np.int32,
    )


def _occupancy_sat(binary_vxl: jax.Array) -> jax.Array:
    """Inclusive summed-area table with a zero border: sat[i1..id] = count
    of occupied voxels in the box [0, i1) x ... x [0, id)."""
    s = binary_vxl.astype(jnp.int32)
    for axis in range(s.ndim):
        s = jnp.cumsum(s, axis=axis)
    return jnp.pad(s, [(1, 0)] * s.ndim)


def _window_occupied(sat: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Any occupied voxel in the inclusive box [lo, hi] per row.

    sat: SAT from _occupancy_sat ([Rb+1]^d); lo/hi: [..., d] int32.
    Inclusion-exclusion over the 2^d box corners."""
    d = lo.shape[-1]
    total = 0
    for mask in range(2**d):
        bits = np.array([(mask >> k) & 1 for k in range(d)])
        corner = jnp.where(jnp.asarray(bits, bool), hi + 1, lo)
        sign = 1 if (d - int(bits.sum())) % 2 == 0 else -1
        idx = tuple(corner[..., k] for k in range(d))
        total = total + sign * sat[idx]
    return total > 0


def encode(spec: HashGridSpec, table: jax.Array, x: jax.Array,
           binary_vxl: jax.Array | None = None) -> jax.Array:
    """x: [N, num_dim] in [0, 1] -> [N, L * F] features.

    binary_vxl: optional {0,1} occupancy grid ([Rb]^num_dim). Corners
    whose Rb-window holds no occupied voxel are excluded from the
    interpolation like border corners (kernel_grid binary_vxl path)."""
    n = x.shape[0]
    d = spec.num_dim
    corners = jnp.asarray(_corner_offsets(d))  # [2^d, d]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    sat = None if binary_vxl is None else _occupancy_sat(binary_vxl)

    outs = []
    for lvl, r in enumerate(spec.resolutions):
        rows = spec.offsets[lvl + 1] - spec.offsets[lvl]
        pos = x * float(r - 2) + 0.5
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.int32)

        cg = jnp.minimum(pos_grid[:, None, :] + corners[None, :, :], r - 1)  # [N,2^d,d]
        w = jnp.prod(
            jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :], frac[:, None, :]),
            axis=-1,
        )  # [N, 2^d]
        border = jnp.any((cg == 0) | (cg == r - 1), axis=-1)  # [N, 2^d]
        w = jnp.where(border, 0.0, w)
        if sat is not None:
            # per corner: window center (cg - 0.5)/(r - 2), half-width
            # 1/(r - 2), scaled to the Rb grid and clipped, int-truncated
            # (gridencoder.cu:267-285)
            rb = binary_vxl.shape[-1]
            scale_re = 1.0 / float(r - 2)
            pn = (cg.astype(jnp.float32) - 0.5) * scale_re
            lo = jnp.clip(((pn - scale_re) * rb), 0, rb - 1).astype(jnp.int32)
            hi = jnp.clip(((pn + scale_re) * rb), 0, rb - 1).astype(jnp.int32)
            w = jnp.where(_window_occupied(sat, lo, hi), w, 0.0)
        wn = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
        w = w / wn

        if r**d <= rows:
            strides = jnp.asarray([r**k for k in range(d)], jnp.int32)
            idx = jnp.sum(cg * strides[None, None, :], axis=-1)
        else:
            h = jnp.zeros(cg.shape[:2], jnp.uint32)
            for k in range(d):
                h = h ^ (cg[..., k].astype(jnp.uint32) * np.uint32(_PRIMES[k]))
            idx = (h % np.uint32(rows)).astype(jnp.int32)
        idx = (idx % rows) + spec.offsets[lvl]

        feats = table[idx]  # [N, 2^d, F]
        out = jnp.sum(feats * w[..., None], axis=1)  # [N, F]
        outs.append(out)

    out = jnp.concatenate(outs, axis=-1)
    return jnp.where(oob[:, None], 0.0, out)


# ---------------------------------------------------------------------------
# HAC's mixed 3D + 3x2D context encoding
# ---------------------------------------------------------------------------

class MixedGridSpec(NamedTuple):
    xyz: HashGridSpec
    plane: HashGridSpec  # shared layout for xy/xz/yz

    @property
    def output_dim(self) -> int:
        return self.xyz.output_dim + 3 * self.plane.output_dim


def make_mixed_spec(
    n_features: int = 2,
    resolutions_3d=(18, 24, 33, 44, 59, 80, 108, 148, 201, 275, 376, 514),
    log2_hashmap_size: int = 19,
    resolutions_2d=(130, 258, 514, 1026),
    log2_hashmap_size_2d: int = 17,
) -> MixedGridSpec:
    """Defaults match HAC (gaussian_model.py:138-139, encodings.py:228)."""
    return MixedGridSpec(
        xyz=make_spec(3, n_features, resolutions_3d, log2_hashmap_size),
        plane=make_spec(2, n_features, resolutions_2d, log2_hashmap_size_2d),
    )


def init_mixed_tables(key, spec: MixedGridSpec) -> dict:
    k = jax.random.split(key, 4)
    return {
        "xyz": init_table(k[0], spec.xyz),
        "xy": init_table(k[1], spec.plane),
        "xz": init_table(k[2], spec.plane),
        "yz": init_table(k[3], spec.plane),
    }


def mixed_encode(spec: MixedGridSpec, tables: dict, x: jax.Array,
                 binarize: bool = True) -> jax.Array:
    """HAC context features: 3D grid on xyz + 2D grids on the three axis
    planes, concatenated (mix_3D2D_encoding.forward)."""
    tb = {k: (ste_binary(v) if binarize else v) for k, v in tables.items()}
    out = [
        encode(spec.xyz, tb["xyz"], x),
        encode(spec.plane, tb["xy"], x[:, (0, 1)]),
        encode(spec.plane, tb["xz"], x[:, (0, 2)]),
        encode(spec.plane, tb["yz"], x[:, (1, 2)]),
    ]
    return jnp.concatenate(out, axis=-1)


def flat_tables(tables: dict) -> jax.Array:
    """All embeddings concatenated in the reference's serialization order
    (xyz, xy, xz, yz — gaussian_model.py:273-285)."""
    return jnp.concatenate([tables["xyz"], tables["xy"], tables["xz"], tables["yz"]])


def unflatten_tables(spec: MixedGridSpec, flat: jax.Array) -> dict:
    n3, n2 = spec.xyz.n_rows, spec.plane.n_rows
    return {
        "xyz": flat[:n3],
        "xy": flat[n3 : n3 + n2],
        "xz": flat[n3 + n2 : n3 + 2 * n2],
        "yz": flat[n3 + 2 * n2 : n3 + 3 * n2],
    }
