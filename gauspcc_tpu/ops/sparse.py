"""Sparse voxel-hierarchy ops, designed for XLA static shapes.

TPU-native replacements for the reference's torchsparse + kit/nn.py stack:

  - lexicographic coordinate sorts == GausPcgc/kit/op.py:6-30 (sort_C /
    sort_CF; batch-major, then z, y, x) and HAC/utils/pcc_utils.py:12-22
    (calculate_morton_order — despite the name, a lexicographic sort with
    z most significant).
  - occupancy pyramid (FOG) == GausPcgc/kit/nn.py:25-55: parent voxel =
    child >> 1, occupancy byte = OR of 2^(x%2 + 2*y%2 + 4*z%2).
  - child expansion (FCG) == kit/nn.py:58-98: 1->8 expansion masked by
    occupancy bits.
  - submanifold sparse convolution == torchsparse spnn.Conv3d(stride=1):
    implemented as neighbor-map gather + grouped matmuls (implicit GEMM)
    so the MXU sees [N, G*Cin] x [G*Cin, Cout] contractions. Neighbor maps
    are built on device with a vectorized multi-lane binary search over
    lex-sorted int32 coordinates (no 64-bit keys: JAX x64 stays off and
    TPUs prefer 32-bit lanes), and are reused across every conv that
    shares the same coords.

All device functions take fixed-capacity (padded) arrays plus a validity
mask, so jit traces once per bucket size. Pyramid construction runs on
host (numpy) — it is cheap integer work and inherently data-dependent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_I32_MAX = np.iinfo(np.int32).max


# ---------------------------------------------------------------------------
# Keys and sorting
# ---------------------------------------------------------------------------

def lex_key_np(coords: np.ndarray, dims) -> np.ndarray:
    """Host-side int64 key, z most significant: ((z*Y + y)*X + x)."""
    c = coords.astype(np.int64)
    return (c[:, 2] * int(dims[1]) + c[:, 1]) * int(dims[0]) + c[:, 0]


def morton_order_np(xyz: np.ndarray) -> np.ndarray:
    """Sorted indices reproducing calculate_morton_order (pcc_utils.py:12-22):
    min-shift, then argsort of x + y*(M+1) + z*(M+1)^2 with M = global max."""
    x = np.asarray(xyz).astype(np.int64)
    x = x - x.min(axis=0, keepdims=True)
    m = int(x.max()) + 1
    key = x @ np.power(m, np.arange(3, dtype=np.int64))
    return np.argsort(key, kind="stable")


def lex_sort(coords: jax.Array, mask: jax.Array) -> jax.Array:
    """Permutation putting valid coords in (z, y, x) lex order, padding last."""
    z = jnp.where(mask, coords[:, 2], _I32_MAX)
    y = jnp.where(mask, coords[:, 1], _I32_MAX)
    x = jnp.where(mask, coords[:, 0], _I32_MAX)
    return jnp.lexsort((x, y, z))


# ---------------------------------------------------------------------------
# Occupancy pyramid (host, numpy)
# ---------------------------------------------------------------------------

def dedupe_lex_np(coords: np.ndarray) -> np.ndarray:
    """Unique rows of a non-negative int [N, 3] array in (z, y, x) lex
    order, via one int64 key sort + a linear diff scan — ~10x faster than
    np.unique(axis=0) (which sorts a structured view) at 10^5+ rows."""
    cur = np.asarray(coords).astype(np.int64)
    if cur.shape[0] <= 1:
        return cur
    key = lex_key_np(cur, cur.max(axis=0) + 1)
    order = np.argsort(key)  # introsort: input order is arbitrary and
    # stability is not needed (equal keys are identical rows)
    cur, key = cur[order], key[order]
    keep = np.empty(cur.shape[0], bool)
    keep[0] = True
    np.not_equal(key[1:], key[:-1], out=keep[1:])
    return cur[keep]


def build_occupancy_pyramid(coords: np.ndarray, min_points: int = 64,
                            sorted_unique: bool = False):
    """Dyadic downscale until fewer than `min_points` parents remain.

    coords: non-negative int [N, 3]; duplicates are merged (pass
    sorted_unique=True when the caller already deduped, e.g. via
    dedupe_lex_np, to skip that pass). Per level, "group children by
    parent" is a stable int64-key argsort + diff scan + bitwise_or
    reduceat — cheaper than np.unique(return_inverse) + ufunc.at, and the
    argsort is adaptive (timsort): each level's parent keys are nearly
    sorted already, because >>1 per axis only creates local inversions
    where a coarser z/y tie exposes a lower-axis flip.

    Returns levels coarse->fine: list of (parent_coords int32 [Ni,3],
    occupancy uint8 [Ni]), each sorted in lex order (z major). The finest
    entry's children reconstruct the input; mirrors the data_ls built in
    Network.forward (network_ue_4stage_conv.py:104-111) but stores the
    parent of each level rather than a SparseTensor.
    """
    coords = np.asarray(coords)
    assert coords.ndim == 2 and coords.shape[1] == 3
    assert coords.min() >= 0, "shift coordinates to be non-negative first"
    cur = (coords.astype(np.int64) if sorted_unique
           else dedupe_lex_np(coords))
    levels = []
    while True:
        parent = cur >> 1
        octant = (cur[:, 0] & 1) + 2 * (cur[:, 1] & 1) + 4 * (cur[:, 2] & 1)
        dims = parent.max(axis=0) + 1
        pkey = lex_key_np(parent, (dims[0], dims[1]))
        order = np.argsort(pkey, kind="stable")
        pkey = pkey[order]
        flags = np.empty(pkey.shape[0], bool)
        flags[0] = True
        np.not_equal(pkey[1:], pkey[:-1], out=flags[1:])
        starts = np.flatnonzero(flags)
        bits = (1 << octant).astype(np.uint8)[order]
        occ = np.bitwise_or.reduceat(bits, starts)
        pcoords = parent[order[starts]].astype(np.int32)
        levels.append((pcoords, occ))
        cur = pcoords.astype(np.int64)
        if cur.shape[0] < min_points or cur.shape[0] <= 1:
            break
    return levels[::-1]


# ---------------------------------------------------------------------------
# FCG: occupancy -> children (device, static shapes)
# ---------------------------------------------------------------------------

# Octant o = dx + 2*dy + 4*dz (kit/nn.py:64-75).
_OCTANT_OFFSETS = np.stack(
    [np.array([o & 1, (o >> 1) & 1, (o >> 2) & 1]) for o in range(8)]
).astype(np.int32)


def fcg_expand(coords: jax.Array, occ: jax.Array, mask: jax.Array):
    """Expand parents to their occupied children.

    coords [N,3] int32, occ [N] int (0..255), mask [N] bool ->
    child_coords [N*8, 3], child_mask [N*8], octant [N*8] int32,
    parent_index [N*8] int32 (row of the parent each child came from).
    Children of parent i occupy rows 8i..8i+7 in octant order; callers
    lex-sort afterwards (as the reference does with sort_CF).
    """
    n = coords.shape[0]
    offs = jnp.asarray(_OCTANT_OFFSETS)  # [8, 3]
    child = coords[:, None, :] * 2 + offs[None, :, :]  # [N, 8, 3]
    octant = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None, :], (n, 8))
    bits = (occ[:, None].astype(jnp.int32) >> octant) & 1
    child_mask = (bits == 1) & mask[:, None]
    parent_index = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, 8)
    )
    return (
        child.reshape(-1, 3),
        child_mask.reshape(-1),
        octant.reshape(-1),
        parent_index.reshape(-1),
    )


# ---------------------------------------------------------------------------
# Neighbor maps + sparse convolution
# ---------------------------------------------------------------------------

def kernel_offsets(kernel_size: int) -> np.ndarray:
    """[K^3, 3] integer offsets in (x fastest) scan order, centered."""
    r = np.arange(kernel_size) - kernel_size // 2
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.int32)


class NeighborMap(NamedTuple):
    """Gather indices for one (query coords, source coords) pair.

    idx: [K3, Nq] int32 — row into the source features for each kernel
    offset, 0 where invalid.
    valid: [K3, Nq] bool.
    """

    idx: jax.Array
    valid: jax.Array


def nmap_from_host(idx: jax.Array) -> NeighborMap:
    """Wrap a host-built gather table (ops/hostmap.py; -1 = no neighbor)."""
    return NeighborMap(idx=jnp.maximum(idx, 0), valid=idx >= 0)


class WindowMap(NamedTuple):
    """Packed neighbor map (ops/hostmap.py build_map_packed).

    lo: [K^2, Nq] int32 — per (dz, dy) kernel row, the start of the
        k-wide window of consecutive lex-sorted source rows.
    codes: [K^2, Nq] int (uint16 payload) — 3-bit window slot per
        x-offset bin; 7 = no neighbor. Tap index = lo + slot.

    6 bytes/voxel/row vs 4K for the dense table: sized for the
    host->device upload, the serial-latency driver of codec decode on a
    tunneled TPU.
    """

    lo: jax.Array
    codes: jax.Array


B_LO = 64  # queries per lo base block


class PackedLo(NamedTuple):
    """Upload form of WindowMap.lo: ~1.07 B/entry instead of 4.

    Per (dz, dy) row, lo is non-decreasing along the lex-sorted queries,
    so each B_LO-run is stored as one absolute int32 base + u8 offsets
    from it; offsets outside [0, 254] escape to 255 with the absolute
    value in an exception list. Cuts the host->device map upload (the
    tunnel-bandwidth wall of codec decode, BASELINE.md) roughly in half
    combined with the u16 codes.
    """

    base: jax.Array  # [K2, nb] int32
    off: jax.Array  # [K2, nb * B_LO] uint8
    exc_pos: jax.Array  # [E] int32 flat positions (cap-padded with OOB)
    exc_val: jax.Array  # [E] int32 absolute lo values


def pack_lo_np(lo: np.ndarray):
    """Host side: lo int32 [K2, cap] -> (base, off_u8, exc_pos, exc_val)."""
    k2, cap = lo.shape
    nb = (cap + B_LO - 1) // B_LO
    lp = np.pad(lo, ((0, 0), (0, nb * B_LO - cap)), mode="edge")
    base = np.ascontiguousarray(lp[:, ::B_LO])
    off = lp - np.repeat(base, B_LO, axis=1)
    exc = (off > 254) | (off < 0)
    exc_pos = np.nonzero(exc.reshape(-1))[0].astype(np.int32)
    exc_val = lp.reshape(-1)[exc_pos].astype(np.int32)
    off_u8 = np.where(exc, 255, off).astype(np.uint8)
    # bucket the exception list so jit traces once per (shape, bucket)
    ecap = 16
    while ecap < exc_pos.shape[0]:
        ecap *= 2
    oob = np.int32(k2 * nb * B_LO)  # mode="drop" discards the padding
    exc_pos = np.pad(exc_pos, (0, ecap - exc_pos.shape[0]),
                     constant_values=oob)
    exc_val = np.pad(exc_val, (0, ecap - exc_val.shape[0]))
    return base, off_u8, exc_pos, exc_val


@partial(jax.jit, static_argnames=("cap",))
def expand_lo(packed: PackedLo, cap: int) -> jax.Array:
    """Device side: reconstruct lo int32 [K2, cap] exactly."""
    k2, nb = packed.base.shape
    lo = (jnp.repeat(packed.base, B_LO, axis=1)
          + packed.off.astype(jnp.int32))
    lo = lo.reshape(-1).at[packed.exc_pos].set(packed.exc_val, mode="drop")
    return lo.reshape(k2, nb * B_LO)[:, :cap]


def nmap_from_packed(wmap: WindowMap, kernel_size: int) -> NeighborMap:
    """Expand a packed window map to the dense gather table on device.

    Pure integer ops over [K^2, Nq] lanes — the upload stays 6 B/voxel/row
    while the conv keeps the dense gather-MM form (which measures faster
    on TPU than gathering k-row windows and aligning per query).
    """
    k = kernel_size
    slots = (wmap.codes.astype(jnp.int32)[:, None, :]
             >> (3 * jnp.arange(k, dtype=jnp.int32)[None, :, None])) & 7
    valid = slots < k  # [K2, k(dxbin), Nq]
    idx = wmap.lo[:, None, :] + jnp.where(valid, slots, 0)
    nq = wmap.lo.shape[1]
    return NeighborMap(idx=idx.reshape(k * k * k, nq),
                       valid=valid.reshape(k * k * k, nq))


def sparse_conv_window(
    feats: jax.Array,
    wmap: WindowMap,
    weight: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Submanifold sparse conv over a packed window map.

    Equivalent to :func:`sparse_conv_apply` with the dense map the codes
    expand to, but gathers CONTIGUOUS k-row windows (one [k, Cin] slice
    per query per kernel row) instead of K^3 scattered rows, then aligns
    window slots to x-offset bins with k^2 masked adds on the VPU.
    Runs in feats.dtype (bf16-friendly) with f32 accumulation.
    """
    k3, cin, cout = weight.shape
    k = round(k3 ** (1 / 3))
    assert k**3 == k3
    k2 = k * k
    nq = wmap.lo.shape[1]
    ns = feats.shape[0]
    w = weight.astype(feats.dtype).reshape(k2, k * cin, cout)
    win_off = jnp.arange(k, dtype=jnp.int32)

    def row(acc, args):
        lo, codes, w_row = args  # [Nq], [Nq], [k*Cin, Cout]
        win = feats[jnp.clip(lo[:, None] + win_off[None, :], 0, ns - 1)]
        # [Nq, k(window), Cin]
        slots = (codes.astype(jnp.int32)[:, None]
                 >> (3 * win_off[None, :])) & 7  # [Nq, k(dxbin)]
        aligned = jnp.zeros((nq, k, cin), feats.dtype)
        for i in range(k):  # window slot -> x-offset bin (VPU selects)
            hit = (slots == i)[:, :, None]
            aligned = aligned + jnp.where(hit, win[:, i : i + 1, :], 0)
        x = aligned.reshape(nq, k * cin)
        return acc + jnp.dot(x, w_row, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((nq, cout), jnp.float32)
    out, _ = jax.lax.scan(
        row, acc0,
        (wmap.lo, wmap.codes, w),
    )
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)


def _lex_less(az, ay, ax, bz, by, bx):
    """(az,ay,ax) < (bz,by,bx) lexicographically, elementwise."""
    return (az < bz) | ((az == bz) & ((ay < by) | ((ay == by) & (ax < bx))))


@partial(jax.jit, static_argnames=("kernel_size",))
def build_neighbor_map(
    coords_q: jax.Array,
    mask_q: jax.Array,
    coords_s: jax.Array,
    mask_s: jax.Array,
    kernel_size: int,
) -> NeighborMap:
    """Neighbor lookup via one binary search per (dz, dy) plane-row.

    Sources are lex-sorted (z, y, x): all kernel taps sharing (dz, dy)
    land in one contiguous run of the sorted order, so a single
    lower_bound at (z+dz, y+dy, x-r) followed by an inspection of the
    next `kernel_size` entries resolves ALL `kernel_size` x-offsets of
    that row — K^2 searches instead of K^3, the dominant gather cost.
    Within the search, (y, x) are packed into one int32 lane (their local
    span always fits 31 bits after min-shift), halving compare gathers.
    Pure int32 throughout; negative coords fine.
    """
    k = kernel_size
    r = k // 2
    k3 = k**3
    nq = coords_q.shape[0]
    ns = coords_s.shape[0]

    order = lex_sort(coords_s, mask_s)
    s_sorted = coords_s[order]
    valid_s = mask_s[order]
    sz = jnp.where(valid_s, s_sorted[:, 2], _I32_MAX)
    sy = jnp.where(valid_s, s_sorted[:, 1], _I32_MAX)
    sx = jnp.where(valid_s, s_sorted[:, 0], _I32_MAX)

    # pack (y, x) into one int32 lane for the search: spans are local
    # (min-shifted), so X * Y < 2^31 for any realistic level
    def mn(a, m):
        return jnp.min(jnp.where(m, a, _I32_MAX))

    x0 = jnp.minimum(mn(coords_s[:, 0], mask_s), mn(coords_q[:, 0], mask_q)) - r
    y0 = jnp.minimum(mn(coords_s[:, 1], mask_s), mn(coords_q[:, 1], mask_q)) - r
    xspan = (
        jnp.maximum(
            jnp.max(jnp.where(mask_s, coords_s[:, 0], -_I32_MAX)),
            jnp.max(jnp.where(mask_q, coords_q[:, 0], -_I32_MAX)),
        )
        - x0 + 2 * r + 2
    )
    syx = jnp.where(valid_s, (sy - y0) * xspan + (sx - x0), _I32_MAX)
    # fuse the search lanes and the window lanes so each probe step is one
    # row gather instead of 2-4 scalar-lane gathers
    search_tab = jnp.stack([sz, syx], axis=1)  # [Ns, 2]
    window_tab = jnp.stack([sz, sy, sx, order], axis=1)  # [Ns, 4]

    n_bits = max(1, int(np.ceil(np.log2(max(ns, 2)))))
    qz_base = coords_q[:, 2]
    qy_base = coords_q[:, 1]
    qx_base = coords_q[:, 0]

    def row_lookup(dzdy):  # [2] -> (idx [K, Nq], valid [K, Nq])
        dz, dy = dzdy[0], dzdy[1]
        qz = qz_base + dz
        qyx = (qy_base + dy - y0) * xspan + (qx_base - r - x0)
        # lower_bound over (z, packed yx)
        lo = jnp.zeros(nq, jnp.int32)
        for b in range(n_bits - 1, -1, -1):
            cand = lo + (1 << b)
            in_b = cand <= ns
            probe = jnp.clip(cand - 1, 0, ns - 1)
            row = search_tab[probe]  # [Nq, 2]
            less = (row[:, 0] < qz) | ((row[:, 0] == qz) & (row[:, 1] < qyx))
            lo = jnp.where(in_b & less, cand, lo)

        # inspect the K consecutive entries: entry lo+i matches x-offset
        # dx = sx[lo+i] - qx when z/y agree and |dx| <= r
        idx_row = jnp.zeros((k, nq), jnp.int32)
        val_row = jnp.zeros((k, nq), bool)
        for i in range(k):
            pos = jnp.clip(lo + i, 0, ns - 1)
            w = window_tab[pos]  # [Nq, 4]
            ok = (
                (w[:, 0] == qz)
                & (w[:, 1] == qy_base + dy)
                & (lo + i < ns)
                & mask_q
            )
            dx = w[:, 2] - qx_base  # in [-r, r] when a true neighbor
            src = w[:, 3]
            for dxbin in range(k):
                hit = ok & (dx == dxbin - r)
                idx_row = idx_row.at[dxbin].set(
                    jnp.where(hit, src, idx_row[dxbin])
                )
                val_row = val_row.at[dxbin].set(val_row[dxbin] | hit)
        return idx_row, val_row

    # (dz, dy) rows with dz outer, dy inner — so reshape(k3) reproduces the
    # kernel_offsets enumeration (x fastest, then y, then z)
    rr = np.arange(k) - r
    zz, yy = np.meshgrid(rr, rr, indexing="ij")
    rows = jnp.asarray(np.stack([zz.reshape(-1), yy.reshape(-1)], -1))
    idx, valid = jax.lax.map(
        row_lookup, rows, batch_size=min(k * k, 25)
    )  # [K2, K, Nq]
    return NeighborMap(
        idx=idx.reshape(k3, nq), valid=valid.reshape(k3, nq)
    )


def sparse_conv_apply(
    feats: jax.Array,
    nmap: NeighborMap,
    weight: jax.Array,
    bias: jax.Array | None = None,
    group: int = 8,
) -> jax.Array:
    """Apply a submanifold sparse conv given a prebuilt neighbor map.

    feats: [Ns, Cin] source features.
    weight: [K3, Cin, Cout]; bias: [Cout].
    Offsets are processed in groups of `group` so each step is one
    [Nq, group*Cin] x [group*Cin, Cout] MXU contraction; the group size
    shrinks automatically for huge query counts to bound the gathered
    activation buffer (~256MB).
    """
    k3, cin, cout = weight.shape
    nq = nmap.idx.shape[1]
    weight = weight.astype(feats.dtype)
    budget = 64 * 1024 * 1024  # elements per gathered buffer
    g = max(1, min(group, budget // max(nq * cin, 1)))
    n_groups = (k3 + g - 1) // g
    pad = n_groups * g - k3

    idx = jnp.pad(nmap.idx, ((0, pad), (0, 0)))
    valid = jnp.pad(nmap.valid, ((0, pad), (0, 0)))
    w = jnp.pad(weight, ((0, pad), (0, 0), (0, 0)))

    idx = idx.reshape(n_groups, g, nq)
    valid = valid.reshape(n_groups, g, nq)
    w = w.reshape(n_groups, g * cin, cout)

    def body(acc, args):
        idx_g, valid_g, w_g = args  # [g, Nq], [g, Nq], [g*Cin, Cout]
        gathered = feats[idx_g]  # [g, Nq, Cin]
        gathered = jnp.where(valid_g[:, :, None], gathered, 0)
        x = gathered.transpose(1, 0, 2).reshape(nq, g * cin)
        return acc + jnp.dot(x, w_g, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((nq, cout), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (idx, valid, w))
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)
