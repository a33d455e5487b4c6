"""GausPcgc point-cloud geometry codec: encode/decode drivers.

API parity with the reference integration surface
(HAC/utils/pcc_utils.py:24-47 compress_point_cloud, :230-250
decompress_point_cloud): quantized coords in, self-contained .bin out,
losslessly decodable with the same network checkpoint.

Bitstream (own format; the network differs from the torch checkpoint so
reference-bitstream compat is not meaningful):
  u32 magic 'GPCT' | u8 version | f16 posQ | i32[3] coord shift |
  i32 base_len | i32[base_len,3] base coords | u8[base_len] base occ |
  framed per-level stage streams (4 per level, coarse->fine).

Execution model (SURVEY.md §3.2/§7): the host builds the integer geometry
(dyadic child expansion + conv neighbor maps, native C++ — ops/hostmap.py)
and runs the serial bit coder; the device runs only the batched NN math
(context conv stacks + stage heads + CDF normalization). Encode and decode
dispatch the SAME jitted stage program (encode teacher-forces the prev
bits from ground truth), so both sides produce bit-identical CDF tables by
construction — the property the reference maintains by running one network
in both drivers (compress/decompress_ue_4stage_conv.py).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import bitstream, cdf as cdf_lib
from gauspcc_tpu.ops import hostmap, rans, sibconv, sparse
from gauspcc_tpu.codecs.gauspcgc import model as net

MAGIC = 0x47504354  # 'GPCT'
VERSION = 2  # v2: per-level fused rANS streams (one stream per level)
VERSION_DEVICE = 3  # v3: device-built geometry, counts in header
VERSION_SIB = 4  # v4: sibling-packed conv engine (ops/sibconv.py); same
# framing as v2 — the version byte only pins which engine computed the
# CDF tables, since bf16 reductions in a different layout round
# differently and the decoder must reproduce the encoder's tables exactly
MIN_BASE_POINTS = 64

# Heterogeneous level placement: pyramid levels below this child capacity
# run on the host CPU backend, larger ones on the accelerator. The
# placement rule depends only on capacities both sides derive identically,
# so encoder and decoder always evaluate a level on the same backend and
# CDF tables stay bit-identical. Default 0 = everything on the
# accelerator: dispatches pipeline at ~30 us each even over a tunneled
# TPU, while this container's single host core runs a coarse level's conv
# stack ~50x slower than the chip. Raise via GAUSPCC_TPU_MIN_CAP on hosts
# with real CPUs if profiling favors it.
import os as _os

TPU_MIN_CAP = int(_os.environ.get("GAUSPCC_TPU_MIN_CAP", 0))


def _accel_device():
    dev = jax.devices()[0]
    return None if dev.platform == "cpu" else dev


def _cpu_device():
    return jax.devices("cpu")[0]


def _device_for(ccap: int):
    accel = _accel_device()
    if accel is None or ccap < TPU_MIN_CAP:
        return _cpu_device()
    return accel


class _ParamsCache:
    """Per-(params, device) copies of the network params.

    Entries hold only WEAK references to the source leaves (VERDICT r3
    weak #9): the cache neither pins a dead params tree in memory nor can
    a GC-reused id alias a different live tree — a hit requires every
    weakly-referenced leaf to still be the identical object."""

    def __init__(self):
        self._copies: dict = {}  # (leaf ids..., dev) -> (leaf refs, moved)

    def get(self, params, dev):
        import weakref

        leaves = jax.tree_util.tree_leaves(params)
        key = (tuple(id(x) for x in leaves), dev)
        hit = self._copies.get(key)
        if hit is not None and all(
            r() is x for r, x in zip(hit[0], leaves)
        ):
            return hit[1]
        try:
            refs = tuple(weakref.ref(x) for x in leaves)
        except TypeError:  # unweakrefable leaf type: skip memoization
            return jax.device_put(params, dev)
        # evict entries whose source tree died (their ids may be reused)
        dead = [k for k, (rs, _) in self._copies.items()
                if any(r() is None for r in rs)]
        for k in dead:
            del self._copies[k]
        moved = jax.device_put(params, dev)
        self._copies[key] = (refs, moved)
        return moved


_params_cache = _ParamsCache()


def _params_on(params, dev):
    """Per-device copy of the network params (memoized; the handful of
    coarse levels share one CPU copy)."""
    return _params_cache.get(params, dev)


def _bucket(n: int, minimum: int = 256) -> int:
    """Next capacity step. Power-of-two up to 16384, then multiples of
    16384: bounds both jit recompiles per level size and pad waste (pure
    powers of two waste up to 2x compute at the dominant fine levels)."""
    b = minimum
    while b < n and b < 16384:
        b *= 2
    if n > b:
        b = ((n + 16383) // 16384) * 16384
    return b


def _pad_parents(coords: np.ndarray, occ: np.ndarray):
    n = coords.shape[0]
    cap = _bucket(n)
    pc = np.zeros((cap, 3), np.int32)
    po = np.zeros(cap, np.int32)
    pm = np.zeros(cap, bool)
    pc[:n] = coords
    po[:n] = occ
    pm[:n] = True
    return jnp.asarray(pc), jnp.asarray(po), jnp.asarray(pm)


@partial(jax.jit, static_argnames=("config",))
def _context_packed(params, config, po, pm, p_map, octant, parent_idx,
                    child_mask, c_map):
    """Shared context program (both encode and decode run THIS program on
    the same inputs, so the features are bit-identical by construction)."""
    return net.level_context_packed(
        params, config, po, pm, p_map, octant, parent_idx, child_mask, c_map)


@partial(jax.jit, static_argnames=("stage",))
def _stage_cdf(params, stage, feats, c_map, prev):
    """Shared per-stage CDF program. Bit-identity between encoder and
    decoder is guaranteed by construction: it is the SAME compiled
    program fed the same device arrays on both sides (XLA may fuse a
    float subgraph differently in differently-shaped programs, so baking
    this into larger fused programs is NOT safe — measured divergence on
    TPU with bf16 conv stacks)."""
    probs = net.stage_probs(params, stage, feats, c_map, prev)
    return cdf_lib.probs_to_cdf_int16(probs)


# rANS steps are pure integer programs: any compilation of them is exact,
# so they need no sharing discipline. All intermediates (tables, states,
# prev chains) live on device; the host only touches the word buffers.
_rans_encode_stage = jax.jit(rans.encode_stage)
_rans_flush = jax.jit(rans.enc_flush)


@partial(jax.jit, static_argnames=("stage",))
def _rans_decode_stage(state, ptr, words, table, prev, n_valid, stage):
    (state, ptr), s = rans.decode_stage((state, ptr), table, words, n_valid)
    if stage == 0:
        prev = s
    elif stage == 1:
        prev = prev * 2 + s
    elif stage == 2:
        prev = prev * 4 + s
    else:
        prev = prev * 16 + s  # final: prev becomes the occupancy byte
    return state, ptr, prev


def _rans_dec_init(words):
    return jax.jit(rans.dec_init)(words)


class _LevelGeometry:
    """Host-built geometry of one pyramid level, uploaded once.

    `prof`: optional dict accumulating {"host_s", "upload_s",
    "upload_bytes"} (bench transfer breakdown; adds blocking, so only
    pass it when profiling)."""

    def __init__(self, p_coords, p_occ, n_child: int, kernel_size: int,
                 parent_map_dev=None, child_coords=None, prof=None):
        self.prof = prof
        np_ = p_coords.shape[0]
        pcap = _bucket(np_)
        self.n_parents = np_
        self.n_child = n_child
        self.ccap = min(_bucket(n_child), pcap * 8)
        self.device = _device_for(self.ccap)
        put = partial(jax.device_put, device=self.device)
        po = np.zeros(pcap, np.int32)
        po[:np_] = p_occ
        pm = np.zeros(pcap, bool)
        pm[:np_] = True
        self.po = put(po)
        self.pm = put(pm)

        cc, octant, parent_idx, n = hostmap.expand_children(
            p_coords, p_occ.astype(np.uint8), self.ccap)
        assert n == n_child, f"child count mismatch: {n} vs {n_child}"
        self.child_coords = cc  # host copy (decode output / next parents)
        self.octant = put(octant)
        self.parent_idx = put(parent_idx)
        self.child_mask = put(np.arange(self.ccap) < n_child)

        if parent_map_dev is not None and (
            parent_map_dev.lo.devices() == {self.device}
        ):
            self.p_map = parent_map_dev
        else:
            self.p_map = self._upload_map(p_coords, np_, kernel_size, pcap, put)
        self.c_map = self._upload_map(cc, n_child, kernel_size, self.ccap, put)

    def _upload_map(self, coords, n_valid, kernel_size, cap, put):
        """Build the packed window map on host and ship lo in u8-delta form
        (~2x fewer bytes over the tunnel); expand to int32 on device."""
        t0 = time.time()
        lo, codes = hostmap.build_map_packed(coords, n_valid, kernel_size, cap)
        base, off, exc_pos, exc_val = sparse.pack_lo_np(lo)
        if self.prof is not None:
            self.prof["host_s"] = self.prof.get("host_s", 0.0) + time.time() - t0
            t0 = time.time()
        packed = sparse.PackedLo(put(base), put(off), put(exc_pos),
                                 put(exc_val))
        wmap = sparse.WindowMap(sparse.expand_lo(packed, cap), put(codes))
        if self.prof is not None:
            jax.block_until_ready((wmap.lo, wmap.codes))
            self.prof["upload_s"] = (
                self.prof.get("upload_s", 0.0) + time.time() - t0)
            self.prof["upload_bytes"] = self.prof.get("upload_bytes", 0) + (
                base.nbytes + off.nbytes + exc_pos.nbytes + exc_val.nbytes
                + codes.nbytes)
        return wmap


@partial(jax.jit, static_argnames=("config",))
def _context_sib(params, config, pocc, pmask, p_gmapT, p_gmapfT, ppos,
                 c_gmapT, c_gmapfT, cmask8):
    """Shared sib-engine context program (encode and decode both run THIS
    program on the same inputs -> bit-identical features)."""
    return net.sib_context(params, config, pocc, pmask, p_gmapT, p_gmapfT,
                           ppos, c_gmapT, c_gmapfT, cmask8)


@partial(jax.jit, static_argnames=("stage",))
def _stage_cdf_sib(params, stage, cf, c_gmapT, c_gmapfT, cmask8,
                   prev_lex, cpos, inv):
    """Per-stage CDF tables in LEX (coded) order from packed features.

    prev_lex int32 [ccap]: previously (de)coded symbols in coded order;
    inv int32 [Pcap*8]: lex row of each packed slot (0 on empty slots,
    masked inside); cpos int32 [ccap]: packed slot of each coded child."""
    prev_packed = prev_lex[inv]
    probs = net.sib_stage_probs(params, stage, cf, c_gmapT, c_gmapfT,
                                cmask8, prev_packed)
    return cdf_lib.probs_to_cdf_int16(probs[cpos])


class _SibLevelGeometry:
    """Host-built sibling-packed geometry of one pyramid level.

    Uploads ONE k=3 cell map per voxel set ([cap, 27] int32, ~23 B/point)
    instead of the k^2-row window maps (~150 B/point) — and the conv it
    feeds is the MXU-shaped sibconv (ops/sibconv.py). The coded symbol
    order stays the v2 lex order: tables are gathered back through `cpos`,
    so only the version byte changes, not the framing."""

    def __init__(self, p_coords, p_occ, n_child: int,
                 parent_gmap_dev=None, prof=None):
        t0 = time.time()
        np_ = p_coords.shape[0]
        pcap = _bucket(np_)
        self.n_parents = np_
        self.n_child = n_child
        self.ccap = min(_bucket(n_child), pcap * 8)
        self.device = _device_for(self.ccap)
        put = partial(jax.device_put, device=self.device)

        cc, octant, parent_idx, n = hostmap.expand_children(
            p_coords, p_occ.astype(np.uint8), self.ccap)
        assert n == n_child, f"child count mismatch: {n} vs {n_child}"
        self.child_coords = cc  # host copy (decode output / next parents)
        cpos = parent_idx.astype(np.int64) * 8 + octant
        cpos[n:] = 0
        inv = np.zeros(pcap * 8, np.int32)
        inv[cpos[:n]] = np.arange(n, dtype=np.int32)

        groups = sparse.dedupe_lex_np(
            p_coords.astype(np.int64) >> 1).astype(np.int32)
        gpcap = _bucket(groups.shape[0])
        pos = sibconv.sib_pos_np(p_coords, groups)
        pocc_packed = np.zeros(gpcap * 8, np.int32)
        pocc_packed[pos] = p_occ
        pmask = np.zeros(gpcap * 8, bool)
        pmask[pos] = True
        ppos = np.zeros(pcap, np.int32)
        ppos[:np_] = pos
        cmask8 = np.zeros(pcap * 8, bool)
        bits = (np.asarray(p_occ, np.uint16)[:, None]
                >> np.arange(8)[None, :]) & 1
        cmask8[: np_ * 8] = bits.astype(bool).reshape(-1)

        if prof is not None:
            prof["host_s"] = prof.get("host_s", 0.0) + time.time() - t0

        self.cpos = put(cpos.astype(np.int32))
        self.inv = put(inv)
        self.pocc = put(pocc_packed)
        self.pmask = put(pmask)
        self.ppos = put(ppos)
        self.cmask8 = put(cmask8)
        self.child_mask = put(np.arange(self.ccap) < n_child)

        if parent_gmap_dev is not None and parent_gmap_dev.shape[0] == gpcap:
            # groups of this level's parents ARE the previous level's
            # parent voxels (every voxel has >=1 child), so the previous
            # level's child-cell map is this level's parent-cell map
            self.p_gmapT = parent_gmap_dev
        else:
            self.p_gmapT = self._upload_gmap(groups, gpcap, put, prof)
        self.p_gmapfT = self.p_gmapT[:, ::-1]
        self.c_gmapT = self._upload_gmap(p_coords, pcap, put, prof)
        self.c_gmapfT = self.c_gmapT[:, ::-1]

    @staticmethod
    def _upload_gmap(coords, cap, put, prof=None):
        t0 = time.time()
        gmap = hostmap.build_map(np.ascontiguousarray(coords, np.int32),
                                 coords.shape[0], 3, ncap=cap)
        gmapT = np.ascontiguousarray(gmap.T)
        if prof is not None:
            prof["host_s"] = prof.get("host_s", 0.0) + time.time() - t0
            t0 = time.time()
        dev = put(gmapT)
        if prof is not None:
            dev.block_until_ready()
            prof["upload_s"] = prof.get("upload_s", 0.0) + time.time() - t0
            prof["upload_bytes"] = prof.get("upload_bytes", 0) + gmapT.nbytes
        return dev


def _encode_levels_sib(levels, params, config: net.NetConfig):
    """Sib-engine encoder core; v2 framing, VERSION_SIB tables."""
    pending = []
    carry_gmap = None
    for depth in range(len(levels) - 1):
        p_coords, p_occ = levels[depth]
        g = _SibLevelGeometry(p_coords, p_occ, levels[depth + 1][0].shape[0],
                              parent_gmap_dev=carry_gmap)
        carry_gmap = g.c_gmapT
        assert np.array_equal(g.child_coords[: g.n_child],
                              levels[depth + 1][0]), f"align @ depth {depth}"
        p_dev = _params_on(params, g.device)
        put = partial(jax.device_put, device=g.device)
        gt_pad = np.zeros(g.ccap, np.int32)
        gt_pad[: g.n_child] = levels[depth + 1][1]
        gt_dev = put(gt_pad)
        n_valid = put(np.int32(g.n_child))
        cf = _context_sib(p_dev, config, g.pocc, g.pmask, g.p_gmapT,
                          g.p_gmapfT, g.ppos, g.c_gmapT, g.c_gmapfT,
                          g.cmask8)
        s_gt = net.split_occupancy(gt_dev)
        prevs = [jnp.zeros_like(s_gt[0]), s_gt[0], s_gt[0] * 2 + s_gt[1],
                 (s_gt[0] * 2 + s_gt[1]) * 4 + s_gt[2]]
        carry = jax.device_put(rans.enc_init_np(g.ccap), g.device)
        for stage in (3, 2, 1, 0):  # rANS encodes the stream in reverse
            table = _stage_cdf_sib(p_dev, stage, cf, g.c_gmapT, g.c_gmapfT,
                                   g.cmask8, prevs[stage], g.cpos, g.inv)
            carry = _rans_encode_stage(carry, table, s_gt[stage], n_valid)
        pending.append(_rans_flush(carry))
    return [
        rans.pack_stream(np.asarray(words), np.asarray(n_words))
        for words, n_words in pending
    ]


def _decode_levels_sib(base_coords, base_occ, payload: bytes, params,
                       config: net.NetConfig, profile: list | None = None):
    """Sib-engine decoder core; mirrors _decode_levels."""
    streams = bitstream.unpack_byte_streams(payload)
    n_levels = len(streams)
    p_coords = base_coords.astype(np.int32)
    p_occ = base_occ.astype(np.int32)
    carry_gmap = None
    for depth in range(n_levels):
        n_child = int(np.unpackbits(p_occ.astype(np.uint8)[:, None],
                                    axis=1).sum())
        lvl_prof = {} if profile is not None else None
        t_lvl = time.time()
        g = _SibLevelGeometry(p_coords, p_occ, n_child,
                              parent_gmap_dev=carry_gmap, prof=lvl_prof)
        carry_gmap = g.c_gmapT
        p_dev = _params_on(params, g.device)
        put = partial(jax.device_put, device=g.device)
        w_np, _ = rans.unpack_stream(streams[depth],
                                     rans.word_capacity(g.ccap))
        words = put(w_np)
        n_valid = put(np.int32(n_child))
        if lvl_prof is not None:
            words.block_until_ready()
            lvl_prof["upload_s"] = lvl_prof.get("upload_s", 0.0) + (
                time.time() - t_lvl - lvl_prof.get("host_s", 0.0)
                - lvl_prof.get("upload_s", 0.0))
            lvl_prof["upload_bytes"] = (lvl_prof.get("upload_bytes", 0)
                                        + w_np.nbytes)
            t_dev = time.time()
        cf = _context_sib(p_dev, config, g.pocc, g.pmask, g.p_gmapT,
                          g.p_gmapfT, g.ppos, g.c_gmapT, g.c_gmapfT,
                          g.cmask8)
        state, ptr = _rans_dec_init(words)
        prev = put(np.zeros(g.ccap, np.int32))
        for stage in range(4):
            table = _stage_cdf_sib(p_dev, stage, cf, g.c_gmapT, g.c_gmapfT,
                                   g.cmask8, prev, g.cpos, g.inv)
            state, ptr, prev = _rans_decode_stage(
                state, ptr, words, table, prev, n_valid, stage)
        if lvl_prof is not None:
            prev.block_until_ready()
            lvl_prof["device_s"] = time.time() - t_dev
            t_dl = time.time()
        p_coords = g.child_coords[:n_child]
        p_occ = np.asarray(prev)[:n_child].astype(np.int32)
        if lvl_prof is not None:
            lvl_prof["download_s"] = time.time() - t_dl
            lvl_prof["n_child"] = n_child
            profile.append(lvl_prof)

    n_final = int(np.unpackbits(p_occ.astype(np.uint8)[:, None], axis=1).sum())
    cc, _, _, _ = hostmap.expand_children(
        p_coords, p_occ.astype(np.uint8), n_final)
    return cc[:n_final], n_final


def _level_geometries(levels, kernel_size: int):
    """Geometry for every coded level, coarse->fine, with map reuse."""
    geos = []
    carry = None
    for depth in range(len(levels) - 1):
        p_coords, p_occ = levels[depth]
        n_child = levels[depth + 1][0].shape[0]
        reuse = carry if carry is not None and carry[0] == _bucket(
            p_coords.shape[0]) else None
        g = _LevelGeometry(p_coords, p_occ, n_child, kernel_size,
                           parent_map_dev=reuse[1] if reuse else None)
        geos.append(g)
        carry = (g.ccap, g.c_map)
    return geos


def _encode_levels(levels, params, config: net.NetConfig):
    """Run the per-level stage programs over a built pyramid; returns the
    packed per-level byte streams (the shared core of the single-cloud and
    batched drivers)."""
    geos = _level_geometries(levels, config.kernel_size)

    # enqueue ALL levels without blocking (teacher-forced: nothing
    # depends on coded bits; tables/states stay on device — the dominant
    # tunnel transfer, the CDF tables, never leaves), then drain the
    # per-level word buffers.
    pending = []  # (words_dev, n_words_dev) per level
    for depth, g in enumerate(geos):
        gt_occ = levels[depth + 1][1]
        # the coded symbols are indexed by the host's lex-sorted children;
        # they must BE the next level's coords (cheap, load-bearing check)
        assert np.array_equal(g.child_coords[: g.n_child],
                              levels[depth + 1][0]), f"align @ depth {depth}"
        p_dev = _params_on(params, g.device)
        put = partial(jax.device_put, device=g.device)
        gt_pad = np.zeros(g.ccap, np.int32)
        gt_pad[: g.n_child] = gt_occ
        gt_dev = put(gt_pad)
        n_valid = put(np.int32(g.n_child))
        feats = _context_packed(p_dev, config, g.po, g.pm, g.p_map,
                                g.octant, g.parent_idx, g.child_mask, g.c_map)
        s_gt = net.split_occupancy(gt_dev)
        prevs = [jnp.zeros_like(s_gt[0]), s_gt[0], s_gt[0] * 2 + s_gt[1],
                 (s_gt[0] * 2 + s_gt[1]) * 4 + s_gt[2]]
        carry = jax.device_put(rans.enc_init_np(g.ccap), g.device)
        for stage in (3, 2, 1, 0):  # rANS encodes the stream in reverse
            table = _stage_cdf(p_dev, stage, feats, g.c_map, prevs[stage])
            carry = _rans_encode_stage(carry, table, s_gt[stage], n_valid)
        pending.append(_rans_flush(carry))

    return [
        rans.pack_stream(np.asarray(words), np.asarray(n_words))
        for words, n_words in pending
    ]


# ---------------------------------------------------------------------------
# v3: device-built geometry
# ---------------------------------------------------------------------------
#
# The host-geometry path (v2) uploads a packed neighbor map per level —
# ~6 B/voxel/row, the dominant transfer of codec decode on a
# bandwidth-limited link (BASELINE.md r2 breakdown). The device path
# rebuilds the SAME geometry on the accelerator with pure integer
# programs (fcg_expand + lex_sort + binary-search window lookup,
# ops/sparse.py) — exact on any backend — so the only per-level traffic
# is the rANS words themselves. Per-level child counts ride in the
# header (the encoder knows every level size), so decode enqueues the
# whole pyramid without a single device->host sync and blocks exactly
# once, on the final coordinates. Encode/decode bit-identity holds as in
# v2: both sides dispatch the same jitted programs on identical inputs.

GEOM_MODE = _os.environ.get("GAUSPCC_GEOM", "sib")


@partial(jax.jit, static_argnames=("ccap",))
def _device_children(p_coords, p_occ, p_mask, ccap: int):
    """Expand+lex-sort the occupied children, compacted to `ccap` rows.

    Reproduces the host builder's child order (hostmap.expand_children):
    both enumerate the occupied children of the same lex-sorted parents
    in (z, y, x) lex order."""
    child, cm, octant, pidx = sparse.fcg_expand(p_coords, p_occ, p_mask)
    perm = sparse.lex_sort(child, cm)[:ccap]
    return child[perm], cm[perm], octant[perm], pidx[perm]


def _device_levels(counts, base_coords, base_occ, config):
    """Generator driving the shared coarse->fine device-geometry sweep.

    Yields (depth, geom dict) per coded level; the caller sends back the
    child occupancy array [ccap] (ground truth while encoding, decoded
    while decoding) that becomes the next level's parent occupancy.
    counts[d] = valid children of level d; len(counts) = n_levels."""
    accel = _accel_device() or _cpu_device()
    put = partial(jax.device_put, device=accel)
    k = config.kernel_size

    n0 = base_coords.shape[0]
    pcap = _bucket(n0)
    pc = np.zeros((pcap, 3), np.int32)
    pc[:n0] = base_coords
    p_coords = put(pc)
    po = np.zeros(pcap, np.int32)
    po[:n0] = base_occ
    p_occ = put(po)
    p_mask = put(np.arange(pcap) < n0)
    p_map = None

    for depth, n_child in enumerate(counts):
        ccap = min(_bucket(int(n_child)), pcap * 8)
        if p_map is None:
            p_map = sparse.build_neighbor_map(p_coords, p_mask, p_coords,
                                              p_mask, k)
        child, cm, octant, pidx = _device_children(p_coords, p_occ, p_mask,
                                                   ccap)
        c_map = sparse.build_neighbor_map(child, cm, child, cm, k)
        geom = {
            "put": put, "accel": accel, "ccap": ccap, "n_child": int(n_child),
            "p_occ": p_occ, "p_mask": p_mask, "p_map": p_map,
            "child": child, "child_mask": cm, "octant": octant,
            "parent_idx": pidx, "c_map": c_map,
        }
        child_occ = yield depth, geom
        p_coords, p_occ, p_mask = child, child_occ, cm
        p_map, pcap = c_map, ccap
    # expose the final parent state for the leaf expansion
    yield -1, {"p_coords": p_coords, "p_occ": p_occ, "p_mask": p_mask,
               "pcap": pcap}


def _encode_levels_device(levels, params, config: net.NetConfig):
    """v3 encoder core: returns (streams, counts) with counts[d] = level
    d's child count and counts[-1] = final point count."""
    counts = [lv[0].shape[0] for lv in levels[1:]]
    n_final = int(np.unpackbits(
        levels[-1][1].astype(np.uint8)[:, None], axis=1).sum())
    base_coords, base_occ = levels[0]
    gen = _device_levels(counts, base_coords, base_occ, config)
    pending = []
    send = None
    accel = _accel_device() or _cpu_device()
    p_dev = _params_on(params, accel)
    while True:
        depth, g = gen.send(send)
        if depth < 0:
            break
        gt_pad = np.zeros(g["ccap"], np.int32)
        gt_pad[: g["n_child"]] = levels[depth + 1][1]
        gt_dev = g["put"](gt_pad)
        n_valid = g["put"](np.int32(g["n_child"]))
        feats = _context_packed(p_dev, config, g["p_occ"], g["p_mask"],
                                g["p_map"], g["octant"], g["parent_idx"],
                                g["child_mask"], g["c_map"])
        s_gt = net.split_occupancy(gt_dev)
        prevs = [jnp.zeros_like(s_gt[0]), s_gt[0], s_gt[0] * 2 + s_gt[1],
                 (s_gt[0] * 2 + s_gt[1]) * 4 + s_gt[2]]
        carry = jax.device_put(rans.enc_init_np(g["ccap"]), g["accel"])
        for stage in (3, 2, 1, 0):
            table = _stage_cdf(p_dev, stage, feats, g["c_map"], prevs[stage])
            carry = _rans_encode_stage(carry, table, s_gt[stage], n_valid)
        pending.append(_rans_flush(carry))
        send = gt_dev
    streams = [
        rans.pack_stream(np.asarray(words), np.asarray(n_words))
        for words, n_words in pending
    ]
    return streams, counts + [n_final]


def _decode_levels_device(base_coords, base_occ, payload: bytes, counts,
                          params, config: net.NetConfig):
    """v3 decoder core: the whole pyramid is enqueued asynchronously; the
    single host block is the final coordinate download."""
    streams = bitstream.unpack_byte_streams(payload)
    n_levels = len(streams)
    assert len(counts) == n_levels + 1
    gen = _device_levels(counts[:-1], base_coords.astype(np.int32),
                         base_occ.astype(np.int32), config)
    accel = _accel_device() or _cpu_device()
    p_dev = _params_on(params, accel)
    send = None
    while True:
        depth, g = gen.send(send)
        if depth < 0:
            break
        feats = _context_packed(p_dev, config, g["p_occ"], g["p_mask"],
                                g["p_map"], g["octant"], g["parent_idx"],
                                g["child_mask"], g["c_map"])
        w_np, _ = rans.unpack_stream(streams[depth],
                                     rans.word_capacity(g["ccap"]))
        words = g["put"](w_np)
        n_valid = g["put"](np.int32(g["n_child"]))
        state, ptr = _rans_dec_init(words)
        prev = g["put"](np.zeros(g["ccap"], np.int32))
        for stage in range(4):
            table = _stage_cdf(p_dev, stage, feats, g["c_map"], prev)
            state, ptr, prev = _rans_decode_stage(
                state, ptr, words, table, prev, n_valid, stage)
        send = prev  # the decoded occupancy bytes seed the next level
    fin = g
    n_final = int(counts[-1])
    fcap = min(_bucket(n_final), fin["pcap"] * 8)
    child, _, _, _ = _device_children(fin["p_coords"], fin["p_occ"],
                                      fin["p_mask"], fcap)
    return np.asarray(child[:n_final]), n_final


def compress_point_cloud(
    xyz_quantized,
    params,
    output_path: str,
    posQ: float = 1.0,
    config: net.NetConfig = net.NetConfig(),
    geom: str | None = None,
) -> dict:
    """Compress integer coords [N, 3] to `output_path`.

    Returns {bpp, enc_time, file_size_bits, num_points, output_path},
    the same result surface as the reference API (pcc_utils.py:205-217).

    `geom`: "sib" (v4, sibling-packed MXU convs — the default), "host"
    (v2 bitstream, host-built window maps) or "device" (v3, geometry
    rebuilt on the accelerator; see the v3 block comment). Defaults to
    $GAUSPCC_GEOM or "sib". Decode auto-selects by the version byte.
    """
    geom = geom or GEOM_MODE
    xyz = np.asarray(xyz_quantized)
    if posQ != 1.0:
        xyz = np.round(xyz / posQ)
    xyz = xyz.astype(np.int64)
    n_points = xyz.shape[0]

    t0 = time.time()
    shift = xyz.min(axis=0)
    xyz0 = sparse.dedupe_lex_np(xyz - shift)

    levels = sparse.build_occupancy_pyramid(xyz0, min_points=MIN_BASE_POINTS,
                                            sorted_unique=True)
    if geom == "device":
        streams, counts = _encode_levels_device(levels, params, config)
    elif geom == "sib":
        streams = _encode_levels_sib(levels, params, config)
    else:
        streams = _encode_levels(levels, params, config)

    base_coords, base_occ = levels[0]
    payload = bitstream.pack_byte_streams(streams)
    version = {"device": VERSION_DEVICE, "sib": VERSION_SIB}.get(geom, VERSION)
    with open(output_path, "wb") as f:
        f.write(np.uint32(MAGIC).tobytes())
        f.write(np.uint8(version).tobytes())
        f.write(np.float16(posQ).tobytes())
        f.write(shift.astype(np.int32).tobytes())
        f.write(np.int32(base_coords.shape[0]).tobytes())
        f.write(base_coords.astype(np.int32).tobytes())
        f.write(base_occ.astype(np.uint8).tobytes())
        if geom == "device":
            f.write(np.uint8(len(counts) - 1).tobytes())
            f.write(np.asarray(counts, np.int32).tobytes())
        f.write(payload)
    enc_time = time.time() - t0

    fsb = bitstream.file_size_bits(output_path)
    return {
        "bpp": fsb / n_points,
        "enc_time": enc_time,
        "file_size_bits": fsb,
        "num_points": n_points,
        "output_path": output_path,
    }


def decompress_point_cloud(
    bin_file_path: str,
    params,
    config: net.NetConfig = net.NetConfig(),
    profile: list | None = None,
) -> dict:
    """Decode a .bin produced by compress_point_cloud.

    Returns {dec_time, num_points, point_cloud (np.ndarray float32 [N,3])},
    parity with pcc_utils.py:395-400.
    """
    with open(bin_file_path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.uint32)[0]
        assert magic == MAGIC, "not a GPCT bitstream"
        version = int(np.frombuffer(f.read(1), np.uint8)[0])
        posQ = float(np.frombuffer(f.read(2), np.float16)[0])
        shift = np.frombuffer(f.read(12), np.int32).astype(np.int64)
        base_len = int(np.frombuffer(f.read(4), np.int32)[0])
        base_coords = np.frombuffer(f.read(base_len * 12), np.int32).reshape(-1, 3)
        base_occ = np.frombuffer(f.read(base_len), np.uint8)
        if version == VERSION_DEVICE:
            n_levels = int(np.frombuffer(f.read(1), np.uint8)[0])
            counts = np.frombuffer(f.read(4 * (n_levels + 1)), np.int32)
        payload = f.read()

    t0 = time.time()
    if version == VERSION_DEVICE:
        cc, n_final = _decode_levels_device(base_coords, base_occ, payload,
                                            counts, params, config)
    elif version == VERSION_SIB:
        cc, n_final = _decode_levels_sib(base_coords, base_occ, payload,
                                         params, config, profile=profile)
    else:
        cc, n_final = _decode_levels(base_coords, base_occ, payload, params,
                                     config, profile=profile)
    pts = cc.astype(np.int64) + shift
    pts = pts.astype(np.float32) * posQ
    dec_time = time.time() - t0

    return {"dec_time": dec_time, "num_points": n_final, "point_cloud": pts}


def _decode_levels(base_coords, base_occ, payload: bytes, params,
                   config: net.NetConfig, profile: list | None = None):
    """Decode the framed per-level streams; returns (int32 coords, n).

    `profile`: optional list collecting one dict per level with the
    serial-latency breakdown {host_s, upload_s, upload_bytes, device_s,
    download_s, n_child} (VERDICT r2 item 4). Profiling inserts blocking
    barriers, so never pass it on a throughput-measured path."""
    streams = bitstream.unpack_byte_streams(payload)
    n_levels = len(streams)

    p_coords = base_coords.astype(np.int32)
    p_occ = base_occ.astype(np.int32)
    prev_geo = None
    for depth in range(n_levels):
        # children are known BEFORE decoding (they follow from the parent
        # occupancy); only the CHILDREN's occupancy bytes are coded.
        n_child = int(np.unpackbits(p_occ.astype(np.uint8)[:, None],
                                    axis=1).sum())
        reuse = None
        if prev_geo is not None and prev_geo.ccap == _bucket(p_coords.shape[0]):
            reuse = prev_geo.c_map
        lvl_prof = {} if profile is not None else None
        t_lvl = time.time()
        g = _LevelGeometry(p_coords, p_occ, n_child, config.kernel_size,
                           parent_map_dev=reuse, prof=lvl_prof)
        p_dev = _params_on(params, g.device)
        put = partial(jax.device_put, device=g.device)
        w_np, _ = rans.unpack_stream(streams[depth],
                                     rans.word_capacity(g.ccap))
        words = put(w_np)
        n_valid = put(np.int32(n_child))
        if lvl_prof is not None:
            words.block_until_ready()
            lvl_prof["upload_s"] = (lvl_prof.get("upload_s", 0.0)
                                    + time.time() - t_lvl
                                    - lvl_prof.get("host_s", 0.0)
                                    - lvl_prof.get("upload_s", 0.0))
            lvl_prof["upload_bytes"] = (lvl_prof.get("upload_bytes", 0)
                                        + w_np.nbytes)
            t_dev = time.time()
        # the whole level is enqueued asynchronously (stage k's decoded
        # symbols stay on device and feed stage k+1's conv context); the
        # host blocks once, on the occupancy bytes
        feats = _context_packed(p_dev, config, g.po, g.pm, g.p_map,
                                g.octant, g.parent_idx, g.child_mask, g.c_map)
        state, ptr = _rans_dec_init(words)
        prev = put(np.zeros(g.ccap, np.int32))
        for stage in range(4):
            table = _stage_cdf(p_dev, stage, feats, g.c_map, prev)
            state, ptr, prev = _rans_decode_stage(
                state, ptr, words, table, prev, n_valid, stage)

        if lvl_prof is not None:
            prev.block_until_ready()
            lvl_prof["device_s"] = time.time() - t_dev
            t_dl = time.time()
        p_coords = g.child_coords[:n_child]
        p_occ = np.asarray(prev)[:n_child].astype(np.int32)
        if lvl_prof is not None:
            lvl_prof["download_s"] = time.time() - t_dl
            lvl_prof["n_child"] = n_child
            profile.append(lvl_prof)
        prev_geo = g

    # final expansion: leaves of the finest decoded level (host)
    n_final = int(np.unpackbits(p_occ.astype(np.uint8)[:, None], axis=1).sum())
    cc, _, _, _ = hostmap.expand_children(
        p_coords, p_occ.astype(np.uint8), n_final)
    return cc[:n_final], n_final


# ---------------------------------------------------------------------------
# Batched multi-cloud driver
# ---------------------------------------------------------------------------
#
# The reference amortizes model setup over the GausPcc-1K testset with a
# host file loop (compress_ue_4stage_conv.py:249-267) — each cloud still
# pays its own GPU dispatches. The TPU-first form merges M clouds into
# ONE pyramid: cloud i is translated by i * 2^L along z (L = the dyadic
# extent of the largest cloud), so clouds occupy disjoint dyadic blocks
# at every level, neighbor windows never cross clouds (submanifold convs
# see an empty boundary, exactly as at a cloud edge), and one set of
# per-level programs codes everything with 8x larger batches.

BATCH_MAGIC = 0x47504342  # 'GPCB'


def _merge_clouds(clouds, posQ: float):
    shifted, shifts, counts = [], [], []
    for xyz in clouds:
        xyz = np.asarray(xyz)
        if posQ != 1.0:
            xyz = np.round(xyz / posQ)
        xyz = xyz.astype(np.int64)
        s = xyz.min(axis=0)
        shifts.append(s)
        uniq = sparse.dedupe_lex_np(xyz - s)
        counts.append(uniq.shape[0])  # decoded (lossless) = unique voxels
        shifted.append(uniq)
    span = max(int(c.max()) + 1 for c in shifted)
    lbits = max(1, int(np.ceil(np.log2(span))))
    assert (len(clouds) << lbits) < 2**31, "batch exceeds int32 z range"
    merged = np.concatenate([
        c + np.array([0, 0, i << lbits], np.int64)
        for i, c in enumerate(shifted)
    ]).astype(np.int32)
    return merged, np.stack(shifts), np.asarray(counts, np.int64), lbits


def compress_point_cloud_batch(
    clouds,
    params,
    output_path: str,
    posQ: float = 1.0,
    config: net.NetConfig = net.NetConfig(),
    geom: str | None = None,
) -> dict:
    """Compress M quantized clouds into one batch bitstream.

    Returns aggregate {bpp, enc_time, file_size_bits, num_points,
    num_clouds, output_path}; decode with decompress_point_cloud_batch.
    `geom` as in :func:`compress_point_cloud`."""
    geom = geom or GEOM_MODE
    t0 = time.time()
    merged, shifts, counts, lbits = _merge_clouds(clouds, posQ)
    levels = sparse.build_occupancy_pyramid(merged, min_points=MIN_BASE_POINTS)
    if geom == "device":
        streams, lvl_counts = _encode_levels_device(levels, params, config)
    elif geom == "sib":
        streams = _encode_levels_sib(levels, params, config)
    else:
        streams = _encode_levels(levels, params, config)

    base_coords, base_occ = levels[0]
    payload = bitstream.pack_byte_streams(streams)
    m = len(clouds)
    version = {"device": VERSION_DEVICE, "sib": VERSION_SIB}.get(geom, VERSION)
    with open(output_path, "wb") as f:
        f.write(np.uint32(BATCH_MAGIC).tobytes())
        f.write(np.uint8(version).tobytes())
        f.write(np.float16(posQ).tobytes())
        f.write(np.int32([m, lbits]).tobytes())
        f.write(shifts.astype(np.int32).tobytes())
        f.write(counts.astype(np.int64).tobytes())
        f.write(np.int32(base_coords.shape[0]).tobytes())
        f.write(base_coords.astype(np.int32).tobytes())
        f.write(base_occ.astype(np.uint8).tobytes())
        if geom == "device":
            f.write(np.uint8(len(lvl_counts) - 1).tobytes())
            f.write(np.asarray(lvl_counts, np.int32).tobytes())
        f.write(payload)
    enc_time = time.time() - t0

    n_points = int(counts.sum())
    fsb = bitstream.file_size_bits(output_path)
    return {
        "bpp": fsb / n_points,
        "enc_time": enc_time,
        "file_size_bits": fsb,
        "num_points": n_points,
        "num_clouds": m,
        "output_path": output_path,
    }


def decompress_point_cloud_batch(
    bin_file_path: str,
    params,
    config: net.NetConfig = net.NetConfig(),
) -> dict:
    """Decode a batch bitstream -> {dec_time, point_clouds: list of
    float32 [Ni, 3], num_points}."""
    with open(bin_file_path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.uint32)[0]
        assert magic == BATCH_MAGIC, "not a GPCB batch bitstream"
        version = int(np.frombuffer(f.read(1), np.uint8)[0])
        posQ = float(np.frombuffer(f.read(2), np.float16)[0])
        m, lbits = (int(v) for v in np.frombuffer(f.read(8), np.int32))
        shifts = np.frombuffer(f.read(12 * m), np.int32).reshape(m, 3)
        counts = np.frombuffer(f.read(8 * m), np.int64)
        base_len = int(np.frombuffer(f.read(4), np.int32)[0])
        base_coords = np.frombuffer(f.read(base_len * 12), np.int32).reshape(-1, 3)
        base_occ = np.frombuffer(f.read(base_len), np.uint8)
        if version == VERSION_DEVICE:
            n_levels = int(np.frombuffer(f.read(1), np.uint8)[0])
            lvl_counts = np.frombuffer(f.read(4 * (n_levels + 1)), np.int32)
        payload = f.read()

    t0 = time.time()
    if version == VERSION_DEVICE:
        cc, n_final = _decode_levels_device(base_coords, base_occ, payload,
                                            lvl_counts, params, config)
    elif version == VERSION_SIB:
        cc, n_final = _decode_levels_sib(base_coords, base_occ, payload,
                                         params, config)
    else:
        cc, n_final = _decode_levels(base_coords, base_occ, payload, params,
                                     config)
    cloud_id = cc[:, 2] >> lbits
    local = cc.astype(np.int64)
    local[:, 2] -= (cloud_id.astype(np.int64) << lbits)
    clouds = []
    for i in range(m):
        sel = local[cloud_id == i] + shifts[i].astype(np.int64)
        assert sel.shape[0] == counts[i], (
            f"cloud {i}: {sel.shape[0]} vs {counts[i]} points")
        clouds.append(sel.astype(np.float32) * posQ)
    dec_time = time.time() - t0
    return {"dec_time": dec_time, "num_points": n_final,
            "point_clouds": clouds}
