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

Execution model (SURVEY.md §3.2/§7): all probability evaluation is
batched XLA on device; the host only runs the serial bit coder. Encode
needs 1 device dispatch per level (all 4 stages teacher-forced at once);
decode needs 4 per level (stage k's decoded bits condition stage k+1),
the same round-trip structure as the reference but with static-shape
jitted level programs cached per capacity bucket.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import bitstream, cdf as cdf_lib
from gauspcc_tpu.ops import coder, sparse
from gauspcc_tpu.codecs.gauspcgc import model as net

MAGIC = 0x47504354  # 'GPCT'
VERSION = 1
MIN_BASE_POINTS = 64


def _bucket(n: int, minimum: int = 256) -> int:
    """Next power-of-two capacity (bounds jit recompiles per level size)."""
    b = minimum
    while b < n:
        b *= 2
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
def _encode_level(params, config, pc, po, pm, gt_occ, parent_nmap=None):
    """One level, teacher-forced: returns normalized CDF tables and symbols
    for all four stages plus the child validity mask. gt_occ's (static)
    length sets the child capacity. parent_nmap: reuse of the previous
    level's child neighbor map (same coords)."""
    ctx = net.level_context(params, config, pc, po, pm,
                            child_cap=gt_occ.shape[0],
                            parent_nmap=parent_nmap)
    s_gt = net.split_occupancy(gt_occ)
    out = {"mask": ctx["child_mask"]}
    prev = jnp.zeros_like(gt_occ, dtype=jnp.int32)
    for stage in range(4):
        probs = net.stage_probs(params, stage, ctx["feats"], ctx["nmap"], prev)
        out[f"cdf{stage}"] = cdf_lib.probs_to_cdf_int16(probs)
        out[f"sym{stage}"] = s_gt[stage].astype(jnp.int16)
        if stage == 0:
            prev = s_gt[0]
        elif stage == 1:
            prev = prev * 2 + s_gt[1]
        elif stage == 2:
            prev = prev * 4 + s_gt[2]
    out["nmap"] = ctx["nmap"]
    return out


@partial(jax.jit, static_argnames=("config", "child_cap"))
def _decode_context(params, config, pc, po, pm, child_cap, parent_nmap=None):
    return net.level_context(params, config, pc, po, pm, child_cap=child_cap,
                             parent_nmap=parent_nmap)


@partial(jax.jit, static_argnames=("stage",))
def _decode_stage_cdf(params, stage, feats, nmap, prev):
    probs = net.stage_probs(params, stage, feats, nmap, prev)
    return cdf_lib.probs_to_cdf_int16(probs)


def compress_point_cloud(
    xyz_quantized,
    params,
    output_path: str,
    posQ: float = 1.0,
    config: net.NetConfig = net.NetConfig(),
) -> dict:
    """Compress integer coords [N, 3] to `output_path`.

    Returns {bpp, enc_time, file_size_bits, num_points, output_path},
    the same result surface as the reference API (pcc_utils.py:205-217).
    """
    xyz = np.asarray(xyz_quantized)
    if posQ != 1.0:
        xyz = np.round(xyz / posQ)
    xyz = xyz.astype(np.int64)
    n_points = xyz.shape[0]

    t0 = time.time()
    shift = xyz.min(axis=0)
    xyz0 = np.unique(xyz - shift, axis=0).astype(np.int32)

    levels = sparse.build_occupancy_pyramid(xyz0, min_points=MIN_BASE_POINTS)

    streams: list[bytes] = []
    prev_nmap = None
    prev_child_cap = None
    for depth in range(len(levels)):
        p_coords, p_occ = levels[depth]
        if depth + 1 < len(levels):
            gt_coords, gt_occ = levels[depth + 1]
        else:
            # finest level: children ARE the input voxels; their occupancy is
            # not coded (they are leaves), so the last coded level's gt is the
            # occupancy stored one level up. Handled by the loop structure:
            break
        pc, po, pm = _pad_parents(p_coords, p_occ)
        child_cap = min(_bucket(gt_occ.shape[0]), pc.shape[0] * 8)
        gt_pad = np.zeros(child_cap, np.int32)
        gt_pad[: gt_occ.shape[0]] = gt_occ
        reuse = prev_nmap if prev_child_cap == pc.shape[0] else None
        out = _encode_level(params, config, pc, po, pm, jnp.asarray(gt_pad),
                            parent_nmap=reuse)
        prev_nmap = out["nmap"]
        prev_child_cap = child_cap

        n_valid = int(gt_occ.shape[0])
        mask = np.asarray(out["mask"])
        assert int(mask.sum()) == n_valid, (
            f"child count mismatch at depth {depth}: {int(mask.sum())} vs {n_valid}"
        )
        for stage in range(4):
            table = np.asarray(out[f"cdf{stage}"])[:n_valid]
            syms = np.asarray(out[f"sym{stage}"])[:n_valid]
            streams.append(coder.encode_int16_cdf(table, syms))

    # the last pyramid entry codes the input voxels via its occupancy: the
    # loop above already encoded every level's children including the input
    # (levels[-1] children == xyz0), because levels[-1] is the finest parent
    # set. Nothing further to code.
    base_coords, base_occ = levels[0]

    payload = bitstream.pack_byte_streams(streams)
    with open(output_path, "wb") as f:
        f.write(np.uint32(MAGIC).tobytes())
        f.write(np.uint8(VERSION).tobytes())
        f.write(np.float16(posQ).tobytes())
        f.write(shift.astype(np.int32).tobytes())
        f.write(np.int32(base_coords.shape[0]).tobytes())
        f.write(base_coords.astype(np.int32).tobytes())
        f.write(base_occ.astype(np.uint8).tobytes())
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
) -> dict:
    """Decode a .bin produced by compress_point_cloud.

    Returns {dec_time, num_points, point_cloud (np.ndarray float32 [N,3])},
    parity with pcc_utils.py:395-400.
    """
    with open(bin_file_path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.uint32)[0]
        assert magic == MAGIC, "not a GPCT bitstream"
        _version = np.frombuffer(f.read(1), np.uint8)[0]
        posQ = float(np.frombuffer(f.read(2), np.float16)[0])
        shift = np.frombuffer(f.read(12), np.int32).astype(np.int64)
        base_len = int(np.frombuffer(f.read(4), np.int32)[0])
        base_coords = np.frombuffer(f.read(base_len * 12), np.int32).reshape(-1, 3)
        base_occ = np.frombuffer(f.read(base_len), np.uint8)
        payload = f.read()

    t0 = time.time()
    streams = bitstream.unpack_byte_streams(payload)
    n_levels = len(streams) // 4

    p_coords = base_coords.astype(np.int32)
    p_occ = base_occ.astype(np.int32)
    prev_nmap = None
    prev_child_cap = None
    for depth in range(n_levels):
        pc, po, pm = _pad_parents(p_coords, p_occ)
        # number of children = total occupancy popcount (known pre-decode)
        n_valid = int(np.unpackbits(
            p_occ.astype(np.uint8)[:, None], axis=1).sum())
        child_cap = min(_bucket(n_valid), pc.shape[0] * 8)
        reuse = prev_nmap if prev_child_cap == pc.shape[0] else None
        ctx = _decode_context(params, config, pc, po, pm, child_cap,
                              parent_nmap=reuse)
        prev_nmap = ctx["nmap"]
        prev_child_cap = child_cap
        # valid children are the first n_valid rows (lex_sort pads last)
        feats, nmap = ctx["feats"], ctx["nmap"]

        prev_np = np.zeros(child_cap, np.int32)
        decoded = []
        for stage in range(4):
            table = np.asarray(
                _decode_stage_cdf(params, stage, feats, nmap, jnp.asarray(prev_np))
            )[:n_valid]
            syms = coder.decode_int16_cdf(table, streams[depth * 4 + stage])
            decoded.append(syms.astype(np.int32))
            full = np.zeros(child_cap, np.int32)
            full[:n_valid] = syms
            if stage == 0:
                prev_np = full
            elif stage == 1:
                prev_np = prev_np * 2 + full
            elif stage == 2:
                prev_np = prev_np * 4 + full

        child_occ = net.merge_occupancy(*decoded)
        child_coords = np.asarray(ctx["child_coords"])[:n_valid]
        p_coords = child_coords.astype(np.int32)
        p_occ = np.asarray(child_occ, np.int32)

    # final expansion: leaves of the finest decoded level
    pc, po, pm = _pad_parents(p_coords, p_occ)
    child, child_mask, _, _ = sparse.fcg_expand(
        jnp.asarray(pc), jnp.asarray(po), jnp.asarray(pm)
    )
    perm = sparse.lex_sort(child, child_mask)
    n_final = int(np.asarray(child_mask).sum())
    pts = np.asarray(child[perm])[:n_final].astype(np.int64) + shift
    pts = pts.astype(np.float32) * posQ
    dec_time = time.time() - t0

    return {"dec_time": dec_time, "num_points": pts.shape[0], "point_cloud": pts}
