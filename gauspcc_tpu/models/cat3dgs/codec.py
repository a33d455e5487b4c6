"""CAT-3DGS scene bitstream: ARM-coded triplane latents + chcm attributes.

Parity: CAT-3DGS scene/gaussian_model.py:1140-1731 — anchors via GausPcgc;
triplane latents STE-quantized and range-coded in wavefront order per
(scale, plane-group, channel) under the ARM Laplace model
(encode_triplane/decode_triplane, bitstream/encode.py/decode.py); feature
slices coded sequentially, slice 0 under the triplane hyperprior and
slice i>=1 under mlp_chcm conditioned on decoded slices; scaling/offsets/
masks as in HAC.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.codecs.gauspcgc import codec as pcc
from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.core.quant import ste_multistep
from gauspcc_tpu.models.cat3dgs import arm
from gauspcc_tpu.models.cat3dgs import field as cat_field
from gauspcc_tpu.models.cat3dgs import model as cat
from gauspcc_tpu.models.hac import codec as hac_codec
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.ops import entropy_coding as ec

BATCH = 500  # MAX_batch_size (CAT gaussian_model.py:1178)
BIT2MB = hac_codec.BIT2MB
_GROUPS = ("xy", "xz", "yz")


@partial(jax.jit, static_argnames=("cfg",))
def _batch_hyper(state, cfg: cat.CATConfig, anchor_batch, planes_q):
    return cat.hyper_split(state, cfg, anchor_batch, planes_q)


@partial(jax.jit, static_argnames=("cfg", "i"))
def _batch_chcm(state, cfg: cat.CATConfig, feat_partial, i):
    return cat.chcm_slice_stats(state, cfg, feat_partial, i)


@partial(jax.jit, static_argnames=("cfg",))
def _chcm_adjust(state, cfg: cat.CATConfig, hyper, feat_q):
    return cat.chcm_adjust(state, cfg, hyper, feat_q)


def encode_triplanes(state, cfg: cat.CATConfig, out_dir: str) -> int:
    """STE-quantize all plane latents and ARM-wavefront-encode them with
    the INTEGER ARM (arm.quantize_arm): the quantized weights ship in
    arm_q.bin so decode is backend-independent (the reference instead
    forces torch-deterministic algorithms, decode.py:307-310, which does
    not survive a backend change). Returns total bits incl. the weights."""
    f = state["nets"]["field"]
    planes_q = [np.asarray(p) for p in
                cat_field.quantized_planes(f, cfg.field)]
    qarms = {g: arm.quantize_arm(f["arms"][g]) for g in _GROUPS}
    blob = b"".join(arm.pack_arm(qarms[g]) for g in _GROUPS)
    open(os.path.join(out_dir, "arm_q.bin"), "wb").write(blob)
    bits = len(blob) * 8
    for si, planes in enumerate(planes_q):
        for p, g in enumerate(_GROUPS):
            for c in range(planes.shape[1]):
                stream = arm.encode_plane_fixed(qarms[g], planes[p, c])
                path = os.path.join(out_dir, f"tri_{si}_{g}_{c}.b")
                open(path, "wb").write(stream)
                bits += len(stream) * 8
    return bits


def decode_triplanes(state, cfg: cat.CATConfig, out_dir: str) -> list:
    """Decode latents using only the shipped integer ARM weights."""
    blob = open(os.path.join(out_dir, "arm_q.bin"), "rb").read()
    qarms, off = {}, 0
    for g in _GROUPS:
        qarms[g], used = arm.unpack_arm(blob, off)
        off += used
    planes_q = []
    for si, r in enumerate(cfg.field.resolutions()):
        scale_planes = np.zeros((3, cfg.tri_feat, r, r), np.float32)
        for p, g in enumerate(_GROUPS):
            for c in range(cfg.tri_feat):
                stream = open(
                    os.path.join(out_dir, f"tri_{si}_{g}_{c}.b"), "rb"
                ).read()
                scale_planes[p, c] = arm.decode_plane_fixed(qarms[g], stream)
        planes_q.append(jnp.asarray(scale_planes))
    return planes_q


def conduct_encoding(state, cfg: cat.CATConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    os.makedirs(out_dir, exist_ok=True)
    base = cfg.as_hac()
    t1 = time.time()
    data = hac_codec._gather_sorted_attributes(state, base)
    n = data["anchor_int"].shape[0]
    k = cfg.n_offsets

    out = pcc.compress_point_cloud(
        data["anchor_int"], pcc_params, os.path.join(out_dir, "xyz_pcc.bin"),
        config=pcc_cfg)
    bits_xyz = out["file_size_bits"]

    bits_triplane = encode_triplanes(state, cfg, out_dir)
    planes_q = [jnp.asarray(p) for p in
                cat_field.quantized_planes(state["nets"]["field"], cfg.field)]

    anchor_sorted = data["anchor_int"].astype(np.float32) * cfg.voxel_size
    means = {kk: float(data[kk].mean()) if n else 0.0
             for kk in ("feat", "scaling", "offset")}
    bounds = np.cumsum([0] + list(cfg.chcm_slices))

    bit_feat = bit_scaling = bit_offsets = 0
    steps = (n + BATCH - 1) // BATCH
    for s in range(steps):
        lo, hi = s * BATCH, min((s + 1) * BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        hyper = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_hyper(state, cfg, jnp.asarray(batch_anchor), planes_q))

        feat_q = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), jnp.asarray(hyper["q_feat"]),
            jnp.float32(means["feat"])))
        q_full = np.broadcast_to(hyper["q_feat"], (b, cfg.feat_dim))
        for i in range(len(cfg.chcm_slices)):
            sl = slice(bounds[i], bounds[i + 1])
            if i == 0:
                m, sc = hyper["mean0"], hyper["scale0"]
            else:
                m, sc = jax.tree_util.tree_map(
                    np.asarray,
                    _batch_chcm(state, cfg, jnp.asarray(feat_q), i))
            bit_feat += ec.encode_gaussian(
                feat_q[:, sl].reshape(-1), m.reshape(-1),
                np.maximum(sc.reshape(-1), 1e-9),
                jnp.asarray(q_full[:, sl].reshape(-1)),
                os.path.join(out_dir, f"feat_{s}_{i}.b"))

        hyper = jax.tree_util.tree_map(
            np.asarray,
            _chcm_adjust(state, cfg, jax.tree_util.tree_map(jnp.asarray, hyper),
                         jnp.asarray(feat_q)))
        scal = np.asarray(ste_multistep(
            jnp.asarray(data["scaling"][lo:hi]), jnp.asarray(hyper["q_scaling"]),
            jnp.float32(means["scaling"]))).reshape(-1)
        q_s = np.broadcast_to(hyper["q_scaling"], (b, 6)).reshape(-1)
        bit_scaling += ec.encode_gaussian(
            scal, hyper["mean_scaling"].reshape(-1),
            hyper["scale_scaling"].reshape(-1), jnp.asarray(q_s),
            os.path.join(out_dir, f"scaling_{s}.b"))

        offs = np.asarray(ste_multistep(
            jnp.asarray(data["offset"][lo:hi]),
            jnp.asarray(hyper["q_offsets"][:, None, :]),
            jnp.float32(means["offset"]))).reshape(-1)
        q_o = np.broadcast_to(hyper["q_offsets"], (b, 3 * k)).reshape(-1)
        msk = np.repeat(data["mask"][lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        bit_offsets += ec.encode_gaussian(
            offs[msk], hyper["mean_offsets"].reshape(-1)[msk],
            hyper["scale_offsets"].reshape(-1)[msk], jnp.asarray(q_o[msk]),
            os.path.join(out_dir, f"offsets_{s}.b"))

    bit_masks = ec.encode_binary(data["mask"].reshape(-1),
                                 os.path.join(out_dir, "masks.b"))
    json.dump({"n_anchors": int(n), "batch": BATCH,
               **{f"{kk}_mean": v for kk, v in means.items()}},
              open(os.path.join(out_dir, "meta.json"), "w"))

    sizes = {
        "anchor": bits_xyz, "feat": bit_feat, "scaling": bit_scaling,
        "offsets": bit_offsets, "triplane": bits_triplane,
        "masks": bit_masks, "mlps": hac.mlp_size_bits(state),
    }
    sizes["total"] = sum(sizes.values())
    log = "Encoded sizes in MB: " + ", ".join(
        f"{k_} {v / BIT2MB:.4f}" for k_, v in sizes.items()
    ) + f", EncTime {time.time() - t1:.4f}"
    return sizes, log


def conduct_decoding(state, cfg: cat.CATConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    base = cfg.as_hac()
    t1 = time.time()
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    n = meta["n_anchors"]
    k = cfg.n_offsets
    bounds = np.cumsum([0] + list(cfg.chcm_slices))

    planes_q = decode_triplanes(state, cfg, out_dir)
    masks01 = np.asarray(
        ec.decode_binary(n * k, os.path.join(out_dir, "masks.b"))
    ).reshape(n, k, 1)

    dec = pcc.decompress_point_cloud(
        os.path.join(out_dir, "xyz_pcc.bin"), pcc_params, config=pcc_cfg)
    from gauspcc_tpu.ops import sparse

    anchor_int = dec["point_cloud"].astype(np.int64)
    anchor_int = anchor_int[sparse.morton_order_np(anchor_int)]
    assert anchor_int.shape[0] == n
    anchor_sorted = anchor_int.astype(np.float32) * cfg.voxel_size

    cap = hac.bucket_capacity(n)
    dec_state = {
        "anchors": {
            "anchor": hac_codec._pad(anchor_sorted, (cap, 3)),
            "offset": jnp.zeros((cap, k, 3), jnp.float32),
            "mask": hac_codec._pad(masks01, (cap, k, 1)),
            "anchor_feat": jnp.zeros((cap, cfg.feat_dim), jnp.float32),
            "scaling": jnp.zeros((cap, 6), jnp.float32),
            "rotation": hac_codec._pad(np.tile([1.0, 0, 0, 0], (n, 1)), (cap, 4)),
            "opacity": jnp.zeros((cap, 1), jnp.float32),
        },
        "valid": jnp.asarray(np.arange(cap) < n),
        "nets": dict(state["nets"]),
        "x_bound_min": state["x_bound_min"],
        "x_bound_max": state["x_bound_max"],
    }

    feat_list, scaling_list, offsets_list = [], [], []
    steps = (n + BATCH - 1) // BATCH
    for s in range(steps):
        lo, hi = s * BATCH, min((s + 1) * BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        hyper = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_hyper(dec_state, cfg, jnp.asarray(batch_anchor), planes_q))

        q_full = np.broadcast_to(hyper["q_feat"], (b, cfg.feat_dim))
        feat_dec = np.zeros((b, cfg.feat_dim), np.float32)
        for i in range(len(cfg.chcm_slices)):
            sl = slice(bounds[i], bounds[i + 1])
            if i == 0:
                m, sc = hyper["mean0"], hyper["scale0"]
            else:
                m, sc = jax.tree_util.tree_map(
                    np.asarray,
                    _batch_chcm(dec_state, cfg, jnp.asarray(feat_dec), i))
            vals = ec.decode_gaussian(
                m.reshape(-1), np.maximum(sc.reshape(-1), 1e-9),
                jnp.asarray(q_full[:, sl].reshape(-1)),
                os.path.join(out_dir, f"feat_{s}_{i}.b"))
            feat_dec[:, sl] = np.asarray(vals).reshape(b, bounds[i + 1] - bounds[i])
        feat_list.append(feat_dec)

        hyper = jax.tree_util.tree_map(
            np.asarray,
            _chcm_adjust(dec_state, cfg,
                         jax.tree_util.tree_map(jnp.asarray, hyper),
                         jnp.asarray(feat_dec)))
        q_s = np.broadcast_to(hyper["q_scaling"], (b, 6)).reshape(-1)
        scal = ec.decode_gaussian(
            hyper["mean_scaling"].reshape(-1),
            hyper["scale_scaling"].reshape(-1), jnp.asarray(q_s),
            os.path.join(out_dir, f"scaling_{s}.b"))
        scaling_list.append(np.asarray(scal).reshape(b, 6))

        q_o = np.broadcast_to(hyper["q_offsets"], (b, 3 * k)).reshape(-1)
        msk = np.repeat(masks01[lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        dec_off = np.zeros(b * 3 * k, np.float32)
        if msk.any():
            vals = ec.decode_gaussian(
                hyper["mean_offsets"].reshape(-1)[msk],
                hyper["scale_offsets"].reshape(-1)[msk],
                jnp.asarray(q_o[msk]), os.path.join(out_dir, f"offsets_{s}.b"))
            dec_off[msk] = np.asarray(vals)
        offsets_list.append(dec_off.reshape(b, k, 3))

    a = dec_state["anchors"]
    a["anchor_feat"] = hac_codec._pad(np.concatenate(feat_list), (cap, cfg.feat_dim))
    a["scaling"] = hac_codec._pad(np.concatenate(scaling_list), (cap, 6))
    a["offset"] = hac_codec._pad(np.concatenate(offsets_list), (cap, k, 3))
    return dec_state, f"DecTime {time.time() - t1:.4f}"
