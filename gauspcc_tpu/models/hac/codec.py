"""HAC scene bitstream: estimate_final_bits + conduct_encoding/decoding.

Parity: HAC/scene/gaussian_model.py:1032-1087 (estimate), :1089-1222
(encode), :1224-1366 (decode). Anchor positions ride the GausPcgc
geometry codec; per-3000-anchor batches of feat/scaling/offsets are
arithmetic-coded under the hash-grid-conditioned Gaussian model; hash
tables and offset masks are binary-coded with a global p1.

Per-batch context evaluation is one jitted program (fixed batch capacity);
the host only moves quantized symbols in/out of the native coder.
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
from gauspcc_tpu.core import entropy
from gauspcc_tpu.core.quant import ste_multistep, ANCHOR_ROUND_DIGITS
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.ops import entropy_coding as ec
from gauspcc_tpu.ops import sparse

BIT2MB = 8 * 1024 * 1024
BATCH = 3000  # MAX_batch_size (gaussian_model.py:1124)


@partial(jax.jit, static_argnames=("cfg",))
def _batch_context(state, cfg: hac.HACConfig, anchor_batch):
    """Hash context + mlp_grid heads for one anchor batch [B, 3]."""
    feat_context = hac.calc_interp_feat(state, cfg, anchor_batch)
    return hac.grid_mlp_split(state, cfg, feat_context)


@partial(jax.jit, static_argnames=("cfg",))
def _estimate_bits(state, cfg: hac.HACConfig):
    """Analytic size estimate over all valid anchors (estimate_final_bits)."""
    mask_anchor = hac.get_mask_anchor(state)
    sel = mask_anchor[:, None].astype(jnp.float32)
    anchors = state["anchors"]
    anchor = hac.get_anchor(state, cfg)
    k = cfg.n_offsets

    ctx = hac.grid_mlp_split(state, cfg, hac.calc_interp_feat(state, cfg, anchor))
    feat = ste_multistep(anchors["anchor_feat"], ctx["q_feat"],
                         jnp.mean(anchors["anchor_feat"]))
    scaling = ste_multistep(hac.get_scaling(state), ctx["q_scaling"],
                            jnp.mean(hac.get_scaling(state)))
    offsets = ste_multistep(anchors["offset"], ctx["q_offsets"][:, None, :],
                            jnp.mean(anchors["offset"])).reshape(-1, 3 * k)
    m = hac.get_mask(state)
    mask3 = jnp.repeat(m, 3, axis=-1).reshape(-1, 3 * k)

    bit_feat = jnp.sum(entropy.gaussian_bits(
        feat, ctx["mean"], ctx["scale"], ctx["q_feat"]) * sel)
    bit_scaling = jnp.sum(entropy.gaussian_bits(
        scaling, ctx["mean_scaling"], ctx["scale_scaling"], ctx["q_scaling"]) * sel)
    bit_offsets = jnp.sum(entropy.gaussian_bits(
        offsets, ctx["mean_offsets"], ctx["scale_offsets"], ctx["q_offsets"])
        * mask3 * sel)

    flat = hac.encoding_params_flat(state)
    _, bit_hash = entropy.binary_size_bits((flat + 1.0) / 2.0)
    _, bit_masks = entropy.binary_size_bits(m * sel[:, :, None])
    n_anchor = jnp.sum(mask_anchor)
    return {
        "anchor": n_anchor * 3 * ANCHOR_ROUND_DIGITS,
        "feat": bit_feat,
        "scaling": bit_scaling,
        "offsets": bit_offsets,
        "hash": bit_hash,
        "masks": bit_masks,
    }


def estimate_final_bits(state, cfg: hac.HACConfig) -> tuple[dict, str]:
    bits = {k: float(v) for k, v in _estimate_bits(state, cfg).items()}
    bits["mlps"] = float(hac.mlp_size_bits(state))
    bits["total"] = sum(bits.values())
    log = "Estimated sizes in MB: " + ", ".join(
        f"{k} {v / BIT2MB:.4f}" for k, v in bits.items()
    )
    return bits, log


def _gather_sorted_attributes(state, cfg: hac.HACConfig):
    """Valid+masked anchors, voxel-rounded and morton(lex)-sorted (host)."""
    mask_anchor = np.asarray(hac.get_mask_anchor(state))
    anchors = {k: np.asarray(v) for k, v in state["anchors"].items()}
    idx = np.nonzero(mask_anchor)[0]

    anchor = np.asarray(hac.get_anchor(state, cfg))[idx]
    anchor_int = np.round(anchor / cfg.voxel_size).astype(np.int64)
    order = sparse.morton_order_np(anchor_int)
    return {
        "anchor_int": anchor_int[order],
        "feat": anchors["anchor_feat"][idx][order],
        "offset": anchors["offset"][idx][order],
        "scaling": np.asarray(hac.get_scaling(state))[idx][order],
        "mask": np.asarray(hac.get_mask(state))[idx][order],
    }


def conduct_encoding(state, cfg: hac.HACConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()) -> tuple[dict, str]:
    """Encode the scene to `out_dir` (one file per component + meta.json).

    Returns (sizes dict in bits, log string).
    """
    os.makedirs(out_dir, exist_ok=True)
    t1 = time.time()
    data = _gather_sorted_attributes(state, cfg)
    n = data["anchor_int"].shape[0]
    k = cfg.n_offsets

    out = pcc.compress_point_cloud(
        data["anchor_int"], pcc_params, os.path.join(out_dir, "xyz_pcc.bin"),
        config=pcc_cfg,
    )
    bits_xyz = out["file_size_bits"]

    anchor_sorted = data["anchor_int"].astype(np.float32) * cfg.voxel_size
    feat_mean = float(data["feat"].mean()) if n else 0.0
    scaling_mean = float(data["scaling"].mean()) if n else 0.0
    offsets_mean = float(data["offset"].mean()) if n else 0.0

    bit_feat = bit_scaling = bit_offsets = 0
    steps = (n + BATCH - 1) // BATCH
    for s in range(steps):
        lo, hi = s * BATCH, min((s + 1) * BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        ctx = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_context(state, cfg, jnp.asarray(batch_anchor)),
        )

        feat = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), jnp.asarray(ctx["q_feat"]),
            jnp.float32(feat_mean))).reshape(-1)
        q_feat = np.broadcast_to(ctx["q_feat"], (b, cfg.feat_dim)).reshape(-1)
        bit_feat += ec.encode_gaussian(
            feat, ctx["mean"].reshape(-1), ctx["scale"].reshape(-1),
            jnp.asarray(q_feat), os.path.join(out_dir, f"feat_{s}.b"))

        scal = np.asarray(ste_multistep(
            jnp.asarray(data["scaling"][lo:hi]), jnp.asarray(ctx["q_scaling"]),
            jnp.float32(scaling_mean))).reshape(-1)
        q_s = np.broadcast_to(ctx["q_scaling"], (b, 6)).reshape(-1)
        bit_scaling += ec.encode_gaussian(
            scal, ctx["mean_scaling"].reshape(-1), ctx["scale_scaling"].reshape(-1),
            jnp.asarray(q_s), os.path.join(out_dir, f"scaling_{s}.b"))

        offs = np.asarray(ste_multistep(
            jnp.asarray(data["offset"][lo:hi]),
            jnp.asarray(ctx["q_offsets"][:, None, :]),
            jnp.float32(offsets_mean))).reshape(-1)
        q_o = np.broadcast_to(ctx["q_offsets"], (b, 3 * k)).reshape(-1)
        msk = np.repeat(data["mask"][lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        bit_offsets += ec.encode_gaussian(
            offs[msk], ctx["mean_offsets"].reshape(-1)[msk],
            ctx["scale_offsets"].reshape(-1)[msk], jnp.asarray(q_o[msk]),
            os.path.join(out_dir, f"offsets_{s}.b"))

    flat = np.asarray(hac.encoding_params_flat(state))
    bit_hash = ec.encode_binary((flat.reshape(-1) + 1.0) / 2.0,
                                os.path.join(out_dir, "hash.b"))
    bit_masks = ec.encode_binary(data["mask"].reshape(-1),
                                 os.path.join(out_dir, "masks.b"))

    meta = {
        "n_anchors": int(n), "batch": BATCH,
        "feat_mean": feat_mean, "scaling_mean": scaling_mean,
        "offsets_mean": offsets_mean,
    }
    json.dump(meta, open(os.path.join(out_dir, "meta.json"), "w"))

    enc_time = time.time() - t1
    sizes = {
        "anchor": bits_xyz, "feat": bit_feat, "scaling": bit_scaling,
        "offsets": bit_offsets, "hash": bit_hash, "masks": bit_masks,
        "mlps": hac.mlp_size_bits(state),
    }
    sizes["total"] = sum(sizes.values())
    log = "Encoded sizes in MB: " + ", ".join(
        f"{k_} {v / BIT2MB:.4f}" for k_, v in sizes.items()
    ) + f", EncTime {enc_time:.4f}"
    return sizes, log


def conduct_decoding(state, cfg: hac.HACConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    """Decode the scene from `out_dir` into a decoded-version state.

    The context regenerates identically from decoded anchors + decoded
    hash tables, so attribute CDFs match the encoder bit-for-bit.
    Returns (decoded_state, log).
    """
    t1 = time.time()
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    n = meta["n_anchors"]
    k = cfg.n_offsets

    # hash tables first (context source), then masks, then anchors
    spec = cfg.grid_spec
    n_hash = spec.xyz.n_rows * spec.xyz.n_features + 3 * (
        spec.plane.n_rows * spec.plane.n_features
    )
    flat01 = np.asarray(ec.decode_binary(n_hash, os.path.join(out_dir, "hash.b")))
    flat = (flat01 * 2.0 - 1.0).astype(np.float32).reshape(
        -1, cfg.n_features_per_level
    )
    from gauspcc_tpu.fields import hashgrid

    tables = hashgrid.unflatten_tables(spec, jnp.asarray(flat))

    masks01 = np.asarray(
        ec.decode_binary(n * k, os.path.join(out_dir, "masks.b"))
    ).reshape(n, k, 1)

    dec = pcc.decompress_point_cloud(
        os.path.join(out_dir, "xyz_pcc.bin"), pcc_params, config=pcc_cfg
    )
    anchor_int = dec["point_cloud"].astype(np.int64)
    order = sparse.morton_order_np(anchor_int)
    anchor_int = anchor_int[order]
    assert anchor_int.shape[0] == n, (anchor_int.shape[0], n)
    anchor_sorted = anchor_int.astype(np.float32) * cfg.voxel_size

    # decoded state skeleton: swap in decoded tensors (decoded_version=True)
    cap = hac.bucket_capacity(n)
    dec_state = {
        "anchors": {
            "anchor": _pad(anchor_sorted, (cap, 3)),
            "offset": jnp.zeros((cap, k, 3), jnp.float32),
            "mask": _pad(masks01, (cap, k, 1)),
            "anchor_feat": jnp.zeros((cap, cfg.feat_dim), jnp.float32),
            "scaling": jnp.zeros((cap, 6), jnp.float32),
            "rotation": _pad(np.tile([1.0, 0, 0, 0], (n, 1)), (cap, 4)),
            "opacity": jnp.zeros((cap, 1), jnp.float32),
        },
        "valid": jnp.asarray(np.arange(cap) < n),
        "nets": {**state["nets"], "tables": tables},
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
        ctx = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_context(dec_state, cfg, jnp.asarray(batch_anchor)),
        )
        q_feat = np.broadcast_to(ctx["q_feat"], (b, cfg.feat_dim)).reshape(-1)
        feat = ec.decode_gaussian(
            ctx["mean"].reshape(-1), ctx["scale"].reshape(-1),
            jnp.asarray(q_feat), os.path.join(out_dir, f"feat_{s}.b"))
        feat_list.append(np.asarray(feat).reshape(b, cfg.feat_dim))

        q_s = np.broadcast_to(ctx["q_scaling"], (b, 6)).reshape(-1)
        scal = ec.decode_gaussian(
            ctx["mean_scaling"].reshape(-1), ctx["scale_scaling"].reshape(-1),
            jnp.asarray(q_s), os.path.join(out_dir, f"scaling_{s}.b"))
        scaling_list.append(np.asarray(scal).reshape(b, 6))

        q_o = np.broadcast_to(ctx["q_offsets"], (b, 3 * k)).reshape(-1)
        msk = np.repeat(masks01[lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        dec_off = np.zeros(b * 3 * k, np.float32)
        if msk.any():
            vals = ec.decode_gaussian(
                ctx["mean_offsets"].reshape(-1)[msk],
                ctx["scale_offsets"].reshape(-1)[msk],
                jnp.asarray(q_o[msk]), os.path.join(out_dir, f"offsets_{s}.b"))
            dec_off[msk] = np.asarray(vals)
        offsets_list.append(dec_off.reshape(b, k, 3))

    a = dec_state["anchors"]
    a["anchor_feat"] = _pad(np.concatenate(feat_list), (cap, cfg.feat_dim))
    a["scaling"] = _pad(np.concatenate(scaling_list), (cap, 6))
    a["offset"] = _pad(np.concatenate(offsets_list), (cap, k, 3))

    log = f"DecTime {time.time() - t1:.4f}"
    return dec_state, log


def _pad(x: np.ndarray, shape) -> jax.Array:
    out = np.zeros(shape, np.float32)
    out[: x.shape[0]] = x
    return jnp.asarray(out)
