"""HAC++ scene bitstream: channel-AR mixture coding of features.

Parity: HAC-plus/scene/gaussian_model.py:1280-1330 (encode: per batch,
5 sequential chunk streams, each coded under the softmaxed
(hyperprior, channel-AR) 2-component Gaussian mixture) and :1470-1512
(decode: decoded chunks feed the next chunk's AR MLP). Scaling/offsets/
hash/masks follow the base-HAC path.
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
from gauspcc_tpu.models.hac import codec as hac_codec
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac_plus import model as hacp
from gauspcc_tpu.ops import entropy_coding as ec

BATCH = hac_codec.BATCH
BIT2MB = hac_codec.BIT2MB


@partial(jax.jit, static_argnames=("cfg",))
def _batch_context(state, cfg: hacp.HACPlusConfig, anchor_batch):
    feat_context = hac.calc_interp_feat(state, cfg.as_hac(), anchor_batch)
    return hacp.grid_mlp_split(state, cfg, feat_context)


@partial(jax.jit, static_argnames=("cfg", "to_dec"))
def _chunk_mixture(state, cfg: hacp.HACPlusConfig, ctx, feat_partial, to_dec):
    return hacp.mixture_components(
        ctx, state["nets"]["channel_ctx"], cfg, feat_partial, to_dec
    )


def conduct_encoding(state, cfg: hacp.HACPlusConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    os.makedirs(out_dir, exist_ok=True)
    base = cfg.as_hac()
    t1 = time.time()
    data = hac_codec._gather_sorted_attributes(state, base)
    n = data["anchor_int"].shape[0]
    k = cfg.n_offsets
    c = cfg.chunk

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
        ctx_full = _batch_context(state, cfg, jnp.asarray(batch_anchor))
        ctx = jax.tree_util.tree_map(lambda x: x[:b], ctx_full)

        feat_q = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), ctx["q_feat"],
            jnp.float32(feat_mean)))
        # 5 sequential chunk streams, AR-conditioned on decoded chunks
        for cc in range(hacp.N_CHUNKS):
            means, scales, probs = jax.tree_util.tree_map(
                np.asarray,
                _chunk_mixture(state, cfg, ctx, jnp.asarray(feat_q), cc),
            )
            q_c = np.broadcast_to(np.asarray(ctx["q_feat"]), (b, cfg.feat_dim))[
                :, cc * c:(cc + 1) * c].reshape(-1)
            bit_feat += ec.encode_gaussian_mixed(
                feat_q[:, cc * c:(cc + 1) * c].reshape(-1),
                [m.reshape(-1) for m in means],
                [np.maximum(sc.reshape(-1), 1e-9) for sc in scales],
                [p.reshape(-1) for p in probs],
                jnp.asarray(q_c),
                os.path.join(out_dir, f"feat_{s}_{cc}.b"))

        scal = np.asarray(ste_multistep(
            jnp.asarray(data["scaling"][lo:hi]), ctx["q_scaling"],
            jnp.float32(scaling_mean))).reshape(-1)
        q_s = np.broadcast_to(np.asarray(ctx["q_scaling"]), (b, 6)).reshape(-1)
        bit_scaling += ec.encode_gaussian(
            scal, np.asarray(ctx["mean_scaling"]).reshape(-1),
            np.asarray(ctx["scale_scaling"]).reshape(-1), jnp.asarray(q_s),
            os.path.join(out_dir, f"scaling_{s}.b"))

        offs = np.asarray(ste_multistep(
            jnp.asarray(data["offset"][lo:hi]), ctx["q_offsets"][:, None, :],
            jnp.float32(offsets_mean))).reshape(-1)
        q_o = np.broadcast_to(np.asarray(ctx["q_offsets"]), (b, 3 * k)).reshape(-1)
        msk = np.repeat(data["mask"][lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        bit_offsets += ec.encode_gaussian(
            offs[msk], np.asarray(ctx["mean_offsets"]).reshape(-1)[msk],
            np.asarray(ctx["scale_offsets"]).reshape(-1)[msk],
            jnp.asarray(q_o[msk]), os.path.join(out_dir, f"offsets_{s}.b"))

    flat = np.asarray(hac.encoding_params_flat(state))
    bit_hash = ec.encode_binary((flat.reshape(-1) + 1.0) / 2.0,
                                os.path.join(out_dir, "hash.b"))
    bit_masks = ec.encode_binary(data["mask"].reshape(-1),
                                 os.path.join(out_dir, "masks.b"))
    json.dump({"n_anchors": int(n), "batch": BATCH, "feat_mean": feat_mean,
               "scaling_mean": scaling_mean, "offsets_mean": offsets_mean},
              open(os.path.join(out_dir, "meta.json"), "w"))

    sizes = {
        "anchor": bits_xyz, "feat": bit_feat, "scaling": bit_scaling,
        "offsets": bit_offsets, "hash": bit_hash, "masks": bit_masks,
        "mlps": hac.mlp_size_bits(state),
    }
    sizes["total"] = sum(sizes.values())
    log = "Encoded sizes in MB: " + ", ".join(
        f"{k_} {v / BIT2MB:.4f}" for k_, v in sizes.items()
    ) + f", EncTime {time.time() - t1:.4f}"
    return sizes, log


def conduct_decoding(state, cfg: hacp.HACPlusConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    base = cfg.as_hac()
    t1 = time.time()
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    n = meta["n_anchors"]
    k = cfg.n_offsets
    c = cfg.chunk

    spec = cfg.grid_spec
    n_hash = spec.xyz.n_rows * spec.xyz.n_features + 3 * (
        spec.plane.n_rows * spec.plane.n_features
    )
    flat01 = np.asarray(ec.decode_binary(n_hash, os.path.join(out_dir, "hash.b")))
    from gauspcc_tpu.fields import hashgrid

    tables = hashgrid.unflatten_tables(
        spec, jnp.asarray((flat01 * 2.0 - 1.0).astype(np.float32).reshape(
            -1, cfg.n_features_per_level))
    )
    masks01 = np.asarray(
        ec.decode_binary(n * k, os.path.join(out_dir, "masks.b"))
    ).reshape(n, k, 1)

    dec = pcc.decompress_point_cloud(
        os.path.join(out_dir, "xyz_pcc.bin"), pcc_params, config=pcc_cfg
    )
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
        ctx_full = _batch_context(dec_state, cfg, jnp.asarray(batch_anchor))
        ctx = jax.tree_util.tree_map(lambda x: x[:b], ctx_full)

        feat_dec = np.zeros((b, cfg.feat_dim), np.float32)
        for cc in range(hacp.N_CHUNKS):
            means, scales, probs = jax.tree_util.tree_map(
                np.asarray,
                _chunk_mixture(dec_state, cfg, ctx, jnp.asarray(feat_dec), cc),
            )
            q_c = np.broadcast_to(np.asarray(ctx["q_feat"]), (b, cfg.feat_dim))[
                :, cc * c:(cc + 1) * c].reshape(-1)
            vals = ec.decode_gaussian_mixed(
                [m.reshape(-1) for m in means],
                [np.maximum(sc.reshape(-1), 1e-9) for sc in scales],
                [p.reshape(-1) for p in probs],
                jnp.asarray(q_c), os.path.join(out_dir, f"feat_{s}_{cc}.b"))
            feat_dec[:, cc * c:(cc + 1) * c] = np.asarray(vals).reshape(b, c)
        feat_list.append(feat_dec)

        q_s = np.broadcast_to(np.asarray(ctx["q_scaling"]), (b, 6)).reshape(-1)
        scal = ec.decode_gaussian(
            np.asarray(ctx["mean_scaling"]).reshape(-1),
            np.asarray(ctx["scale_scaling"]).reshape(-1),
            jnp.asarray(q_s), os.path.join(out_dir, f"scaling_{s}.b"))
        scaling_list.append(np.asarray(scal).reshape(b, 6))

        q_o = np.broadcast_to(np.asarray(ctx["q_offsets"]), (b, 3 * k)).reshape(-1)
        msk = np.repeat(masks01[lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        dec_off = np.zeros(b * 3 * k, np.float32)
        if msk.any():
            vals = ec.decode_gaussian(
                np.asarray(ctx["mean_offsets"]).reshape(-1)[msk],
                np.asarray(ctx["scale_offsets"]).reshape(-1)[msk],
                jnp.asarray(q_o[msk]), os.path.join(out_dir, f"offsets_{s}.b"))
            dec_off[msk] = np.asarray(vals)
        offsets_list.append(dec_off.reshape(b, k, 3))

    a = dec_state["anchors"]
    a["anchor_feat"] = hac_codec._pad(np.concatenate(feat_list), (cap, cfg.feat_dim))
    a["scaling"] = hac_codec._pad(np.concatenate(scaling_list), (cap, 6))
    a["offset"] = hac_codec._pad(np.concatenate(offsets_list), (cap, k, 3))
    return dec_state, f"DecTime {time.time() - t1:.4f}"
