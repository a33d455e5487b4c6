"""TC-GS scene bitstream: AE-latent triplane + triplane-conditioned AC.

Parity: TC-GS scene/gaussian_model.py conduct_encoding :1136+,
conduct_decoding :1314+, save_triplane :922-925. The triplane ships as
its f16 AE latent; BOTH encoder and decoder rebuild the context from the
AE-reconstructed planes so attribute CDFs regenerate bit-identically
(the reference saves the latent out-of-band; sampling the reconstruction
on both sides is the self-consistent version of that contract).
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
from gauspcc_tpu.fields import triplane as tri
from gauspcc_tpu.models.hac import codec as hac_codec
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.tcgs import model as tcgs
from gauspcc_tpu.ops import entropy_coding as ec

BATCH = hac_codec.BATCH
BIT2MB = hac_codec.BIT2MB


@partial(jax.jit, static_argnames=("cfg",))
def _batch_context(state, cfg: tcgs.TCGSConfig, anchor_batch, planes,
                   knn_pos=None):
    ctx_feats = tcgs.triplane_context(state, cfg, anchor_batch, planes,
                                      knn_pos=knn_pos)
    return tcgs.grid_mlp_split(state, cfg, ctx_feats)


def _batch_knn(knn_pos_all, lo, hi, batch):
    """Pad one batch of knn positions, or None in repeat mode."""
    if knn_pos_all is None:
        return None
    b = hi - lo
    out = np.zeros((batch,) + knn_pos_all.shape[1:], np.float32)
    out[:b] = knn_pos_all[lo:hi]
    return jnp.asarray(out)


def conduct_encoding(state, cfg: tcgs.TCGSConfig, out_dir: str,
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

    # triplane -> f16 latent artifact; context from its reconstruction
    latent, _ = tcgs.reconstructed_planes(state)
    latent16 = np.asarray(latent).astype(np.float16)
    np.savez(os.path.join(out_dir, "triplane_latent.npz"), latent=latent16)
    bits_triplane = latent16.size * 16
    planes_rec = tri.decode_latent(
        state["nets"]["autoencoder"], jnp.asarray(latent16.astype(np.float32))
    )

    anchor_sorted = data["anchor_int"].astype(np.float32) * cfg.voxel_size
    # knn sampling positions derive from the quantized sorted anchors, the
    # exact array the decoder reconstructs, so both sides agree
    # (TC-GS gaussian_renderer/__init__.py:56-63 knnanchor)
    knn_all = (tcgs.knn_positions(anchor_sorted, cfg.tri_samples)
               if cfg.knn_sampling else None)
    means = {kk: float(data[kk].mean()) if n else 0.0
             for kk in ("feat", "scaling", "offset")}

    bit_feat = bit_scaling = bit_offsets = 0
    steps = (n + BATCH - 1) // BATCH
    for s in range(steps):
        lo, hi = s * BATCH, min((s + 1) * BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        ctx = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_context(state, cfg, jnp.asarray(batch_anchor), planes_rec,
                           _batch_knn(knn_all, lo, hi, BATCH)))

        feat = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), jnp.asarray(ctx["q_feat"]),
            jnp.float32(means["feat"]))).reshape(-1)
        q_f = np.broadcast_to(ctx["q_feat"], (b, cfg.feat_dim)).reshape(-1)
        bit_feat += ec.encode_gaussian(
            feat, ctx["mean"].reshape(-1), ctx["scale"].reshape(-1),
            jnp.asarray(q_f), os.path.join(out_dir, f"feat_{s}.b"))

        scal = np.asarray(ste_multistep(
            jnp.asarray(data["scaling"][lo:hi]), jnp.asarray(ctx["q_scaling"]),
            jnp.float32(means["scaling"]))).reshape(-1)
        q_s = np.broadcast_to(ctx["q_scaling"], (b, 6)).reshape(-1)
        bit_scaling += ec.encode_gaussian(
            scal, ctx["mean_scaling"].reshape(-1),
            ctx["scale_scaling"].reshape(-1), jnp.asarray(q_s),
            os.path.join(out_dir, f"scaling_{s}.b"))

        offs = np.asarray(ste_multistep(
            jnp.asarray(data["offset"][lo:hi]),
            jnp.asarray(ctx["q_offsets"][:, None, :]),
            jnp.float32(means["offset"]))).reshape(-1)
        q_o = np.broadcast_to(ctx["q_offsets"], (b, 3 * k)).reshape(-1)
        msk = np.repeat(data["mask"][lo:hi], 3, axis=-1).reshape(-1).astype(bool)
        bit_offsets += ec.encode_gaussian(
            offs[msk], ctx["mean_offsets"].reshape(-1)[msk],
            ctx["scale_offsets"].reshape(-1)[msk], jnp.asarray(q_o[msk]),
            os.path.join(out_dir, f"offsets_{s}.b"))

    bit_masks = ec.encode_binary(data["mask"].reshape(-1),
                                 os.path.join(out_dir, "masks.b"))
    json.dump({"n_anchors": int(n), "batch": BATCH, **{
        f"{kk}_mean": v for kk, v in means.items()}},
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


def conduct_decoding(state, cfg: tcgs.TCGSConfig, out_dir: str,
                     pcc_params, pcc_cfg=pcc_model.NetConfig()):
    base = cfg.as_hac()
    t1 = time.time()
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    n = meta["n_anchors"]
    k = cfg.n_offsets

    latent16 = np.load(os.path.join(out_dir, "triplane_latent.npz"))["latent"]
    planes_rec = tri.decode_latent(
        state["nets"]["autoencoder"], jnp.asarray(latent16.astype(np.float32)))

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
    knn_all = (tcgs.knn_positions(anchor_sorted, cfg.tri_samples)
               if cfg.knn_sampling else None)

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
        ctx = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            _batch_context(dec_state, cfg, jnp.asarray(batch_anchor),
                           planes_rec, _batch_knn(knn_all, lo, hi, BATCH)))

        q_f = np.broadcast_to(ctx["q_feat"], (b, cfg.feat_dim)).reshape(-1)
        feat = ec.decode_gaussian(
            ctx["mean"].reshape(-1), ctx["scale"].reshape(-1),
            jnp.asarray(q_f), os.path.join(out_dir, f"feat_{s}.b"))
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
    a["anchor_feat"] = hac_codec._pad(np.concatenate(feat_list), (cap, cfg.feat_dim))
    a["scaling"] = hac_codec._pad(np.concatenate(scaling_list), (cap, 6))
    a["offset"] = hac_codec._pad(np.concatenate(offsets_list), (cap, k, 3))
    return dec_state, f"DecTime {time.time() - t1:.4f}"
