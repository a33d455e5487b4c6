"""GausPcgc occupancy-context network in JAX (functional, pytree params).

Architecture parity with the reference 4-stage unequal-bit occupancy
predictor (GausPcgc/network_ue_4stage_conv.py:11-181):

  prior_embedding (256 -> C) -> prior_resnet (conv + 2 ResNets) on parent
  voxels; FCG 1->8 upsample + octant target_embedding -> target_resnet on
  child voxels; then four stage heads, each preceded by its own 2-conv
  spatial context network and conditioned on an embedding of the previously
  (de)coded bits:
    stage 0: occupancy bit 8      (binary head)
    stage 1: bit 7                (binary head, cond. on bit 8)
    stage 2: bits 6-5             (4-way head, cond. on bits 8-7)
    stage 3: bits 4-1             (16-way head, cond. on bits 8-5)

TPU-first design notes: all shapes static (children capacity = 8x parent
capacity, masked); both conv stacks reuse one neighbor map per coordinate
set; convs run as grouped gather-MM (ops/sparse.py). The level forward is
a single jitted function; decode splits into per-stage jitted functions
because coded bits must round-trip through the host coder between stages.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.ops import sparse

Params = dict[str, Any]


class NetConfig(NamedTuple):
    """Static (hashable) network configuration, kept out of the params
    pytree so jit can specialize on it.

    dtype: conv-stack compute dtype. "bf16" halves the gather bandwidth of
    the sparse convs (the TPU hot path); heads and entropy math stay f32.
    Encode and decode share the same programs, so CDF tables remain
    bit-identical regardless."""

    channels: int = 32
    kernel_size: int = 5
    dtype: str = "bf16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bf16" else jnp.float32

STAGE_SIZES = (2, 2, 4, 16)  # symbols per stage head
STAGE_COND = (1, 2, 4, 16)  # embedding table sizes for stages (stage 0 unused)


def _dense_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound),
    }


def _conv_init(key, cin, cout, kernel_size):
    k3 = kernel_size**3
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * k3)
    return {
        "w": jax.random.uniform(k1, (k3, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _resnet_init(key, c, kernel_size):
    k1, k2 = jax.random.split(key)
    return {
        "conv0": _conv_init(k1, c, c, kernel_size),
        "conv1": _conv_init(k2, c, c, kernel_size),
    }


def _conv_stack_init(key, c, kernel_size):
    """conv + ReLU + ResNet + ResNet (prior_resnet / target_resnet)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": _conv_init(k1, c, c, kernel_size),
        "res0": _resnet_init(k2, c, kernel_size),
        "res1": _resnet_init(k3, c, kernel_size),
    }


def _spatial_init(key, c, kernel_size):
    """conv + ReLU + conv (spatial_conv_s*)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv0": _conv_init(k1, c, c, kernel_size),
        "conv1": _conv_init(k2, c, c, kernel_size),
    }


def _head_init(key, c, n_out):
    k1, k2 = jax.random.split(key)
    return {"fc0": _dense_init(k1, c, c), "fc1": _dense_init(k2, c, n_out)}


def init_params(key, config: NetConfig = NetConfig()) -> Params:
    channels, kernel_size = config.channels, config.kernel_size
    keys = jax.random.split(key, 16)
    params: Params = {
        "prior_embedding": jax.random.normal(keys[0], (256, channels)) * 1.0,
        "prior_resnet": _conv_stack_init(keys[1], channels, kernel_size),
        "target_embedding": jax.random.normal(keys[2], (8, channels)) * 1.0,
        "target_resnet": _conv_stack_init(keys[3], channels, kernel_size),
    }
    for s in range(4):
        params[f"spatial_s{s}"] = _spatial_init(keys[4 + s], channels, kernel_size)
        params[f"head_s{s}"] = _head_init(keys[8 + s], channels, STAGE_SIZES[s])
        if s > 0:
            params[f"cond_emb_s{s}"] = (
                jax.random.normal(keys[12 + s], (STAGE_COND[s], channels)) * 1.0
            )
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _conv(p, feats, nmap):
    return sparse.sparse_conv_apply(feats, nmap, p["w"], p["b"])


def _as_dense_map(nmap, kernel_size: int) -> sparse.NeighborMap:
    """Accept either a dense NeighborMap or a packed WindowMap (expanded
    on device once per program; XLA CSEs repeated expansions anyway)."""
    if isinstance(nmap, sparse.WindowMap):
        return sparse.nmap_from_packed(nmap, kernel_size)
    return nmap


def _resnet(p, feats, nmap):
    h = jax.nn.relu(_conv(p["conv0"], feats, nmap))
    h = _conv(p["conv1"], h, nmap)
    return jax.nn.relu(h + feats)


def _conv_stack(p, feats, nmap):
    """conv + 2 ResNets, rematerialized: under grad, each conv's [N, k^3, C]
    gather buffer is recomputed in backward instead of kept live. Without
    this the finest-level grad program keeps ~14 such buffers alive and
    fragments HBM past capacity (observed: 19.7G of 15.75G, 92%
    fragmentation, model/gauspcgc_r3/loop.log). Forward-only programs are
    unaffected (checkpoint is identity without a grad)."""

    def body(p_, feats_):
        h = jax.nn.relu(_conv(p_["conv"], feats_, nmap))
        h = _resnet(p_["res0"], h, nmap)
        return _resnet(p_["res1"], h, nmap)

    return jax.checkpoint(body)(p, feats)


def _spatial(p, feats, nmap):
    def body(p_, feats_):
        h = jax.nn.relu(_conv(p_["conv0"], feats_, nmap))
        return _conv(p_["conv1"], h, nmap)

    return jax.checkpoint(body)(p, feats)


def _head(p, feats):
    feats = feats.astype(jnp.float32)  # entropy math stays f32
    h = jax.nn.relu(feats @ p["fc0"]["w"] + p["fc0"]["b"])
    logits = h @ p["fc1"]["w"] + p["fc1"]["b"]
    return jax.nn.softmax(logits, axis=-1)


def split_occupancy(occ: jax.Array):
    """Occupancy byte -> the 4 stage ground-truth symbols
    (network_ue_4stage_conv.py:138-141)."""
    occ = occ.astype(jnp.int32)
    s0 = (occ // 128) % 2
    s1 = (occ // 64) % 2
    s2 = (occ // 16) % 4
    s3 = occ % 16
    return s0, s1, s2, s3


def merge_occupancy(s0, s1, s2, s3):
    """Inverse of split_occupancy (pcc_utils.py:369)."""
    return s0 * 128 + s1 * 64 + s2 * 16 + s3


# ---------------------------------------------------------------------------
# level forward
# ---------------------------------------------------------------------------

def level_context(params: Params, config: NetConfig, parent_coords,
                  parent_occ, parent_mask, child_cap: int | None = None,
                  parent_nmap: sparse.NeighborMap | None = None):
    """Shared parent->child context computation for one pyramid level.

    parent_* arrays are padded to capacity Np. Children are lex-sorted
    (valid first) and, when `child_cap` is given (static), compacted to
    that capacity — real occupancy averages well under 8 children/parent,
    so this cuts the child-level compute/memory ~4x vs the naive 8*Np.

    `parent_nmap` skips rebuilding the parent neighbor map: in a
    coarse-to-fine sweep, level d's child coords ARE level d+1's parent
    coords (same lex order, same capacity bucket), so the child map
    returned here is the next level's parent map for free.

    Returns the sorted child arrays, the child features after
    target_resnet, and the child neighbor map (reused by all four stages).
    """
    k = config.kernel_size
    dt = config.compute_dtype

    pf = params["prior_embedding"][jnp.clip(parent_occ.astype(jnp.int32), 0, 255)]
    pf = jnp.where(parent_mask[:, None], pf, 0.0).astype(dt)
    p_nmap = parent_nmap if parent_nmap is not None else sparse.build_neighbor_map(
        parent_coords, parent_mask, parent_coords, parent_mask, k
    )
    pf = _conv_stack(params["prior_resnet"], pf, p_nmap)

    child, child_mask, octant, parent_idx = sparse.fcg_expand(
        parent_coords, parent_occ, parent_mask
    )
    perm = sparse.lex_sort(child, child_mask)
    if child_cap is not None:
        perm = perm[:child_cap]
    child = child[perm]
    child_mask = child_mask[perm]
    octant = octant[perm]
    parent_idx = parent_idx[perm]

    cf = pf[parent_idx] + params["target_embedding"][octant].astype(dt)
    cf = jnp.where(child_mask[:, None], cf, 0).astype(dt)
    c_nmap = sparse.build_neighbor_map(child, child_mask, child, child_mask, k)
    cf = _conv_stack(params["target_resnet"], cf, c_nmap)

    return {
        "child_coords": child,
        "child_mask": child_mask,
        "octant": octant,
        "feats": cf,
        "nmap": c_nmap,
    }


def level_context_packed(params: Params, config: NetConfig, parent_occ,
                         parent_mask, p_nmap: sparse.NeighborMap, octant,
                         parent_idx, child_mask,
                         c_nmap: sparse.NeighborMap):
    """Parent->child context features from HOST-prebuilt geometry.

    The integer set work (child expansion, lex sort, neighbor maps) runs
    in the native host builder (ops/hostmap.py) and arrives here as plain
    gather tables; this program is pure NN math (embeds + conv stacks),
    which is what the TPU is good at. Semantics identical to
    :func:`level_context`.

    octant/parent_idx/child_mask: [Cc] aligned with the host's lex-sorted
    children (parent_idx < 0 on padding).
    """
    dt = config.compute_dtype
    k = config.kernel_size
    p_nmap = _as_dense_map(p_nmap, k)
    c_nmap = _as_dense_map(c_nmap, k)
    pf = params["prior_embedding"][jnp.clip(parent_occ.astype(jnp.int32), 0, 255)]
    pf = jnp.where(parent_mask[:, None], pf, 0.0).astype(dt)
    pf = _conv_stack(params["prior_resnet"], pf, p_nmap)

    cf = pf[jnp.clip(parent_idx, 0, pf.shape[0] - 1)] + (
        params["target_embedding"][jnp.clip(octant, 0, 7)].astype(dt)
    )
    cf = jnp.where(child_mask[:, None], cf, 0).astype(dt)
    return _conv_stack(params["target_resnet"], cf, c_nmap)


def stage_probs(params: Params, stage: int, ctx_feats, nmap, prev_sym):
    """Probabilities for one stage given previously (de)coded symbols.

    prev_sym: int32 [Nc] combined previous bits (0 for stage 0):
      stage 1: bit8; stage 2: bit8*2+bit7; stage 3: prev*4 + bits65.
    """
    sp = params[f"spatial_s{stage}"]
    nmap = _as_dense_map(nmap, round(sp["conv0"]["w"].shape[0] ** (1 / 3)))
    f = ctx_feats
    if stage > 0:
        table = params[f"cond_emb_s{stage}"]
        f = f + table[jnp.clip(prev_sym, 0, table.shape[0] - 1)].astype(f.dtype)
    h = _spatial(sp, f, nmap)
    return _head(params[f"head_s{stage}"], h)


def level_bits(params: Params, config: NetConfig, parent_coords, parent_occ,
               parent_mask, gt_child_occ):
    """Training objective for one level: total bits to code the children's
    occupancy bytes, teacher-forced on ground truth (Network.forward:143-178).

    gt_child_occ: int32 [C] aligned with the sorted valid children, where C
    is the child capacity (any padding arbitrary). Returns
    (total_bits, n_valid_children).
    """
    ctx = level_context(params, config, parent_coords, parent_occ, parent_mask,
                        child_cap=gt_child_occ.shape[0])
    return _staged_bits(params, ctx["feats"], ctx["nmap"], ctx["child_mask"],
                        gt_child_occ)


def level_bits_packed(params: Params, config: NetConfig, parent_occ,
                      parent_mask, p_nmap, octant, parent_idx, child_mask,
                      c_nmap, gt_child_occ):
    """level_bits over host-prebuilt geometry (see level_context_packed)."""
    feats = level_context_packed(params, config, parent_occ, parent_mask,
                                 p_nmap, octant, parent_idx, child_mask,
                                 c_nmap)
    return _staged_bits(params, feats, c_nmap, child_mask, gt_child_occ)


# ---------------------------------------------------------------------------
# sibling-packed level forward (ops/sibconv.py) — the fast training path
# ---------------------------------------------------------------------------

def _conv_stack_sib(p, feats, gmapT, gmapfT, slotmask):
    """conv + 2 ResNets over the sibling-packed layout; numerically equal
    to _conv_stack at valid voxels (tests/test_sibconv.py). Rematerialized
    like _conv_stack: without checkpoint, the level-grad program keeps
    every conv's [G, 27, 8C] gather buffer alive at once and the finest
    level blows HBM (observed 21.6G of 15.75G, model/gauspcgc_r4)."""
    from gauspcc_tpu.ops import sibconv

    def body(p_, feats_):
        conv = lambda q, f: sibconv.sibconv_apply(
            f, gmapT, gmapfT, q["w"], q["b"], slotmask=slotmask)
        h = jax.nn.relu(conv(p_["conv"], feats_))
        r = p_["res0"]
        h1 = jax.nn.relu(
            h + conv(r["conv1"], jax.nn.relu(conv(r["conv0"], h))))
        r = p_["res1"]
        return jax.nn.relu(
            h1 + conv(r["conv1"], jax.nn.relu(conv(r["conv0"], h1))))

    return jax.checkpoint(body)(p, feats)


def _spatial_sib(p, feats, gmapT, gmapfT, slotmask):
    from gauspcc_tpu.ops import sibconv

    def body(p_, feats_):
        conv = lambda q, f: sibconv.sibconv_apply(
            f, gmapT, gmapfT, q["w"], q["b"], slotmask=slotmask)
        return conv(p_["conv1"], jax.nn.relu(conv(p_["conv0"], feats_)))

    return jax.checkpoint(body)(p, feats)


def sib_context(params: Params, config: NetConfig, pocc_packed, pslotmask,
                p_gmapT, p_gmapfT, parent_pos, c_gmapT, c_gmapfT,
                c_slotmask):
    """Child context features over sibling-packed geometry -> [Pcap*8, C].

    pocc_packed int32 [Gp*8]: parent occupancy bytes in the parents' own
    sibling packing (grouped by grandparent cell); pslotmask bool [Gp*8].
    p_gmapT/p_gmapfT int32 [Gp, 27]: grandparent-cell neighbor map + flip.
    parent_pos int32 [Pcap]: row of parent voxel i inside the packed
    parent layout (pad rows may alias row 0; never read through valid
    children). c_gmapT/c_gmapfT int32 [Pcap, 27]: parent-cell neighbor
    map for the children (a child's k<=5 neighborhood spans the 27 cells
    around its parent); c_slotmask bool [Pcap*8] = parent occupancy bits.
    Equals level_context_packed's output at valid voxels, reindexed to
    (parent, octant) slots."""
    dt = config.compute_dtype
    pf = params["prior_embedding"][jnp.clip(pocc_packed.astype(jnp.int32),
                                            0, 255)]
    pf = jnp.where(pslotmask[:, None], pf, 0.0).astype(dt)
    pf = _conv_stack_sib(params["prior_resnet"], pf, p_gmapT, p_gmapfT,
                         pslotmask)

    pcap = parent_pos.shape[0]
    pf_vox = pf[jnp.clip(parent_pos, 0, pf.shape[0] - 1)]  # [Pcap, C]
    cf = (pf_vox[:, None, :]
          + params["target_embedding"][None, :, :].astype(dt)).reshape(
              pcap * 8, -1)
    cf = jnp.where(c_slotmask[:, None], cf, 0).astype(dt)
    return _conv_stack_sib(params["target_resnet"], cf, c_gmapT, c_gmapfT,
                           c_slotmask)


def sib_stage_probs(params: Params, stage: int, cf, c_gmapT, c_gmapfT,
                    c_slotmask, prev_packed):
    """Stage probabilities over packed children [Pcap*8, S]; prev_packed
    int32 [Pcap*8] = previously (de)coded symbols in packed order."""
    f = cf
    if stage > 0:
        table = params[f"cond_emb_s{stage}"]
        f = f + jnp.where(
            c_slotmask[:, None],
            table[jnp.clip(prev_packed, 0, table.shape[0] - 1)].astype(
                f.dtype),
            0)
    h = _spatial_sib(params[f"spatial_s{stage}"], f, c_gmapT, c_gmapfT,
                     c_slotmask)
    return _head(params[f"head_s{stage}"], h)


def level_bits_sib(params: Params, config: NetConfig,
                   pocc_packed, pslotmask, p_gmapT, p_gmapfT,
                   parent_pos, c_gmapT, c_gmapfT, c_slotmask, gt_packed):
    """Training bits for one level over sibling-packed geometry; equals
    level_bits_packed on the same level (different packing, same net).
    gt_packed int32 [Pcap*8] = child occupancy bytes at (parent, octant).
    Returns (total_bits, n_valid_children)."""
    cf = sib_context(params, config, pocc_packed, pslotmask, p_gmapT,
                     p_gmapfT, parent_pos, c_gmapT, c_gmapfT, c_slotmask)
    s0, s1, s2, s3 = split_occupancy(gt_packed)
    total = 0.0
    prev = jnp.zeros_like(s0)
    for stage, gt in enumerate((s0, s1, s2, s3)):
        probs = sib_stage_probs(params, stage, cf, c_gmapT, c_gmapfT,
                                c_slotmask, prev)
        p = jnp.take_along_axis(probs, gt[:, None], axis=-1)[:, 0]
        bits = jnp.clip(-jnp.log2(p + 1e-10), 0.0, 50.0)
        total = total + jnp.sum(jnp.where(c_slotmask, bits, 0.0))
        if stage == 0:
            prev = gt
        elif stage == 1:
            prev = prev * 2 + gt
        elif stage == 2:
            prev = prev * 4 + gt
    return total, jnp.sum(c_slotmask)


def _staged_bits(params, feats, nmap, mask, gt_child_occ):
    s0, s1, s2, s3 = split_occupancy(gt_child_occ)
    total = 0.0
    prev = jnp.zeros_like(s0)
    for stage, gt in enumerate((s0, s1, s2, s3)):
        probs = stage_probs(params, stage, feats, nmap, prev)
        p = jnp.take_along_axis(probs, gt[:, None], axis=-1)[:, 0]
        bits = jnp.clip(-jnp.log2(p + 1e-10), 0.0, 50.0)
        total = total + jnp.sum(jnp.where(mask, bits, 0.0))
        if stage == 0:
            prev = gt
        elif stage == 1:
            prev = prev * 2 + gt
        elif stage == 2:
            prev = prev * 4 + gt
    return total, jnp.sum(mask)
