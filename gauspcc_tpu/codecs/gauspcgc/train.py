"""GausPcgc codec trainer.

Parity with the reference single-GPU loop (GausPcgc/train.py:144-256):
Adam lr 5e-4 decayed x0.1 at [40k, 90k], 110k steps, batch of KD patches,
loss = network bpp, periodic validation with best-checkpoint tracking,
rotating-file + console logging, crash checkpoint dump.

TPU-first structure: per-level loss+grad is one jitted program cached per
capacity bucket; gradients accumulate across pyramid levels on device and
one jitted optax update applies them. Multi-chip data parallelism lives in
gauspcc_tpu/parallel (mean-bpp over per-device patches via shard_map).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from functools import partial
from logging.handlers import RotatingFileHandler

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gauspcc_tpu.codecs.gauspcgc import model
from gauspcc_tpu.codecs.gauspcgc.codec import (
    MIN_BASE_POINTS, _level_geometries,
)
from gauspcc_tpu.ops import sparse
from gauspcc_tpu.utils import checkpoint


@dataclass
class TrainConfig:
    channels: int = 32
    kernel_size: int = 5
    learning_rate: float = 5e-4
    lr_decay: float = 0.1
    lr_decay_steps: tuple[int, ...] = (40_000, 90_000)
    max_steps: int = 110_000
    val_interval: int = 500
    log_interval: int = 100
    seed: int = 11
    model_dir: str = "./model/gauspcgc"

    @property
    def net(self) -> model.NetConfig:
        return model.NetConfig(self.channels, self.kernel_size)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.piecewise_constant_schedule(
        cfg.learning_rate,
        {int(s): cfg.lr_decay for s in cfg.lr_decay_steps},
    )
    return optax.adam(sched, eps=1e-8)


@partial(jax.jit, static_argnames=("config",))
def _level_bits(params, config, po, pm, p_map, octant, parent_idx,
                child_mask, c_map, gt):
    """Jitted eval-only level bits (validation; eager tracing would
    dispatch every op separately over the tunnel)."""
    bits, _ = model.level_bits_packed(
        params, config, po, pm, p_map, octant, parent_idx, child_mask,
        c_map, gt)
    return bits


@partial(jax.jit, static_argnames=("config",))
def _level_bits_grad(params, config, po, pm, p_map, octant, parent_idx,
                     child_mask, c_map, gt):
    def f(p):
        bits, n = model.level_bits_packed(
            p, config, po, pm, p_map, octant, parent_idx, child_mask,
            c_map, gt)
        return bits, n

    (bits, n), grads = jax.value_and_grad(f, has_aux=True)(params)
    return bits, n, grads


@jax.jit
def _accumulate(acc, grads):
    return jax.tree_util.tree_map(jnp.add, acc, grads)


def make_update_fn(optimizer):
    @jax.jit
    def update(params, opt_state, grads, inv_n):
        grads = jax.tree_util.tree_map(lambda g: g * inv_n, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    return update


class SibLevel:
    """Device arrays for one coded level in sibling-packed layout."""

    __slots__ = ("pocc", "pmask", "p_gmapT", "p_gmapfT", "ppos",
                 "c_gmapT", "c_gmapfT", "cmask", "gt")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _sib_pos(child_coords: np.ndarray, parent_coords: np.ndarray):
    """Packed row (parent_row*8 + octant) of each child voxel."""
    from gauspcc_tpu.ops import sibconv

    return sibconv.sib_pos_np(child_coords, parent_coords)


def _bucket_train(n: int, minimum: int = 256) -> int:
    """Pure power-of-two capacity for TRAINING shapes.

    The codec's ``_bucket`` switches to multiples of 16384 above 16 k to
    bound pad waste on the encode/decode path — the right trade there,
    where each shape compiles once per process and throughput is king.
    The trainer sees a different regime: every distinct (parent_cap,
    child_cap) pair compiles BOTH a forward and a grad program over the
    tunneled backend (~30-120 s each), and the r4 synthetic corpus
    produces 54 such pairs under ``_bucket`` vs 27 under pow2 — the r5
    on-chip retrain spent its whole 2 h window in that compile storm at
    16-128 s/step (model/gauspcgc_r5/loop.log) while post-compile steps
    are sub-second. Pow2 pads at most 2x compute, which the MXU matmuls
    absorb; halving the program count halves the storm, and the
    persistent compile cache (utils/compile_cache.py) then makes every
    later run warm.
    """
    b = minimum
    while b < n:
        b *= 2
    return b


def pyramid_batches_sib(xyz_int: np.ndarray, kernel_size: int):
    """Host prep for the sibling-packed training path (ops/sibconv.py).

    Builds ONE k=3 cell-neighbor map per pyramid level (shared between
    that level's children and the next level's parents) plus the packed
    occupancy/gt scatters. Far less host work than the per-voxel k^2
    window maps of :func:`pyramid_batches`, and the resulting device
    programs are MXU matmuls instead of 125-tap row gathers.

    Returns ([SibLevel] per coded level, n_points).
    """
    from gauspcc_tpu.ops import hostmap, sparse

    xyz0 = sparse.dedupe_lex_np(xyz_int - xyz_int.min(axis=0))
    levels = sparse.build_occupancy_pyramid(xyz0, min_points=MIN_BASE_POINTS,
                                            sorted_unique=True)
    n_levels = len(levels)
    caps = [_bucket_train(levels[d][0].shape[0]) for d in range(n_levels)]
    gmaps = [hostmap.build_map(levels[d][0], levels[d][0].shape[0], 3,
                               ncap=caps[d])
             for d in range(n_levels - 1)]  # finest level needs no own map

    # grandparent grouping of the coarsest (base) level
    base = levels[0][0].astype(np.int64)
    groups0 = sparse.dedupe_lex_np(base >> 1).astype(np.int32)
    g0cap = _bucket_train(groups0.shape[0])
    gmap0 = hostmap.build_map(groups0, groups0.shape[0], 3, ncap=g0cap)

    def put_map(m):
        t = jnp.asarray(m.T)  # [cap, 27]
        return t, t[:, ::-1]

    # Convert each neighbor map to device arrays ONCE: gmaps[d] serves as
    # the child map of level d AND the parent map of level d+1, and the
    # maps dominate the prepared cloud's device footprint ([cap,27] int32
    # x forward+flipped = 56 MB at a 262144-cap fine level). Converting
    # per use, as before, duplicated every map on device and doubled both
    # HBM residency and upload traffic.
    dev_gmap0 = put_map(gmap0)
    dev_gmaps = [put_map(m) for m in gmaps]

    out = []
    for d in range(n_levels - 1):
        pcoords, pocc = levels[d]
        nd, cap = pcoords.shape[0], caps[d]
        if d == 0:
            gp_coords, gp_cap, gp_dev = groups0, g0cap, dev_gmap0
        else:
            gp_coords, gp_cap, gp_dev = (levels[d - 1][0], caps[d - 1],
                                         dev_gmaps[d - 1])
        pos = _sib_pos(pcoords.astype(np.int64), gp_coords.astype(np.int64))
        pocc_packed = np.zeros(gp_cap * 8, np.int32)
        pocc_packed[pos] = pocc
        pmask = np.zeros(gp_cap * 8, bool)
        pmask[pos] = True

        cmask = np.zeros(cap * 8, bool)
        bits = (pocc[:, None] >> np.arange(8)[None, :]) & 1
        cmask[: nd * 8] = bits.astype(bool).reshape(-1)

        ccoords, cocc = levels[d + 1]
        cpos = _sib_pos(ccoords.astype(np.int64), pcoords.astype(np.int64))
        gt_packed = np.zeros(cap * 8, np.int32)
        gt_packed[cpos] = cocc

        ppos = np.zeros(cap, np.int64)
        ppos[:nd] = pos
        p_gmapT, p_gmapfT = gp_dev
        c_gmapT, c_gmapfT = dev_gmaps[d]
        out.append(SibLevel(
            pocc=jnp.asarray(pocc_packed), pmask=jnp.asarray(pmask),
            p_gmapT=p_gmapT, p_gmapfT=p_gmapfT,
            ppos=jnp.asarray(ppos.astype(np.int32)),
            c_gmapT=c_gmapT, c_gmapfT=c_gmapfT,
            cmask=jnp.asarray(cmask), gt=jnp.asarray(gt_packed)))
    return out, xyz0.shape[0]


@partial(jax.jit, static_argnames=("config",))
def _level_bits_sib(params, config, pocc, pmask, p_gmapT, p_gmapfT, ppos,
                    c_gmapT, c_gmapfT, cmask, gt):
    bits, _ = model.level_bits_sib(
        params, config, pocc, pmask, p_gmapT, p_gmapfT, ppos,
        c_gmapT, c_gmapfT, cmask, gt)
    return bits


@partial(jax.jit, static_argnames=("config",))
def _level_bits_sib_grad(params, config, pocc, pmask, p_gmapT, p_gmapfT,
                         ppos, c_gmapT, c_gmapfT, cmask, gt):
    def f(p):
        return model.level_bits_sib(
            p, config, pocc, pmask, p_gmapT, p_gmapfT, ppos,
            c_gmapT, c_gmapfT, cmask, gt)

    (bits, n), grads = jax.value_and_grad(f, has_aux=True)(params)
    return bits, n, grads


def pyramid_batches(xyz_int: np.ndarray, kernel_size: int):
    """Host prep: shift, dedupe, pyramid, native child/neighbor-map build
    (ops/hostmap.py — the same geometry path the codec uses).

    Returns ([(geometry, gt_pad)] per coded level, n_points).
    """
    xyz0 = sparse.dedupe_lex_np(xyz_int - xyz_int.min(axis=0))
    levels = sparse.build_occupancy_pyramid(xyz0, min_points=MIN_BASE_POINTS,
                                            sorted_unique=True)
    geos = _level_geometries(levels, kernel_size)
    out = []
    for d, g in enumerate(geos):
        gt_occ = levels[d + 1][1]
        gt_pad = np.zeros(g.ccap, np.int32)
        gt_pad[: gt_occ.shape[0]] = gt_occ
        out.append((g, jnp.asarray(gt_pad)))
    return out, xyz0.shape[0]


def _batch_bits(params, net_cfg, b):
    if isinstance(b, tuple):
        g, gt = b
        return _level_bits(
            params, net_cfg, g.po, g.pm, g.p_map, g.octant, g.parent_idx,
            g.child_mask, g.c_map, gt)
    return _level_bits_sib(
        params, net_cfg, b.pocc, b.pmask, b.p_gmapT, b.p_gmapfT, b.ppos,
        b.c_gmapT, b.c_gmapfT, b.cmask, b.gt)


def _batch_bits_grad(params, net_cfg, b):
    if isinstance(b, tuple):
        g, gt = b
        return _level_bits_grad(
            params, net_cfg, g.po, g.pm, g.p_map, g.octant, g.parent_idx,
            g.child_mask, g.c_map, gt)
    return _level_bits_sib_grad(
        params, net_cfg, b.pocc, b.pmask, b.p_gmapT, b.p_gmapfT, b.ppos,
        b.c_gmapT, b.c_gmapfT, b.cmask, b.gt)


def cloud_bits(params, net_cfg, xyz_int: np.ndarray,
               prepared=None) -> tuple[float, int]:
    """Teacher-forced total bits for a whole cloud (validation metric)."""
    batches, n_points = (prepared if prepared is not None
                         else pyramid_batches_sib(xyz_int,
                                                  net_cfg.kernel_size))
    total = None
    for b in batches:
        bits = _batch_bits(params, net_cfg, b)
        total = bits if total is None else total + bits
    return float(total), n_points


def train_step(params, opt_state, update_fn, net_cfg, xyz_int: np.ndarray,
               zero_grads, prepared=None):
    """One step on one patch: accumulate level grads, apply Adam update.

    `prepared`: optional (batches, n_points) from pyramid_batches_sib (or
    the legacy pyramid_batches) — the trainer caches these per patch so
    steady-state steps are pure device compute (no host geometry rebuild
    or re-upload). Returns (params, opt_state, bpp).
    """
    batches, n_points = (prepared if prepared is not None
                         else pyramid_batches_sib(xyz_int,
                                                  net_cfg.kernel_size))
    grads = zero_grads
    total_bits = None
    for b in batches:
        bits, _, grad = _batch_bits_grad(params, net_cfg, b)
        grads = _accumulate(grads, grad)
        # accumulate on device: a float() here would block once per level
        # (a full tunnel round-trip each), serializing the level pipeline
        total_bits = bits if total_bits is None else total_bits + bits
    params, opt_state = update_fn(
        params, opt_state, grads, jnp.float32(1.0 / n_points)
    )
    return params, opt_state, float(total_bits) / n_points


def setup_logger(log_dir: str, name: str = "gauspcgc") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = RotatingFileHandler(
        os.path.join(log_dir, "train.log"), maxBytes=10 * 1024 * 1024, backupCount=5
    )
    ch = logging.StreamHandler()
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    fh.setFormatter(fmt)
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger


def _prepared_nbytes(prepared) -> int:
    """Device bytes held by one prepared cloud (geo-cache accounting).

    Deduplicates by object identity: adjacent SibLevels share their
    neighbor-map device arrays (pyramid_batches_sib converts each map
    once), so naive per-field summing would double-count the dominant
    buffers.
    """
    batches, _ = prepared
    seen: set = set()
    total = 0
    for b in batches:
        if isinstance(b, tuple):
            g, gt = b
            arrs = [getattr(g, s) for s in g.__slots__
                    if hasattr(getattr(g, s, None), "nbytes")] + [gt]
        else:
            arrs = [getattr(b, s) for s in b.__slots__]
        for a in arrs:
            if id(a) not in seen:
                seen.add(id(a))
                total += int(a.nbytes)
    return total


def train(cfg: TrainConfig, dataset, val_dataset=None, max_steps=None,
          scalar_logger=None, start_params=None, geo_cache_size: int = 64,
          resume_state: str | None = None, state_every: int = 1000,
          geo_cache_bytes: int = 3_000_000_000):
    """Full training loop over a PatchDataset; returns trained params.

    dataset: gauspcc_tpu.codecs.gauspcgc.data.PatchDataset
    scalar_logger: optional utils.scalars.ScalarLogger (TB/wandb/JSONL).
    start_params: resume from a params pytree instead of fresh init.
    geo_cache_size: patches whose device-side geometry (maps, gt) stays
    resident between epochs — the KD partition is deterministic, so a
    revisited patch costs zero host work and zero upload.
    geo_cache_bytes: hard byte budget for that device-resident cache.
    The count limit alone sank the r5 retrain: 48 corpus clouds at up to
    ~100 MB of maps/packed arrays each were all admitted under
    --geo_cache 128 and exhausted v5e HBM by step ~40 alongside the
    grad/Adam workspace (model/gauspcgc_r5/loop.log ResourceExhausted).
    A cloud that does not fit simply re-uploads each epoch — correctness
    is unaffected, only steady-state upload traffic.
    resume_state: path of a train_state.pkl written by a previous run —
    restores params, optimizer moments, step and best-val so a run
    interrupted mid-flight (device stall, crash) continues losslessly;
    state_every: how often (steps) the full state snapshot is written.
    """
    from gauspcc_tpu.utils.heartbeat import Heartbeat

    logger = setup_logger(cfg.model_dir)
    logger.info(f"config: {cfg}")
    # liveness file for scripts/codec_train_loop.sh's stall watchdog: kept
    # warm through per-shape-bucket compiles, which can outlast any log
    # cadence on a cold cache (see utils/heartbeat.py)
    hb = Heartbeat(os.path.join(cfg.model_dir, "heartbeat"))
    key = jax.random.PRNGKey(cfg.seed)
    params = (start_params if start_params is not None
              else model.init_params(key, cfg.net))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    update_fn = make_update_fn(optimizer)

    steps = max_steps or cfg.max_steps
    best_val = float("inf")
    step = 0
    state_path = os.path.join(cfg.model_dir, "train_state.pkl")
    if resume_state and os.path.exists(resume_state):
        snap = checkpoint.load_training_checkpoint(resume_state)
        params = snap["params"]
        opt_state = snap["opt_state"]
        step = int(snap["iteration"])
        best_val = float(snap.get("best_val", best_val))
        logger.info(f"resumed full state from {resume_state} at step {step}")
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    step0 = step
    t0 = time.time()
    ema_bpp = None
    geo_cache: dict = {}
    geo_cache_used = 0
    try:
        while step < steps:
            for idx in dataset.epoch_order():
                if step >= steps:
                    break
                if hasattr(dataset, "sample_with_key"):
                    ckey, xyz = dataset.sample_with_key(idx)
                    prepared = geo_cache.get(ckey)
                    if prepared is None:
                        prepared = pyramid_batches_sib(xyz,
                                                       cfg.net.kernel_size)
                        nb = _prepared_nbytes(prepared)
                        if (len(geo_cache) < geo_cache_size
                                and geo_cache_used + nb <= geo_cache_bytes):
                            geo_cache[ckey] = prepared
                            geo_cache_used += nb
                else:
                    xyz, prepared = dataset.sample(idx), None
                with hb.guard("step"):
                    params, opt_state, bpp = train_step(
                        params, opt_state, update_fn, cfg.net, None,
                        zero_grads, prepared=prepared,
                    )
                hb.beat()
                step += 1
                if step == step0 + 1:
                    # heartbeat after the first (compile-heavy) step so the
                    # outer stall watchdog sees progress before log_interval
                    logger.info(
                        f"step {step} first step done "
                        f"({time.time() - t0:.1f}s incl. compiles)")
                ema_bpp = bpp if ema_bpp is None else 0.95 * ema_bpp + 0.05 * bpp
                if step % cfg.log_interval == 0 or (
                        step - step0 <= 100 and step % 10 == 0):
                    # the dense early cadence keeps train.log warm through
                    # the per-shape-bucket compile storm of a fresh run
                    logger.info(
                        f"step {step} bpp {bpp:.4f} ema {ema_bpp:.4f} "
                        f"({(time.time()-t0)/max(step - step0, 1):.3f} s/step)"
                    )
                    if scalar_logger is not None:
                        scalar_logger.log(step, {
                            "train/bpp": bpp, "train/ema_bpp": ema_bpp,
                            "train/step_time":
                                (time.time() - t0) / max(step - step0, 1),
                        })
                if val_dataset is not None and step % cfg.val_interval == 0:
                    with hb.guard("val"):
                        # Stream the val set one cloud at a time: a cached
                        # list of device pyramids (~8 clouds of maps+words)
                        # stayed resident next to the train geo cache and
                        # tipped v5e HBM on the first post-val train step
                        # (r5b retrain, 22:48Z: RESOURCE_EXHAUSTED at step
                        # 101). Host prep is re-paid per val, device peak is
                        # one cloud.
                        vb, vn = None, 0
                        for vi in range(len(val_dataset)):
                            batches, n = pyramid_batches_sib(
                                val_dataset.get(vi), cfg.net.kernel_size)
                            for lv in batches:
                                b = _batch_bits(params, cfg.net, lv)
                                vb = b if vb is None else vb + b
                            vn += n
                        vb = float(vb)  # one device sync for whole val set
                    val_bpp = vb / max(vn, 1)
                    logger.info(f"step {step} val_bpp {val_bpp:.4f}")
                    if scalar_logger is not None:
                        scalar_logger.log(step, {"val/bpp": val_bpp})
                    if val_bpp < best_val:
                        best_val = val_bpp
                        checkpoint.save_pytree(
                            os.path.join(cfg.model_dir, "best_model.npz"), params
                        )
                if step % 10_000 == 0:
                    checkpoint.save_pytree(
                        os.path.join(cfg.model_dir, f"ckpt_{step}.npz"), params
                    )
                if state_every and step % state_every == 0:
                    if os.path.exists(state_path):
                        os.replace(state_path, state_path + ".prev")
                    checkpoint.save_training_checkpoint(state_path, {
                        "params": params, "opt_state": opt_state,
                        "iteration": step, "best_val": best_val,
                    })
    except Exception:
        # crash dump, mirroring GausPcgc/train.py:237-240
        checkpoint.save_pytree(
            os.path.join(cfg.model_dir, f"error_model_{step}.npz"), params
        )
        raise
    checkpoint.save_pytree(os.path.join(cfg.model_dir, "final_model.npz"), params)
    return params
