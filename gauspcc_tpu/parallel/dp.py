"""Multi-chip data-parallel codec training over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.9); the TPU-native
scaling story is SPMD data parallelism: each device trains on its own KD
patch, gradients are mean-reduced over the 'dp' axis with an XLA psum
riding ICI, and the (replicated) Adam update is applied identically
everywhere. Patches are padded to a shared per-level capacity schedule so
one jitted program serves every device.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import optax

from gauspcc_tpu.codecs.gauspcgc import model
from gauspcc_tpu.ops import sparse


def default_capacity_schedule(finest_cap: int = 4096, n_levels: int = 4):
    """Per-level parent capacities, coarse -> fine (halving by 8 per level
    matches the dyadic pyramid's expected shrinkage, floored)."""
    caps = []
    c = finest_cap
    for _ in range(n_levels):
        caps.append(max(c, 64))
        c //= 8
    return caps[::-1]


def pack_patch(xyz_int: np.ndarray, caps: list[int]):
    """Build a fixed-layout pyramid batch for one patch.

    Returns dict of per-level arrays: pc [L, cap, 3], po [L, cap],
    pm [L, cap], gt [L, cap*8] (ragged capacities padded to max cap), plus
    n_points scalar. Levels beyond the patch's pyramid are empty (masked).
    Raises if a level exceeds its capacity.
    """
    xyz0 = sparse.dedupe_lex_np(xyz_int - xyz_int.min(axis=0))
    levels = sparse.build_occupancy_pyramid(xyz0, min_points=64,
                                            sorted_unique=True)
    n_levels = len(caps)
    # keep the finest n_levels coded transitions (coarser ones are tiny)
    trans = [(levels[d], levels[d + 1]) for d in range(len(levels) - 1)]
    trans = trans[-n_levels:]
    pcs, pos, pms, gts = [], [], [], []
    for i in range(n_levels):
        cap = caps[i]
        j = i - (n_levels - len(trans))
        pc = np.zeros((cap, 3), np.int32)
        po = np.zeros(cap, np.int32)
        pm = np.zeros(cap, bool)
        gt = np.zeros(cap * 8, np.int32)
        if j >= 0:
            (c, o), (_, go) = trans[j]
            if c.shape[0] > cap:
                raise ValueError(f"level {i}: {c.shape[0]} parents > cap {cap}")
            pc[: c.shape[0]] = c
            po[: c.shape[0]] = o
            pm[: c.shape[0]] = True
            gt[: go.shape[0]] = go
        pcs.append(pc)
        pos.append(po)
        pms.append(pm)
        gts.append(gt)
    return {
        "pc": pcs, "po": pos, "pm": pms, "gt": gts,
        "n_points": np.int32(xyz0.shape[0]),
    }


def stack_patches(patches: list[dict]):
    """Stack per-device patches into leading-axis-'dp' arrays."""
    n_levels = len(patches[0]["pc"])
    return {
        "pc": [jnp.stack([p["pc"][i] for p in patches]) for i in range(n_levels)],
        "po": [jnp.stack([p["po"][i] for p in patches]) for i in range(n_levels)],
        "pm": [jnp.stack([p["pm"][i] for p in patches]) for i in range(n_levels)],
        "gt": [jnp.stack([p["gt"][i] for p in patches]) for i in range(n_levels)],
        "n_points": jnp.stack([p["n_points"] for p in patches]),
    }


def make_dp_train_step(optimizer: optax.GradientTransformation,
                       net_cfg: model.NetConfig, mesh: Mesh):
    """Returns a jitted SPMD train step over mesh axis 'dp'.

    step(params, opt_state, batch) -> (params, opt_state, mean_bpp)
    params/opt_state replicated; batch sharded on its leading axis.
    """

    def per_device(params, opt_state, pc, po, pm, gt, n_points):
        # local leading dim is 1 after sharding
        def loss_fn(p):
            total = 0.0
            for i in range(len(pc)):
                bits, _ = model.level_bits(
                    p, net_cfg, pc[i][0], po[i][0], pm[i][0], gt[i][0]
                )
                total = total + bits
            return total / jnp.maximum(n_points[0].astype(jnp.float32), 1.0)

        bpp, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "dp")
        mean_bpp = jax.lax.pmean(bpp, "dp")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mean_bpp

    def step(params, opt_state, batch):
        n_levels = len(batch["pc"])
        lv = [P("dp")] * n_levels
        in_specs = (
            P(),  # params (replicated)
            P(),  # opt_state
            lv, lv, lv, lv,  # pc, po, pm, gt
            P("dp"),  # n_points
        )
        out_specs = (P(), P(), P())
        fn = jax.shard_map(
            per_device, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)(
            params, opt_state,
            batch["pc"], batch["po"], batch["pm"], batch["gt"],
            batch["n_points"],
        )

    return step
