"""Pallas TPU kernel for the per-tile alpha-blend stage of the rasterizer.

STATUS: EXPERIMENTAL — numerically verified against the reference blend in
interpret mode (tests/test_pallas_blend.py), but the Mosaic compiler on
this toolchain rejects the compiled kernel with a scoped-vmem accounting
overflow (~107 MB reported for ~5 MB of live [256, K] temporaries;
"It should not be possible to run out of scoped vmem"). The pure-XLA
blend in render/raster.py remains the production path — it already maps
the color contraction onto the MXU and fuses the elementwise work; this
kernel exists to fuse across XLA's fusion boundaries once the compiler
issue is resolved (or the kernel is restructured around K-chunked loops).

Design: the gather of per-tile Gaussian records stays in XLA (gathers
don't vectorize inside Mosaic), and this kernel fuses everything after it
— per-pixel alpha evaluation, the exclusive log-transmittance prefix sum
(as an MXU matmul against a triangular mask: Mosaic has no cumsum), the
[256, K] x [K, 4] color contraction, and the background composite — into
one VMEM-resident program per tile.

Record layout per Gaussian (8 lanes):
  [mx, my, conic_a, conic_b, conic_c, opacity, tile_origin_x, tile_origin_y]
(the origin lanes repeat per row — TPU block specs can't carry a [T, 2]
scalar table, so the origin rides in the record pad lanes).
Colors ride separately as [K, 4] (rgb + zero pad). Outputs [256, 4].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE


def _blend_kernel(rec_ref, col_ref, bg_ref, tri_ref, out_ref):
    # rec [1, K, 8] f32; col [1, K, 4] f32; bg [1, 4] f32; out [1, 256, 4]
    ox = rec_ref[0, 0, 6]
    oy = rec_ref[0, 0, 7]

    row = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = ox + jnp.remainder(row, TILE).astype(jnp.float32)  # x fastest
    py = oy + (row // TILE).astype(jnp.float32)

    rec = rec_ref[0]  # [K, 8]
    mx = rec[:, 0][None, :]  # [1, K]
    my = rec[:, 1][None, :]
    ca = rec[:, 2][None, :]
    cb = rec[:, 3][None, :]
    cc = rec[:, 4][None, :]
    opa = rec[:, 5][None, :]

    dx = px - mx  # [256, K]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(0.99, opa * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(alpha >= (1.0 / 255.0), alpha, 0.0)

    log1ma = jnp.log1p(-alpha)
    # inclusive prefix-sum along K as an MXU matmul (Mosaic has no cumsum):
    # csum[p, j] = sum_{i <= j} log1ma[p, i]; tri is precomputed outside
    csum = jnp.dot(log1ma, tri_ref[:, :], preferred_element_type=jnp.float32)
    t_before = jnp.exp(csum - log1ma)
    w = jnp.where(t_before >= 1e-4, alpha * t_before, 0.0)  # [256, K]

    rgb = jnp.dot(w, col_ref[0], preferred_element_type=jnp.float32)
    t_final = jnp.exp(jnp.sum(log1ma, axis=-1, keepdims=True))
    out_ref[0] = rgb + t_final * bg_ref[0, :][None, :]


@partial(jax.jit, static_argnames=("interpret",))
def blend_tiles(origins, records, colors, bg, interpret: bool = False):
    """origins [T, 2] f32; records [T, K, 8] (lanes 6/7 overwritten with the
    origin); colors [T, K, 4]; bg [4].

    Returns [T, 256, 4] blended tiles (alpha channel = garbage pad).
    """
    t, k, _ = records.shape
    records = records.at[:, :, 6:8].set(origins[:, None, :])
    bg2 = jnp.broadcast_to(bg[None, :], (1, 4)).astype(jnp.float32)
    tri = (jnp.arange(k)[:, None] <= jnp.arange(k)[None, :]).astype(jnp.float32)

    return pl.pallas_call(
        _blend_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PIX, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, PIX, 4), jnp.float32),
        interpret=interpret,
    )(records, colors, bg2, tri)
