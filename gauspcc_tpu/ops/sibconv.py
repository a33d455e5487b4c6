"""Sibling-packed submanifold sparse conv — the TPU-shaped form of the
codec's k^3 voxel convolutions.

The generic gather-MM conv (ops/sparse.py sparse_conv_apply) gathers
k^3 = 125 scattered 64-byte rows per voxel; on a v5e that gather runs at
~440M rows/s and dominates the training step (measured: 64 ms forward /
7.5 s grad for one finest-level conv at 147k voxels — the grad adds a
serialized scatter for the gather transpose). This module restructures
the SAME convolution (same weights, same receptive field, equal outputs
at valid voxels) around the dyadic pyramid's sibling structure:

  * voxels are packed by parent cell into groups of 8 octant slots
    (x [G, 8, C], empty slots zero);
  * a voxel's k=5 neighborhood spans exactly the 27 parent cells around
    its own parent (child 2p+o+d, d in [-2,2]^3 -> parent p + floor((o+d)/2)
    in p + [-1,1]^3), and all 8 siblings share it;
  * so the conv is: gather 27 rows of 8C floats per GROUP (512-byte rows,
    37x fewer rows than per-voxel taps), then ONE [G, 216*C] x [216*C, 8*C]
    MXU matmul against a weight matrix Wmat assembled from w by a constant
    index table.

The backward pass is scatter-free by construction: the gather transpose
over the group map is itself a 27-neighborhood gather with the flipped
map (group g' receives from g = g' + flip(e)), and dW is one matmul over
the re-gathered input. Replaces the reference's torchsparse spnn.Conv3d
(GausPcgc/kit/nn.py:9-22) on the training/codec hot path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def sib_pos_np(coords: np.ndarray, groups: np.ndarray) -> np.ndarray:
    """Packed row (group_row*8 + octant) of each voxel (host, numpy).

    coords int [N, 3] lex-sorted; groups int [G, 3] lex-sorted unique,
    covering every coords>>1."""
    c = np.asarray(coords, np.int64)
    g = np.asarray(groups, np.int64)
    dims = g.max(axis=0) + 1
    gkey = (g[:, 2] * dims[1] + g[:, 1]) * dims[0] + g[:, 0]
    parent = c >> 1
    ckey = (parent[:, 2] * dims[1] + parent[:, 1]) * dims[0] + parent[:, 0]
    gidx = np.searchsorted(gkey, ckey)
    oct_ = (c[:, 0] & 1) + 2 * (c[:, 1] & 1) + 4 * (c[:, 2] & 1)
    return gidx * 8 + oct_


@lru_cache(maxsize=8)
def tap_table(kernel_size: int) -> np.ndarray:
    """Constant index table TIDX [27, 8, 8] int32: TIDX[e, s, o] = kernel
    tap t hitting (neighbor-group e, sibling slot s) for an output voxel
    of octant o, or -1 (no tap lands there).

    Conventions (must match the rest of the stack):
      tap t = ((dz+r)*k + (dy+r))*k + (dx+r)   (native/neighbor.cpp:17)
      octant o = (x&1) + 2*(y&1) + 4*(z&1)     (nm_children OFF table)
      e = ((ez+1)*3 + (ey+1))*3 + (ex+1)       (= nm_build tap order, k=3)
    """
    k = kernel_size
    r = k // 2
    assert k <= 5, "sibling packing assumes kernel radius <= 2 (27 groups)"
    tidx = np.full((27, 8, 8), -1, np.int32)
    for o in range(8):
        ob = (o & 1, (o >> 1) & 1, (o >> 2) & 1)  # (ox, oy, oz)
        for t in range(k**3):
            d = (t % k - r, (t // k) % k - r, t // (k * k) - r)  # (dx,dy,dz)
            ex, ey, ez = ((ob[i] + d[i]) >> 1 for i in range(3))
            sx, sy, sz = ((ob[i] + d[i]) & 1 for i in range(3))
            e = ((ez + 1) * 3 + (ey + 1)) * 3 + (ex + 1)
            s = sx + 2 * sy + 4 * sz
            assert tidx[e, s, o] == -1
            tidx[e, s, o] = t
    return tidx


def _wmat(w: jax.Array, kernel_size: int, dtype) -> jax.Array:
    """Assemble the big conv matrix [27*8*Cin, 8*Cout] from w [k^3,Cin,Cout].

    Rows ordered (e, s, cin) to match the gathered input layout; cols
    (o, cout). Plain gather from a zero-padded w, so autodiff yields a
    tiny unique-index scatter for dW."""
    k3, cin, cout = w.shape
    tidx = jnp.asarray(tap_table(kernel_size))  # [27, 8, 8]
    wpad = jnp.concatenate(
        [w.astype(dtype), jnp.zeros((1, cin, cout), dtype)], axis=0)
    blocks = wpad[tidx]  # [27, 8, 8, Cin, Cout]
    return blocks.transpose(0, 1, 3, 2, 4).reshape(27 * 8 * cin, 8 * cout)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _core(x2, wmat, gmaps, cin: int):
    """y2 [G, 8*Cout] = packed conv; gmaps = (gmapT [G,27], gmapfT [G,27])
    with -1 = absent neighbor group. Scatter-free custom VJP."""
    y2, _ = _core_fwd(x2, wmat, gmaps, cin)
    return y2


def _gather27(x2, gmapT):
    g = jnp.clip(gmapT, 0)
    out = x2[g]  # [G, 27, 8C]
    return jnp.where((gmapT >= 0)[:, :, None], out, 0)


def _core_fwd(x2, wmat, gmaps, cin: int):
    gmapT, _ = gmaps
    gsz = x2.shape[0]
    xg = _gather27(x2, gmapT).reshape(gsz, 27 * 8 * cin)
    y2 = jnp.dot(xg, wmat, preferred_element_type=jnp.float32)
    y2 = y2.astype(x2.dtype)
    return y2, (x2, wmat, gmaps)


def _core_bwd(cin: int, res, dy2):
    x2, wmat, gmaps = res
    gmapT, gmapfT = gmaps
    gsz = x2.shape[0]
    cout8 = wmat.shape[1]
    dy2 = dy2.astype(x2.dtype)
    # dX: gather dy with the FLIPPED map, matmul against the e-transposed
    # weight: dx2[h] = sum_e dy2[gmap[flip e, h]] @ Wmat_e^T
    dyg = _gather27(dy2, gmapfT)  # [G, 27, 8Cout]
    wback = wmat.reshape(27, 8 * cin, cout8).transpose(0, 2, 1).reshape(
        27 * cout8, 8 * cin)
    dx2 = jnp.dot(dyg.reshape(gsz, 27 * cout8), wback,
                  preferred_element_type=jnp.float32).astype(x2.dtype)
    # dW: one matmul over the re-gathered forward input (recompute beats
    # keeping the [G, 216C] buffer alive across the whole stack)
    xg = _gather27(x2, gmapT).reshape(gsz, 27 * 8 * cin)
    dwmat = jnp.dot(xg.T, dy2, preferred_element_type=jnp.float32).astype(
        wmat.dtype)
    return dx2, dwmat, None


_core.defvjp(_core_fwd, _core_bwd)


def sibconv_apply(x, gmapT, gmapfT, w, bias=None, *, slotmask=None):
    """Packed sparse conv.

    x: [G*8, Cin] packed features (empty slots MUST be zero).
    gmapT/gmapfT: [G, 27] int32 group neighbor map and its flip
    (gmapfT = gmapT[:, ::-1] only if built from the same map — pass both
    to let callers precompute once).
    w: [k^3, Cin, Cout]; bias [Cout].
    slotmask: [G*8] bool; when given, output rows at empty slots are
    zeroed (keeps the packed-invariant for the next conv).
    Returns [G*8, Cout] in x.dtype.
    """
    k3, cin, cout = w.shape
    k = round(k3 ** (1 / 3))
    gsz = gmapT.shape[0]
    wmat = _wmat(w, k, x.dtype)
    y2 = _core(x.reshape(gsz, 8 * cin), wmat, (gmapT, gmapfT), cin)
    y = y2.reshape(gsz * 8, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if slotmask is not None:
        y = jnp.where(slotmask[:, None], y, 0)
    return y
