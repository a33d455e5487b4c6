"""Sparse voxel op tests: pyramid round-trip, neighbor maps vs brute force,
sparse conv vs dense conv."""

import numpy as np
import jax.numpy as jnp

from gauspcc_tpu.ops import sparse


def _random_voxels(rng, n, extent=32):
    pts = rng.integers(0, extent, size=(n * 2, 3))
    return np.unique(pts, axis=0)[:n].astype(np.int32)


def test_pyramid_fcg_roundtrip():
    rng = np.random.default_rng(0)
    coords = _random_voxels(rng, 500)
    levels = sparse.build_occupancy_pyramid(coords, min_points=4)

    # walking the pyramid down via fcg_expand must reproduce the input set
    cur_coords, cur_occ = levels[0]
    for lvl in range(len(levels)):
        c = jnp.asarray(levels[lvl][0])
        o = jnp.asarray(levels[lvl][1].astype(np.int32))
        m = jnp.ones(c.shape[0], bool)
        child, child_mask, octant, parent_idx = sparse.fcg_expand(c, o, m)
        child_np = np.asarray(child)[np.asarray(child_mask)]
        if lvl + 1 < len(levels):
            expect = levels[lvl + 1][0]
        else:
            expect = coords
        got = set(map(tuple, child_np.tolist()))
        want = set(map(tuple, expect.tolist()))
        assert got == want, f"level {lvl}"


def test_pyramid_counts_monotone():
    rng = np.random.default_rng(1)
    coords = _random_voxels(rng, 2000, extent=64)
    levels = sparse.build_occupancy_pyramid(coords, min_points=64)
    sizes = [c.shape[0] for c, _ in levels]
    assert all(sizes[i] <= sizes[i + 1] for i in range(len(sizes) - 1))
    assert sizes[0] < 64


def test_occupancy_bits_match_octants():
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 1], [3, 3, 3]], np.int32)
    levels = sparse.build_occupancy_pyramid(coords, min_points=1)
    pc, occ = levels[-1]
    lookup = {tuple(c): o for c, o in zip(pc.tolist(), occ.tolist())}
    # parent (0,0,0): children octants 0 (000) and 1 (100) and 6 (011)
    assert lookup[(0, 0, 0)] == (1 << 0) | (1 << 1) | (1 << 6)
    assert lookup[(1, 1, 1)] == 1 << 7


def test_neighbor_map_vs_bruteforce():
    rng = np.random.default_rng(2)
    src = _random_voxels(rng, 300, extent=16)
    k = 5
    npad = 384
    coords = np.zeros((npad, 3), np.int32)
    coords[: src.shape[0]] = src
    mask = np.zeros(npad, bool)
    mask[: src.shape[0]] = True

    nmap = sparse.build_neighbor_map(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(coords), jnp.asarray(mask), k
    )
    idx = np.asarray(nmap.idx)
    valid = np.asarray(nmap.valid)

    offs = sparse.kernel_offsets(k)
    table = {tuple(c): i for i, c in enumerate(src.tolist())}
    for kk in range(0, k**3, 7):
        for qi in range(src.shape[0]):
            want = table.get(tuple((src[qi] + offs[kk]).tolist()), None)
            if want is None:
                assert not valid[kk, qi]
            else:
                assert valid[kk, qi] and idx[kk, qi] == want
    # padded queries never valid
    assert not valid[:, src.shape[0]:].any()


def test_sparse_conv_matches_dense():
    rng = np.random.default_rng(3)
    extent, cin, cout, k = 8, 3, 4, 3
    src = _random_voxels(rng, 60, extent=extent)
    n = src.shape[0]
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    weight = rng.normal(size=(k**3, cin, cout)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    mask = np.ones(n, bool)
    nmap = sparse.build_neighbor_map(
        jnp.asarray(src), jnp.asarray(mask), jnp.asarray(src), jnp.asarray(mask), k
    )
    out = np.asarray(
        sparse.sparse_conv_apply(jnp.asarray(feats), nmap, jnp.asarray(weight), jnp.asarray(bias))
    )

    # dense reference: scatter into a grid, correlate, read back at sites
    grid = np.zeros((extent + 4, extent + 4, extent + 4, cin), np.float32)
    for i, c in enumerate(src):
        grid[c[0] + 2, c[1] + 2, c[2] + 2] = feats[i]
    offs = sparse.kernel_offsets(k)
    expect = np.zeros((n, cout), np.float32)
    for i, c in enumerate(src):
        acc = np.zeros(cout, np.float32)
        for kk, d in enumerate(offs):
            # submanifold: neighbor contributes only if it is an active site
            nb = tuple(c + d)
            if nb in set(map(tuple, src.tolist())):
                acc += grid[nb[0] + 2, nb[1] + 2, nb[2] + 2] @ weight[kk]
        expect[i] = acc + bias
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_morton_order_matches_reference_semantics():
    rng = np.random.default_rng(4)
    xyz = rng.integers(-40, 40, size=(500, 3))
    order = sparse.morton_order_np(xyz)
    s = xyz[order]
    # sorted by (z, y, x) lexicographic
    key = (s[:, 2].astype(np.int64) * 10**10 + s[:, 1] * 10**5 + s[:, 0])
    assert (np.diff(key) >= 0).all()


def test_lex_sort_padding_at_end():
    coords = jnp.asarray(np.array([[2, 0, 0], [0, 0, 0], [1, 1, 1]], np.int32))
    padded = jnp.concatenate([coords, jnp.zeros((2, 3), jnp.int32)])
    mask = jnp.asarray([True, True, True, False, False])
    perm = sparse.lex_sort(padded, mask)
    out = np.asarray(padded[perm])
    np.testing.assert_array_equal(out[:3], [[0, 0, 0], [2, 0, 0], [1, 1, 1]])
    assert not np.asarray(mask[perm])[3:].any()


def test_pack_expand_lo_exact():
    """u8-delta lo packing must reconstruct bit-exactly, including
    non-monotone / negative garbage beyond the valid prefix."""
    rng = np.random.default_rng(0)
    k2, cap = 9, 1000
    lo = np.sort(rng.integers(0, 5000, (k2, cap)), axis=1).astype(np.int32)
    lo[:, 700:] = rng.integers(-3, 4, (k2, 300))  # pad garbage
    lo[2, 100] = 200_000  # big jump -> exception
    base, off, exc_pos, exc_val = sparse.pack_lo_np(lo)
    assert off.dtype == np.uint8
    out = np.asarray(sparse.expand_lo(
        sparse.PackedLo(jnp.asarray(base), jnp.asarray(off),
                        jnp.asarray(exc_pos), jnp.asarray(exc_val)), cap))
    np.testing.assert_array_equal(out, lo)
