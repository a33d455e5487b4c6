"""Host (C++) voxel-geometry builder vs the device reference implementation:
neighbor maps and child expansion must agree exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from gauspcc_tpu.ops import hostmap, sparse


def _sorted_unique_coords(rng, n, span):
    pts = rng.integers(0, span, size=(n, 3)).astype(np.int32)
    pts = np.unique(pts, axis=0)
    order = np.lexsort((pts[:, 0], pts[:, 1], pts[:, 2]))
    return pts[order]


@pytest.mark.slow
def test_build_map_matches_device():
    rng = np.random.default_rng(0)
    for span, k in [(12, 3), (20, 5), (6, 5)]:
        coords = _sorted_unique_coords(rng, 600, span)
        n = coords.shape[0]
        ncap = n + 37
        padded = np.zeros((ncap, 3), np.int32)
        padded[:n] = coords
        mask = np.zeros(ncap, bool)
        mask[:n] = True

        host = hostmap.build_map(coords, n, k, ncap)
        dev = sparse.build_neighbor_map(
            jnp.asarray(padded), jnp.asarray(mask),
            jnp.asarray(padded), jnp.asarray(mask), k)
        dev_idx = np.where(np.asarray(dev.valid), np.asarray(dev.idx), -1)
        np.testing.assert_array_equal(host, dev_idx)


def test_build_map_self_tap_is_identity():
    rng = np.random.default_rng(1)
    coords = _sorted_unique_coords(rng, 400, 15)
    n = coords.shape[0]
    k = 5
    idx = hostmap.build_map(coords, n, k)
    center = (k**3) // 2
    np.testing.assert_array_equal(idx[center], np.arange(n))


def test_expand_children_matches_device():
    rng = np.random.default_rng(2)
    pcoords = _sorted_unique_coords(rng, 300, 10)
    np_ = pcoords.shape[0]
    pocc = rng.integers(1, 256, np_).astype(np.uint8)
    ccap = int(np.unpackbits(pocc[:, None], axis=1).sum()) + 13

    cc, octant, pidx, n = hostmap.expand_children(pcoords, pocc, ccap)
    assert n == int(np.unpackbits(pocc[:, None], axis=1).sum())

    # device reference: fcg_expand + lex_sort valid prefix
    cap = pcoords.shape[0]
    child, cmask, oct_d, pidx_d = sparse.fcg_expand(
        jnp.asarray(pcoords), jnp.asarray(pocc.astype(np.int32)),
        jnp.ones(cap, bool))
    perm = sparse.lex_sort(child, cmask)
    child = np.asarray(child[perm])[:n]
    np.testing.assert_array_equal(cc[:n], child)
    np.testing.assert_array_equal(octant[:n], np.asarray(oct_d[perm])[:n])
    np.testing.assert_array_equal(pidx[:n], np.asarray(pidx_d[perm])[:n])
    assert (pidx[n:] == -1).all()


def test_expand_children_overflow_raises():
    pcoords = np.array([[0, 0, 0]], np.int32)
    pocc = np.array([255], np.uint8)
    try:
        hostmap.expand_children(pcoords, pocc, 4)
        assert False, "expected overflow"
    except ValueError:
        pass
