"""Hash-grid encoder unit tests vs manual interpolation with the
reference's border-exclusion + renormalization semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.quant import ste_binary
from gauspcc_tpu.fields import hashgrid


def _manual_encode(table, res, x, n_feat):
    """Single-level dense-grid manual reference (gridencoder.cu semantics)."""
    out = np.zeros((x.shape[0], n_feat), np.float32)
    for n in range(x.shape[0]):
        if np.any((x[n] < 0) | (x[n] > 1)):
            continue
        pos = x[n] * (res - 2) + 0.5
        base = np.floor(pos).astype(int)
        frac = pos - base
        acc = np.zeros(n_feat)
        wn = 0.0
        for idx in range(2 ** x.shape[1]):
            w = 1.0
            corner = []
            for d in range(x.shape[1]):
                if (idx >> d) & 1:
                    w *= frac[d]
                    corner.append(min(base[d] + 1, res - 1))
                else:
                    w *= 1 - frac[d]
                    corner.append(base[d])
            if any(c == 0 or c == res - 1 for c in corner):
                continue
            flat = sum(c * res**k for k, c in enumerate(corner))
            acc += w * table[flat]
            wn += w
        out[n] = acc / (wn + 1e-9)
    return out


def test_dense_3d_level_matches_manual():
    rng = np.random.default_rng(0)
    res = 8
    spec = hashgrid.make_spec(3, 2, (res,), log2_hashmap_size=12)
    table = rng.normal(size=(spec.n_rows, 2)).astype(np.float32)
    x = rng.random((50, 3)).astype(np.float32)
    got = np.asarray(hashgrid.encode(spec, jnp.asarray(table), jnp.asarray(x)))
    want = _manual_encode(table, res, x, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_bounds_zero():
    spec = hashgrid.make_spec(3, 2, (8,), 12)
    table = jnp.ones((spec.n_rows, 2))
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
    out = np.asarray(hashgrid.encode(spec, table, x))
    np.testing.assert_allclose(out, 0.0)


def test_hashed_level_in_range_and_differentiable():
    spec = hashgrid.make_spec(3, 2, (64,), log2_hashmap_size=8)  # forces hash
    assert spec.offsets[1] - spec.offsets[0] < 64**3
    table = hashgrid.init_table(jax.random.PRNGKey(0), spec, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
    out = hashgrid.encode(spec, table, x)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda t: jnp.sum(hashgrid.encode(spec, t, x) ** 2))(table)
    assert float(jnp.abs(g).max()) > 0


def test_mixed_encode_output_dim_and_serialization():
    spec = hashgrid.make_mixed_spec(
        n_features=2, resolutions_3d=(6, 10), log2_hashmap_size=12,
        resolutions_2d=(16,), log2_hashmap_size_2d=12)
    tables = hashgrid.init_mixed_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3))
    out = hashgrid.mixed_encode(spec, tables, x)
    assert out.shape == (10, spec.output_dim)
    flat = hashgrid.flat_tables(tables)
    back = hashgrid.unflatten_tables(spec, flat)
    for k in tables:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tables[k]))


def test_binarized_lookup_uses_signs():
    spec = hashgrid.make_mixed_spec(
        n_features=2, resolutions_3d=(6,), log2_hashmap_size=12,
        resolutions_2d=(8,), log2_hashmap_size_2d=12)
    tables = hashgrid.init_mixed_tables(jax.random.PRNGKey(2), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (20, 3))
    out_bin = hashgrid.mixed_encode(spec, tables, x, binarize=True)
    signed = {k: ste_binary(v) for k, v in tables.items()}
    out_signed = hashgrid.mixed_encode(spec, signed, x, binarize=True)
    np.testing.assert_allclose(np.asarray(out_bin), np.asarray(out_signed),
                               atol=1e-6)


def test_binary_vxl_masking():
    """Corners with empty Rb-windows are excluded and weights renormalize
    (gridencoder.cu:266-340 binary_vxl path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gauspcc_tpu.fields import hashgrid as hg

    spec = hg.make_spec(num_dim=3, n_features=2, resolutions=(8, 16),
                        log2_hashmap_size=12)
    table = hg.init_table(jax.random.PRNGKey(0), spec, std=0.5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 3)).astype(np.float32))

    full = jnp.ones((16, 16, 16), jnp.float32)
    empty = jnp.zeros((16, 16, 16), jnp.float32)
    out_none = hg.encode(spec, table, x)
    out_full = hg.encode(spec, table, x, binary_vxl=full)
    out_empty = hg.encode(spec, table, x, binary_vxl=empty)
    # fully-occupied occupancy grid == no mask
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_none),
                               rtol=1e-6)
    # fully-empty grid kills every corner -> zero features
    assert float(jnp.abs(out_empty).max()) == 0.0

    # half-occupied: outputs differ from unmasked but stay finite
    half = jnp.zeros((16, 16, 16), jnp.float32).at[:8].set(1.0)
    out_half = hg.encode(spec, table, x, binary_vxl=half)
    assert np.isfinite(np.asarray(out_half)).all()
    assert float(jnp.abs(out_half - out_none).max()) > 0.0
