"""Round-trip and rate tests for the native arithmetic coder."""

import numpy as np
import jax.numpy as jnp
import pytest

from gauspcc_tpu.core import cdf as cdf_lib
from gauspcc_tpu.ops import coder
from gauspcc_tpu.ops import entropy_coding as ec

pytestmark = pytest.mark.smoke


def _random_probs(rng, n, L):
    p = rng.dirichlet(np.ones(L) * 0.5, size=n).astype(np.float32)
    return p


@pytest.mark.parametrize("n,L", [(1, 2), (7, 2), (1000, 4), (50_000, 16), (3, 256)])
def test_roundtrip_random_cdf(n, L):
    rng = np.random.default_rng(n * 31 + L)
    probs = _random_probs(rng, n, L)
    sym = rng.integers(0, L, size=n).astype(np.int16)
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    stream = coder.encode_int16_cdf(table, sym)
    out = coder.decode_int16_cdf(table, stream)
    np.testing.assert_array_equal(out, sym)


def test_roundtrip_multichunk():
    rng = np.random.default_rng(0)
    n = 250_001  # forces 4 chunks at default chunk size
    probs = _random_probs(rng, 1, 8)
    probs = np.broadcast_to(probs, (n, 8))
    sym = rng.integers(0, 8, size=n).astype(np.int16)
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    stream = coder.encode_int16_cdf(table, sym)
    out = coder.decode_int16_cdf(table, stream)
    np.testing.assert_array_equal(out, sym)


def test_rate_close_to_entropy():
    """Coded size should be within a few percent of the Shannon bound."""
    rng = np.random.default_rng(42)
    n = 100_000
    p = np.array([0.7, 0.2, 0.06, 0.04], dtype=np.float32)
    sym = rng.choice(4, size=n, p=p).astype(np.int16)
    probs = np.broadcast_to(p, (n, 4))
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    stream = coder.encode_int16_cdf(table, sym)
    entropy_bits = -(p * np.log2(p)).sum() * n
    coded_bits = len(stream) * 8
    assert coded_bits < entropy_bits * 1.05
    assert coded_bits > entropy_bits * 0.95


def test_skewed_probabilities():
    """Extremely skewed CDFs must still round-trip (min prob enforced by
    the +arange normalization)."""
    n = 4096
    probs = np.zeros((n, 2), dtype=np.float32)
    probs[:, 0] = 1.0 - 1e-7
    probs[:, 1] = 1e-7
    sym = np.zeros(n, dtype=np.int16)
    sym[::97] = 1
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    stream = coder.encode_int16_cdf(table, sym)
    out = coder.decode_int16_cdf(table, stream)
    np.testing.assert_array_equal(out, sym)


def test_gaussian_file_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    n = 20_000
    mean = rng.normal(size=n).astype(np.float32)
    scale = (0.1 + rng.random(n)).astype(np.float32)
    q = np.float32(0.1)
    x_true = mean + rng.normal(size=n).astype(np.float32) * scale
    x_q = np.round(x_true / q) * q

    fn = str(tmp_path / "g.b")
    bits = ec.encode_gaussian(jnp.asarray(x_q), jnp.asarray(mean), jnp.asarray(scale), q, fn)
    assert bits > 0
    dec = np.asarray(ec.decode_gaussian(jnp.asarray(mean), jnp.asarray(scale), q, fn))
    np.testing.assert_allclose(dec, x_q, atol=1e-5)


def test_gaussian_per_element_q(tmp_path):
    rng = np.random.default_rng(8)
    n = 5_000
    mean = rng.normal(size=n).astype(np.float32)
    scale = (0.05 + rng.random(n)).astype(np.float32)
    q = (0.05 + 0.1 * rng.random(n)).astype(np.float32)
    x_q = np.round((mean + rng.normal(size=n) * scale) / q) * q

    fn = str(tmp_path / "gq.b")
    ec.encode_gaussian(jnp.asarray(x_q.astype(np.float32)), jnp.asarray(mean),
                       jnp.asarray(scale), jnp.asarray(q), fn)
    dec = np.asarray(ec.decode_gaussian(jnp.asarray(mean), jnp.asarray(scale), jnp.asarray(q), fn))
    np.testing.assert_allclose(dec, x_q, atol=1e-5, rtol=1e-5)


def test_binary_file_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    x = (rng.random(100_000) < 0.03).astype(np.float32)
    fn = str(tmp_path / "b.b")
    bits = ec.encode_binary(jnp.asarray(x), fn)
    dec = np.asarray(ec.decode_binary(x.size, fn))
    np.testing.assert_array_equal(dec, x)
    # ~0.03-entropy binary source: ~0.194 bits/sym; allow generous slack
    assert bits < 0.25 * x.size


def test_mixture_file_roundtrip(tmp_path):
    rng = np.random.default_rng(10)
    n = 8_000
    means = [rng.normal(size=n).astype(np.float32) for _ in range(2)]
    scales = [(0.1 + rng.random(n)).astype(np.float32) for _ in range(2)]
    w = rng.random(n).astype(np.float32)
    probs = [w, 1.0 - w]
    q = np.float32(0.2)
    x_q = np.round((means[0] + rng.normal(size=n).astype(np.float32)) / q) * q
    fn = str(tmp_path / "m.b")
    ec.encode_gaussian_mixed(jnp.asarray(x_q), means, scales, probs, q, fn)
    dec = np.asarray(ec.decode_gaussian_mixed(means, scales, probs, q, fn))
    np.testing.assert_allclose(dec, x_q, atol=1e-5)


def test_empty_input(tmp_path):
    fn = str(tmp_path / "e.b")
    ec.encode_gaussian(jnp.zeros(0), jnp.zeros(0), jnp.ones(0), 1.0, fn)
    dec = ec.decode_gaussian(jnp.zeros(0), jnp.ones(0), 1.0, fn)
    assert dec.shape == (0,)


def test_factorized_file_roundtrip(tmp_path):
    import jax
    from gauspcc_tpu.core import entropy as entropy_lib

    rng = np.random.default_rng(12)
    c = 6
    params = entropy_lib.init_factorized_params(jax.random.PRNGKey(0), channels=c)
    n = 4000
    q = 0.5
    x_q = np.round(rng.normal(0, 2.0, (n, c)) / q) * q
    fn = str(tmp_path / "f.b")
    bits = ec.encode_factorized(params, jnp.asarray(x_q.astype(np.float32)), q, fn)
    assert bits > 0
    dec = np.asarray(ec.decode_factorized(params, n, c, q, fn))
    np.testing.assert_allclose(dec, x_q, atol=1e-4)


def test_incremental_decoder_matches_batch():
    rng = np.random.default_rng(13)
    n = 150_000  # crosses chunk boundaries
    probs = _random_probs(rng, n, 8)
    sym = rng.integers(0, 8, size=n).astype(np.int16)
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    stream = coder.encode_int16_cdf(table, sym)

    dec = coder.IncrementalDecoder(stream, n)
    outs = []
    pos = 0
    rng2 = np.random.default_rng(14)
    while pos < n:
        step = min(int(rng2.integers(1, 7000)), n - pos)
        outs.append(dec.decode(table[pos:pos + step]))
        pos += step
    dec.close()
    np.testing.assert_array_equal(np.concatenate(outs), sym)


def test_gauss_model_coder_roundtrip_and_rate():
    """Native model-based coder (CDF evaluated in C++ from mu/sigma) must
    round-trip exactly and match the table path's rate within a few %."""
    from gauspcc_tpu.ops import coder as coder_lib

    rng = np.random.default_rng(0)
    n = 20_000
    mu = rng.normal(0, 0.3, n).astype(np.float32)
    sig = rng.uniform(0.5, 4.0, n).astype(np.float32)
    res = np.round(rng.normal(0, 1, n) * sig + mu).astype(np.int32)
    rmin, rmax = int(res.min()), int(res.max())
    syms = (res - rmin).astype(np.int16)
    stream = coder_lib.encode_gauss(mu, sig, syms, rmin, rmax)
    out = coder_lib.decode_gauss(mu, sig, stream, rmin, rmax)
    np.testing.assert_array_equal(out, syms)
    # entropy sanity: ~log2(sig)+2 bits/sym expected; assert no blow-up
    bits = len(stream) * 8
    assert bits < n * 6.0


def test_gauss_mixture_coder_roundtrip():
    from gauspcc_tpu.ops import coder as coder_lib

    rng = np.random.default_rng(1)
    n = 5000
    mu = rng.normal(0, 2.0, (n, 2)).astype(np.float32)
    sig = rng.uniform(0.5, 3.0, (n, 2)).astype(np.float32)
    w = rng.dirichlet([1, 1], n).astype(np.float32)
    res = np.round(rng.normal(0, 2.5, n)).astype(np.int32)
    rmin, rmax = int(res.min()), int(res.max())
    syms = (res - rmin).astype(np.int16)
    stream = coder_lib.encode_gauss(mu, sig, syms, rmin, rmax, w=w)
    out = coder_lib.decode_gauss(mu, sig, stream, rmin, rmax, w=w)
    np.testing.assert_array_equal(out, syms)


def test_gauss_coder_outlier_range():
    """A single huge-residual outlier must not break coding (this is the
    scenario that made the table path transfer tens of MB)."""
    from gauspcc_tpu.ops import coder as coder_lib

    rng = np.random.default_rng(2)
    n = 3000
    mu = np.zeros(n, np.float32)
    sig = np.full(n, 1.0, np.float32)
    res = np.round(rng.normal(0, 1, n)).astype(np.int32)
    res[1234] = 5000  # outlier widens the symbol range to ~5000 columns
    rmin, rmax = int(res.min()), int(res.max())
    syms = (res - rmin).astype(np.int16)
    stream = coder_lib.encode_gauss(mu, sig, syms, rmin, rmax)
    out = coder_lib.decode_gauss(mu, sig, stream, rmin, rmax)
    np.testing.assert_array_equal(out, syms)
