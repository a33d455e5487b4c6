"""Unit tests for quantizers, entropy models, and CDF utilities."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import cdf as cdf_lib
from gauspcc_tpu.core import entropy, quant

pytestmark = pytest.mark.smoke


def test_ste_binary_values_and_grad():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    y = quant.ste_binary(x)
    np.testing.assert_array_equal(np.asarray(y), [-1, -1, 1, 1, 1])
    g = jax.grad(lambda v: jnp.sum(quant.ste_binary(v) * jnp.arange(5.0)))(x)
    # gradient masked outside [-1, 1]
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 2.0, 3.0, 4.0 * 0])


def test_ste_multistep_roundtrip():
    x = jnp.array([0.31, -0.26, 1.04])
    q = jnp.float32(0.1)
    y = quant.ste_multistep(x, q, jnp.mean(x))
    np.testing.assert_allclose(np.asarray(y), [0.3, -0.3, 1.0], atol=1e-6)
    g = jax.grad(lambda v: jnp.sum(quant.ste_multistep(v, q, jnp.mean(v))))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(3), atol=1e-6)


def test_quantize_anchor_bounds():
    a = jnp.array([[0.0, 0.5, 1.0]])
    min_v = jnp.zeros((1, 3))
    max_v = jnp.ones((1, 3))
    aq, qv = quant.quantize_anchor(a, min_v, max_v)
    assert np.asarray(qv).min() >= 0
    assert np.asarray(qv).max() <= 2**quant.ANCHOR_ROUND_DIGITS - 1
    np.testing.assert_allclose(np.asarray(aq), np.asarray(a), atol=1e-3)


def test_gaussian_bits_matches_closed_form():
    # wide bins around the mean: likelihood ~ Phi(.5)-Phi(-.5)
    x = jnp.zeros(100)
    mean = jnp.zeros(100)
    scale = jnp.ones(100)
    bits = entropy.gaussian_bits(x, mean, scale, q=1.0, x_mean=jnp.float32(0.0))
    from scipy.stats import norm  # scipy ships with the image

    expected = -np.log2(norm.cdf(0.5) - norm.cdf(-0.5))
    np.testing.assert_allclose(np.asarray(bits), expected, rtol=1e-5)


def test_gaussian_bits_gradients_finite():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64,))
    f = lambda m, s: jnp.sum(entropy.gaussian_bits(x, m, s, 0.1, jnp.float32(0.0)))
    gm, gs = jax.grad(f, argnums=(0, 1))(jnp.zeros(64), jnp.ones(64))
    assert np.isfinite(np.asarray(gm)).all()
    assert np.isfinite(np.asarray(gs)).all()


def test_bernoulli_bits():
    x = jnp.array([1.0, -1.0])
    p = jnp.array([0.9, 0.9])
    bits = entropy.bernoulli_bits(x, p)
    np.testing.assert_allclose(
        np.asarray(bits), [-np.log2(0.9), -np.log2(0.1)], rtol=1e-5
    )


def test_binary_size_bits():
    x = jnp.array([1.0, 1.0, 0.0, 0.0])
    p1, bits = entropy.binary_size_bits(x)
    assert abs(float(p1) - 0.5) < 1e-6
    np.testing.assert_allclose(float(bits), 4.0 + 32.0, rtol=1e-5)


def test_factorized_model_runs_and_differentiates():
    params = entropy.init_factorized_params(jax.random.PRNGKey(1), channels=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 8))
    bits = entropy.factorized_bits(params, x, q=1.0)
    assert bits.shape == (32, 8)
    assert np.isfinite(np.asarray(bits)).all()
    g = jax.grad(lambda p: jnp.sum(entropy.factorized_bits(p, x, 1.0)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_normalize_cdf_monotone():
    rng = np.random.default_rng(3)
    probs = rng.dirichlet(np.ones(16), size=100).astype(np.float32)
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs))).astype(np.uint16)
    # strictly increasing over the first Lp-1 entries
    diffs = np.diff(table[:, :-1].astype(np.int64), axis=1)
    assert (diffs > 0).all()


def test_gaussian_cdf_table_bounds():
    mean = jnp.zeros(10)
    scale = jnp.ones(10) * 0.5
    q = jnp.ones(10)
    t = np.asarray(cdf_lib.gaussian_cdf_table(mean, scale, q, -5, 5))
    assert t.shape == (10, 12)
    diffs = np.diff(t[:, :-1].astype(np.int64), axis=1)
    assert (diffs > 0).all()


def test_low_bound_gradient_semantics():
    g = jax.grad(lambda v: jnp.sum(entropy.low_bound(v) * jnp.array([1.0, 1.0, -1.0])))(
        jnp.array([1e-9, 0.5, 1e-9])
    )
    # below-bound with positive upstream grad: blocked; negative upstream: passes
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, -1.0])
