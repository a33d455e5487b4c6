"""Train-time entropy models (differentiable bit estimators) in JAX.

Parity targets: HAC/utils/entropy_models.py (Entropy_gaussian :30-50,
Entropy_bernoulli :53-64, Entropy_factorized :67-138, Low_bound :141-156)
and HAC-plus/utils/entropy_models.py:52-125 (Gaussian mixtures).

All functions return per-element bits; callers sum/normalize.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gauspcc_tpu.core.quant import USE_CLAMP, CLAMP_STEPS

_LOG2 = math.log(2.0)
_LIKELIHOOD_BOUND = 1e-6


@jax.custom_vjp
def low_bound(x: jax.Array) -> jax.Array:
    """clamp(x, min=1e-6); gradient passes when x >= bound or when g pushes
    the value up (g < 0), matching Low_bound.backward."""
    return jnp.maximum(x, _LIKELIHOOD_BOUND)


def _low_bound_fwd(x):
    return low_bound(x), (x,)


def _low_bound_bwd(res, g):
    (x,) = res
    pass_through = jnp.logical_or(x >= _LIKELIHOOD_BOUND, g < 0.0)
    return (g * pass_through.astype(g.dtype),)


low_bound.defvjp(_low_bound_fwd, _low_bound_bwd)


def _normal_cdf(x, mean, scale):
    return 0.5 * jax.lax.erfc(-(x - mean) / (scale * jnp.sqrt(jnp.float32(2.0))))


def gaussian_bits(x, mean, scale, q=1.0, x_mean=None):
    """Bits of the quantized-Gaussian likelihood of x (Entropy_gaussian)."""
    if USE_CLAMP:
        if x_mean is None:
            x_mean = jnp.mean(x)
        lo = jax.lax.stop_gradient(x_mean - CLAMP_STEPS * q)
        hi = jax.lax.stop_gradient(x_mean + CLAMP_STEPS * q)
        x = jnp.clip(x, lo, hi)
    scale = jnp.maximum(scale, 1e-9)
    likelihood = jnp.abs(
        _normal_cdf(x + 0.5 * q, mean, scale) - _normal_cdf(x - 0.5 * q, mean, scale)
    )
    return -jnp.log2(low_bound(likelihood))


def gaussian_mixture_bits(x, means, scales, probs, q=1.0, x_mean=None):
    """Bits under a softmax-weighted Gaussian mixture (HAC++ entropy)."""
    if USE_CLAMP:
        if x_mean is None:
            x_mean = jnp.mean(x)
        lo = jax.lax.stop_gradient(x_mean - CLAMP_STEPS * q)
        hi = jax.lax.stop_gradient(x_mean + CLAMP_STEPS * q)
        x = jnp.clip(x, lo, hi)
    likelihood = 0.0
    for mean, scale, prob in zip(means, scales, probs):
        scale = jnp.maximum(scale, 1e-9)
        likelihood = likelihood + prob * jnp.abs(
            _normal_cdf(x + 0.5 * q, mean, scale) - _normal_cdf(x - 0.5 * q, mean, scale)
        )
    return -jnp.log2(low_bound(likelihood))


def bernoulli_bits(x, p):
    """Bits for x in {-1, +1} under P(+1) = p (Entropy_bernoulli)."""
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    pos_mask = (1.0 + x) / 2.0
    neg_mask = (1.0 - x) / 2.0
    return -jnp.log2(p) * pos_mask + -jnp.log2(1.0 - p) * neg_mask


def binary_size_bits(binary01: jax.Array):
    """Global-p1 binary entropy size estimate (encodings.py:16-33
    get_binary_vxl_size). Returns (p1, total_bits) with +32 for storing p1."""
    total = binary01.size
    pos = jnp.sum(binary01)
    p1 = jnp.clip(pos / total, 1e-6, 1.0 - 1e-6)
    bits = pos * (-jnp.log2(p1)) + (total - pos) * (-jnp.log2(1.0 - p1)) + 32.0
    return p1, bits


# ---------------------------------------------------------------------------
# Fully-factorized (Balle) entropy model.
# ---------------------------------------------------------------------------

def init_factorized_params(key, channels: int, filters=(3, 3, 3), init_scale=10.0):
    """Parameter pytree for the factorized model (Entropy_factorized.__init__)."""
    dims = (1,) + tuple(int(f) for f in filters) + (1,)
    scale = init_scale ** (1.0 / (len(filters) + 1))
    matrices, biases, factors = [], [], []
    for i in range(len(filters) + 1):
        init = math.log(math.expm1(1.0 / scale / dims[i + 1]))
        matrices.append(jnp.full((channels, dims[i + 1], dims[i]), init, jnp.float32))
        key, sub = jax.random.split(key)
        biases.append(jax.random.uniform(sub, (channels, dims[i + 1], 1), jnp.float32, -0.5, 0.5))
        if i < len(filters):
            factors.append(jnp.zeros((channels, dims[i + 1], 1), jnp.float32))
    return {"matrices": matrices, "biases": biases, "factors": factors}


def factorized_logits_cumulative(params, logits):
    """logits: [C, 1, N] -> [C, 1, N] (monotone per-channel scalar flow)."""
    n_layers = len(params["matrices"])
    for i in range(n_layers):
        matrix = jax.nn.softplus(params["matrices"][i])
        logits = jnp.matmul(matrix, logits)
        logits = logits + params["biases"][i]
        if i < len(params["factors"]):
            logits = logits + jnp.tanh(params["factors"][i]) * jnp.tanh(logits)
    return logits


def factorized_bits(params, x, q=1.0):
    """x: [N, C] quantized values -> per-element bits [N, C]."""
    xt = x.T[:, None, :]  # [C, 1, N]
    if isinstance(q, jax.Array) and q.ndim == 2:
        qt = q.T[:, None, :]
    else:
        qt = q
    lower = factorized_logits_cumulative(params, xt - 0.5 * (1.0 / qt))
    upper = factorized_logits_cumulative(params, xt + 0.5 * (1.0 / qt))
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    likelihood = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    bits = -jnp.log2(low_bound(likelihood))
    return bits[:, 0, :].T
