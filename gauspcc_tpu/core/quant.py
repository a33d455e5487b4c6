"""Straight-through quantizers (JAX custom_vjp versions).

Parity targets in the reference: HAC/utils/encodings.py:35-89
(STE_binary, STE_multistep, Quantize_anchor) and the train-time uniform
noise injection in HAC/gaussian_renderer/__init__.py:51-71.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR_ROUND_DIGITS = 16
Q_ANCHOR = 1.0 / (2**ANCHOR_ROUND_DIGITS - 1)
USE_CLAMP = True
CLAMP_STEPS = 15_000


@jax.custom_vjp
def ste_binary(x: jax.Array) -> jax.Array:
    """sign(x) in {-1, +1} with gradient passed through on |x| <= 1."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _ste_binary_fwd(x):
    return ste_binary(x), (x,)


def _ste_binary_bwd(res, g):
    (x,) = res
    mask = (jnp.abs(x) <= 1.0).astype(g.dtype)
    return (g * mask,)


ste_binary.defvjp(_ste_binary_fwd, _ste_binary_bwd)


@jax.custom_vjp
def ste_multistep(x: jax.Array, q: jax.Array, x_mean: jax.Array) -> jax.Array:
    """round(x / q) * q with straight-through gradient w.r.t. x.

    Values are clamped to x_mean +/- 15000 q first (encodings.py:55-67),
    bounding the symbol alphabet the coder must cover.
    """
    if USE_CLAMP:
        lo = jax.lax.stop_gradient(x_mean - CLAMP_STEPS * q)
        hi = jax.lax.stop_gradient(x_mean + CLAMP_STEPS * q)
        x = jnp.clip(x, lo, hi)
    return jnp.round(x / q) * q


def _ste_multistep_fwd(x, q, x_mean):
    return ste_multistep(x, q, x_mean), None


def _ste_multistep_bwd(res, g):
    del res
    return (g, None, None)


ste_multistep.defvjp(_ste_multistep_fwd, _ste_multistep_bwd)


def quantize_to_symbols(x: jax.Array, q: jax.Array) -> jax.Array:
    """round(x / q) as int32 symbols (pre-offset by min at the call site)."""
    return jnp.round(x / q).astype(jnp.int32)


@jax.custom_vjp
def quantize_anchor(anchors, min_v, max_v):
    """16-bit bounded anchor quantization (encodings.py:73-89)."""
    interval = (max_v - min_v) * Q_ANCHOR + 1e-6
    quantized_v = jnp.floor((anchors - min_v) / interval)
    quantized_v = jnp.clip(quantized_v, 0, 2**ANCHOR_ROUND_DIGITS - 1)
    anchors_q = quantized_v * interval + min_v
    return anchors_q, quantized_v


def _quantize_anchor_fwd(anchors, min_v, max_v):
    return quantize_anchor(anchors, min_v, max_v), None


def _quantize_anchor_bwd(res, g):
    del res
    g_anchors, _ = g
    return (g_anchors, None, None)


quantize_anchor.defvjp(_quantize_anchor_fwd, _quantize_anchor_bwd)


def uniform_noise_quant(x: jax.Array, q, key: jax.Array) -> jax.Array:
    """Train-time additive-uniform quantization proxy: x + U(-0.5, 0.5) * q."""
    return x + (jax.random.uniform(key, x.shape, x.dtype) - 0.5) * q


def ste_round(x: jax.Array) -> jax.Array:
    """round(x) with identity gradient (used for voxel-grid anchor rounding,
    gaussian_model.py:400-405)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
