"""CDF construction and int16 normalization on device (XLA).

These are the device-side halves of the codec: probabilities/CDFs are
computed in one XLA call per batch and handed to the native coder
(gauspcc_tpu/ops/coder.py) as normalized uint16 rows.

Semantics follow the reference exactly so rate matches:
  - normalize_cdf_int16 == GausPcgc/kit/op.py:50-79 `_convert_to_int_and_normalize`
    (scale by 2^16-(Lp-1), round-to-nearest-even, add arange).
  - gaussian_cdf_table == arithmetic.zip/arithmetic_kernel.cu:7-54
    `calculate_cdf_kernel` (per-symbol Gaussian CDF via erfc at
    (min_value+i-0.5)*Q).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_cdf_int16(cdf_float: jax.Array) -> jax.Array:
    """[N, Lp] float cdf in [0, 1] -> strictly monotone uint16 rows.

    The value for the final column (conceptually 2^16) wraps to 0 in uint16;
    the native coder never reads it.
    """
    lp = cdf_float.shape[-1]
    new_max = jnp.float32(2.0**16 - (lp - 1))
    v = jnp.round(cdf_float.astype(jnp.float32) * new_max).astype(jnp.int32)
    v = v + jnp.arange(lp, dtype=jnp.int32)
    return v.astype(jnp.uint16)


def probs_to_cdf_int16(probs: jax.Array) -> jax.Array:
    """[N, L] per-symbol probabilities -> [N, L+1] normalized uint16 CDF.

    Matches the reference encode path (HAC/utils/pcc_utils.py:146-148):
    prepend 0, cumsum, clamp to [0, 1], then int16-normalize.
    """
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    cdf = jnp.clip(cdf, 0.0, 1.0)
    return normalize_cdf_int16(cdf)


def gaussian_cdf(x: jax.Array, mean: jax.Array, scale: jax.Array) -> jax.Array:
    """Phi((x - mean) / scale) via erfc, as in the reference CUDA kernel."""
    return 0.5 * jax.lax.erfc(-(x - mean) / (scale * jnp.sqrt(jnp.float32(2.0))))


def gaussian_cdf_table(
    mean: jax.Array,
    scale: jax.Array,
    q: jax.Array,
    min_value: int,
    max_value: int,
) -> jax.Array:
    """Per-row discretized-Gaussian CDF table, already int16-normalized.

    mean/scale/q: [N]. Returns uint16 [N, Lp] with Lp = max-min+2; row i,
    column j holds Phi(((min_value+j) - 0.5) * q[i]; mean[i], scale[i]),
    clamped to [0, 1] before normalization.
    """
    lp = int(max_value) - int(min_value) + 2
    scale = jnp.maximum(scale, 1e-9)
    samples = (jnp.arange(lp, dtype=jnp.float32) + (min_value - 0.5)) * q[:, None]
    cdf = gaussian_cdf(samples, mean[:, None], scale[:, None])
    cdf = jnp.clip(cdf, 0.0, 1.0)
    return normalize_cdf_int16(cdf)


def gaussian_cdf_table_residual(
    mean: jax.Array,
    scale: jax.Array,
    q: jax.Array,
    rmin: int,
    rmax: int,
) -> jax.Array:
    """Residual-centered discretized-Gaussian CDF table.

    Rate-identical reindexing of :func:`gaussian_cdf_table` (a TPU-side
    optimization over the reference layout): symbols are residuals
    r = round(x/q) - round(mean/q), so the table's column range covers only
    the residual spread (a few sigma) instead of the global value range.
    Both encoder and decoder compute offset = round(mean/q) from the shared
    entropy model, so the format stays self-contained.

    Returns uint16 [N, Lp] with Lp = rmax - rmin + 2.
    """
    lp = int(rmax) - int(rmin) + 2
    scale = jnp.maximum(scale, 1e-9)
    offset = jnp.round(mean / q)
    samples = (offset[:, None] + jnp.arange(lp, dtype=jnp.float32) + (rmin - 0.5)) * q[:, None]
    cdf = gaussian_cdf(samples, mean[:, None], scale[:, None])
    cdf = jnp.clip(cdf, 0.0, 1.0)
    return normalize_cdf_int16(cdf)


def gaussian_mixture_cdf_table(
    means: list[jax.Array],
    scales: list[jax.Array],
    probs: list[jax.Array],
    q: jax.Array,
    min_value: int,
    max_value: int,
) -> jax.Array:
    """Mixture-of-Gaussians CDF table (HAC++ path, encodings_cuda.py:203-226)."""
    lp = int(max_value) - int(min_value) + 2
    samples = (jnp.arange(lp, dtype=jnp.float32) + (min_value - 0.5)) * q[:, None]
    acc = jnp.zeros((q.shape[0], lp), dtype=jnp.float32)
    for mean, scale, prob in zip(means, scales, probs):
        scale = jnp.maximum(scale, 1e-9)
        acc = acc + prob[:, None] * gaussian_cdf(samples, mean[:, None], scale[:, None])
    acc = jnp.clip(acc, 0.0, 1.0)
    return normalize_cdf_int16(acc)


def mixture_center(means: list[jax.Array], probs: list[jax.Array], q: jax.Array) -> jax.Array:
    """Deterministic per-element center for residual mixture coding:
    round(sum_k p_k mean_k / q). Shared by encoder and decoder."""
    m = jnp.zeros_like(means[0])
    for mean, prob in zip(means, probs):
        m = m + prob * mean
    return jnp.round(m / q)


def gaussian_mixture_cdf_table_residual(
    means: list[jax.Array],
    scales: list[jax.Array],
    probs: list[jax.Array],
    q: jax.Array,
    rmin: int,
    rmax: int,
) -> jax.Array:
    """Residual-centered mixture CDF table (see gaussian_cdf_table_residual)."""
    lp = int(rmax) - int(rmin) + 2
    offset = mixture_center(means, probs, q)
    samples = (offset[:, None] + jnp.arange(lp, dtype=jnp.float32) + (rmin - 0.5)) * q[:, None]
    acc = jnp.zeros((q.shape[0], lp), dtype=jnp.float32)
    for mean, scale, prob in zip(means, scales, probs):
        scale = jnp.maximum(scale, 1e-9)
        acc = acc + prob[:, None] * gaussian_cdf(samples, mean[:, None], scale[:, None])
    acc = jnp.clip(acc, 0.0, 1.0)
    return normalize_cdf_int16(acc)
