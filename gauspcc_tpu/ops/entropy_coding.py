"""File-level entropy encode/decode of quantized tensors.

TPU-native equivalents of HAC/utils/encodings_cuda.py: the CDF tables are
built in one XLA call (gauspcc_tpu.core.cdf), the bit-level coding runs in
the native host coder (gauspcc_tpu.ops.coder). File formats mirror the
reference (.b files: f32 min, f32 max, coder payload; binary coder: f32 p1).

All entry points accept/return numpy or jax arrays and operate eagerly —
they sit outside jit (encode/decode time, not train time).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import cdf as cdf_lib
from gauspcc_tpu.ops import coder

# Lp above which the one-shot [N, Lp] table would be needlessly large; we
# split the symbol range instead of materializing giant tables.
_MAX_TABLE_ELEMS = 300_000_000


def _to_np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


@jax.jit
def _residual_model(x, mean, scale, q):
    """Residual symbols + residual-space (mu, sigma) for the native coder."""
    center = jnp.round(mean / q)
    res = (jnp.round(x / q) - center).astype(jnp.int32)
    return res, (mean / q - center).astype(jnp.float32), \
        (scale / q).astype(jnp.float32)


@jax.jit
def _residual_model_dec(mean, scale, q):
    center = jnp.round(mean / q)
    return center, (mean / q - center).astype(jnp.float32), \
        (scale / q).astype(jnp.float32)


def encode_gaussian(x, mean, scale, q, file_name: str) -> int:
    """Arithmetic-encode x (flat [N]) under per-element Gaussian models.

    Functional parity with encoder_gaussian (encodings_cuda.py:340-376),
    with symbols as mean-centered residuals r = round(x/q) - round(mean/q)
    (a rate-identical reindexing). Probabilities are evaluated INSIDE the
    native coder from the residual-space (mu, sigma) — 12 bytes/symbol off
    the device instead of an [N, Lp] uint16 table, which at scene scale
    (outlier-widened Lp) was the dominant device->host transfer.
    Header stores f32 rmin/rmax. Returns the bit length written.
    """
    x = jnp.asarray(x).reshape(-1)
    mean = jnp.asarray(mean).reshape(-1)
    scale = jnp.asarray(scale).reshape(-1)
    if not isinstance(q, jax.Array) or jnp.ndim(q) == 0:
        q = jnp.full_like(mean, q)
    q = q.reshape(-1)

    res, mu_res, sig_res = (
        _to_np(v) for v in _residual_model(x, mean, scale, q))
    if res.size == 0:
        payload = np.uint32(0).tobytes()
        rmin = rmax = 0.0
    else:
        rmin = int(res.min())
        rmax = int(res.max())
        payload = coder.encode_gauss(
            mu_res, sig_res, (res - rmin).astype(np.int16), rmin, rmax)

    with open(file_name, "wb") as f:
        f.write(np.float32(rmin).tobytes())
        f.write(np.float32(rmax).tobytes())
        f.write(payload)
    return (len(payload) + 8) * 8


def decode_gaussian(mean, scale, q, file_name: str) -> jax.Array:
    """Inverse of encode_gaussian; returns float32 [N] dequantized values."""
    mean = jnp.asarray(mean).reshape(-1)
    scale = jnp.asarray(scale).reshape(-1)
    if not isinstance(q, jax.Array) or jnp.ndim(q) == 0:
        q = jnp.full_like(mean, q)
    q = q.reshape(-1)

    with open(file_name, "rb") as f:
        rmin = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        rmax = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        payload = f.read()

    n = int(mean.shape[0])
    if n == 0:
        return jnp.zeros((0,), jnp.float32)
    center, mu_res, sig_res = _residual_model_dec(mean, scale, q)
    sym = coder.decode_gauss(_to_np(mu_res), _to_np(sig_res), payload,
                             rmin, rmax)
    return (jnp.asarray(sym.astype(np.float32)) + rmin + center) * q


def encode_gaussian_mixed(x, means, scales, probs, q, file_name: str) -> int:
    """Mixture-model variant (parity: encoder_gaussian_mixed,
    encodings_cuda.py:203-249), residual-centered on the prob-weighted mean."""
    x = jnp.asarray(x).reshape(-1)
    means = [jnp.asarray(m).reshape(-1) for m in means]
    scales = [jnp.asarray(s).reshape(-1) for s in scales]
    probs = [jnp.asarray(p).reshape(-1) for p in probs]
    if not isinstance(q, jax.Array) or jnp.ndim(q) == 0:
        q = jnp.full_like(means[0], q)
    q = q.reshape(-1)

    center = cdf_lib.mixture_center(means, probs, q)
    res_np = _to_np(jnp.round(x / q).astype(jnp.int32) - center.astype(jnp.int32))
    if res_np.size == 0:
        payload = np.uint32(0).tobytes()
        rmin = rmax = 0.0
    else:
        rmin = int(res_np.min())
        rmax = int(res_np.max())
        mu, sig, w = _mixture_residual_model(means, scales, probs, q, center)
        payload = coder.encode_gauss(
            _to_np(mu), _to_np(sig), (res_np - rmin).astype(np.int16),
            rmin, rmax, w=_to_np(w))

    with open(file_name, "wb") as f:
        f.write(np.float32(rmin).tobytes())
        f.write(np.float32(rmax).tobytes())
        f.write(payload)
    return (len(payload) + 8) * 8


@jax.jit
def _mixture_residual_model(means, scales, probs, q, center):
    """Stack mixture components into residual-space [N, K] model arrays."""
    mu = jnp.stack([m / q - center for m in means], axis=-1)
    sig = jnp.stack([s / q for s in scales], axis=-1)
    w = jnp.stack(probs, axis=-1)
    return mu.astype(jnp.float32), sig.astype(jnp.float32), \
        w.astype(jnp.float32)


def decode_gaussian_mixed(means, scales, probs, q, file_name: str) -> jax.Array:
    means = [jnp.asarray(m).reshape(-1) for m in means]
    scales = [jnp.asarray(s).reshape(-1) for s in scales]
    probs = [jnp.asarray(p).reshape(-1) for p in probs]
    if not isinstance(q, jax.Array) or jnp.ndim(q) == 0:
        q = jnp.full_like(means[0], q)
    q = q.reshape(-1)

    with open(file_name, "rb") as f:
        rmin = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        rmax = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        payload = f.read()
    n = int(means[0].shape[0])
    if n == 0:
        return jnp.zeros((0,), jnp.float32)
    center = cdf_lib.mixture_center(means, probs, q)
    mu, sig, w = _mixture_residual_model(means, scales, probs, q, center)
    sym = coder.decode_gauss(_to_np(mu), _to_np(sig), payload, rmin, rmax,
                             w=_to_np(w))
    return (jnp.asarray(sym.astype(np.float32)) + rmin + center) * q


def encode_factorized(params, x, q, file_name: str) -> int:
    """Arithmetic-encode [N, C] values under the fully-factorized (Balle)
    model (parity: encoder_factorized, encodings_cuda.py:57-117): one CDF
    row per channel over the global symbol range, evaluated on device via
    factorized_logits_cumulative, broadcast to all rows of that channel."""
    from gauspcc_tpu.core import entropy as entropy_lib

    x = jnp.asarray(x)
    assert x.ndim == 2
    n, c = x.shape
    sym = np.asarray(jnp.round(x / q).astype(jnp.int32))
    if sym.size == 0:
        payload = np.uint32(0).tobytes()
        min_v = max_v = 0
    else:
        min_v = int(sym.min())
        max_v = int(sym.max())
        lp = max_v - min_v + 2
        samples = (jnp.arange(lp, dtype=jnp.float32) + (min_v - 0.5)) * q
        samples = jnp.broadcast_to(samples[None, None, :], (c, 1, lp))
        logits = entropy_lib.factorized_logits_cumulative(params, samples)
        cdf = jax.nn.sigmoid(logits)[:, 0, :]  # [C, Lp], monotone in symbol
        cdf = jnp.clip(
            (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1e-9),
            0.0, 1.0,
        )
        table_c = np.asarray(cdf_lib.normalize_cdf_int16(cdf))  # [C, Lp]
        table = np.broadcast_to(table_c[None], (n, c, lp)).reshape(n * c, lp)
        payload = coder.encode_int16_cdf(
            np.ascontiguousarray(table), (sym.reshape(-1) - min_v).astype(np.int16)
        )
    with open(file_name, "wb") as f:
        f.write(np.float32(min_v).tobytes())
        f.write(np.float32(max_v).tobytes())
        f.write(payload)
    return (len(payload) + 8) * 8


def decode_factorized(params, n: int, c: int, q, file_name: str) -> jax.Array:
    """Inverse of encode_factorized; returns float32 [N, C]."""
    from gauspcc_tpu.core import entropy as entropy_lib

    with open(file_name, "rb") as f:
        min_v = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        max_v = int(np.frombuffer(f.read(4), dtype=np.float32)[0])
        payload = f.read()
    if n * c == 0:
        return jnp.zeros((n, c), jnp.float32)
    lp = max_v - min_v + 2
    samples = (jnp.arange(lp, dtype=jnp.float32) + (min_v - 0.5)) * q
    samples = jnp.broadcast_to(samples[None, None, :], (c, 1, lp))
    logits = entropy_lib.factorized_logits_cumulative(params, samples)
    cdf = jax.nn.sigmoid(logits)[:, 0, :]
    cdf = jnp.clip(
        (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1e-9),
        0.0, 1.0,
    )
    table_c = np.asarray(cdf_lib.normalize_cdf_int16(cdf))
    table = np.broadcast_to(table_c[None], (n, c, lp)).reshape(n * c, lp)
    sym = coder.decode_int16_cdf(np.ascontiguousarray(table), payload)
    return (jnp.asarray(sym.astype(np.float32)).reshape(n, c) + min_v) * q


def encode_binary(x01, file_name: str) -> int:
    """Encode a {0,1} tensor with a single global p1 (encoder, :435-464)."""
    x = _to_np(x01).reshape(-1).astype(np.float32)
    p1 = float(x.sum() / max(x.size, 1))
    p1_c = min(max(p1, 1e-6), 1.0 - 1e-6)
    cdf_row = cdf_lib.normalize_cdf_int16(
        jnp.array([[0.0, 1.0 - p1_c, 1.0]], jnp.float32)
    )
    table = np.broadcast_to(_to_np(cdf_row), (x.size, 3))
    payload = coder.encode_int16_cdf(table, x.astype(np.int16))
    with open(file_name, "wb") as f:
        f.write(np.float32(p1).tobytes())
        f.write(payload)
    return (len(payload) + 4) * 8


def decode_binary(n: int, file_name: str) -> jax.Array:
    with open(file_name, "rb") as f:
        p1 = float(np.frombuffer(f.read(4), dtype=np.float32)[0])
        payload = f.read()
    p1_c = min(max(p1, 1e-6), 1.0 - 1e-6)
    cdf_row = cdf_lib.normalize_cdf_int16(
        jnp.array([[0.0, 1.0 - p1_c, 1.0]], jnp.float32)
    )
    table = np.broadcast_to(_to_np(cdf_row), (n, 3))
    sym = coder.decode_int16_cdf(table, payload)
    return jnp.asarray(sym.astype(np.float32))
