"""COOL-CHIC-style autoregressive model over triplane latents.

Parity: CAT-3DGS scene/arm.py — ArmMLP (12 causal context pixels from the
5x5 half-mask, hidden [16,16,16,16] with residual blocks where in==out,
(mu, log_scale) head, scale = exp(-0.5 * clamp(log_scale, -10, 13.8155)));
laplace_cdf; compute_rate with the 2^-16 probability floor; and the
skewed-wavefront coding order (bitstream/range_coder.py
generate_coding_order with row offset n_ctx_rowcol + 1), under which every
context pixel of wave w lies in a wave < w, so decode parallelizes within
a wave.

Training/encode evaluate all contexts teacher-forced in one batched XLA
call; the wavefront decode loop runs on host (tiny MLP, numpy) feeding the
native coder — scalar work stays off-chip by design.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core.nn import dense_init

MASK_SIZE = 5  # 2 * n_ctx_rowcol + 1 with n_ctx_rowcol = 2
N_CTX = (MASK_SIZE**2 - 1) // 2  # 12 causal neighbors
WAVE_ROW_OFFSET = 3  # n_ctx_rowcol + 1

# (dy, dx) of the 12 causal neighbors: first half of the 5x5 window in
# raster order (rows -2, -1 fully; row 0 columns -2, -1).
CTX_OFFSETS = np.array(
    [(dy, dx) for dy in (-2, -1) for dx in (-2, -1, 0, 1, 2)]
    + [(0, -2), (0, -1)],
    dtype=np.int32,
)


def init_arm(key, layers=(16, 16, 16, 16)) -> dict:
    """Residual-ness is encoded in the layer key ('res_lin' vs 'lin') so the
    params stay a pure float pytree (grad-safe)."""
    d_in = N_CTX
    ps = []
    for d_out in layers:
        key, sub = jax.random.split(key)
        name = "res_lin" if d_in == d_out else "lin"
        ps.append({name: dense_init(sub, d_in, d_out)})
        d_in = d_out
    key, sub = jax.random.split(key)
    ps.append({"lin": dense_init(sub, d_in, 2)})
    return {"layers": ps}


def arm_apply(params: dict, ctx: jax.Array) -> jax.Array:
    """ctx [B, 12] -> raw (mu, log_scale) [B, 2]."""
    x = ctx
    layers = params["layers"]
    for layer in layers[:-1]:
        res = "res_lin" in layer
        lin = layer["res_lin"] if res else layer["lin"]
        y = x @ lin["w"] + lin["b"]
        if res:
            y = y + x
        x = jax.nn.relu(y)
    out = x @ layers[-1]["lin"]["w"] + layers[-1]["lin"]["b"]
    return out


def get_mu_scale(raw: jax.Array):
    mu = raw[:, 0]
    scale = jnp.exp(-0.5 * jnp.clip(raw[:, 1], -10.0, 13.8155))
    return mu, scale


def laplace_cdf(x, loc, scale):
    return 0.5 - 0.5 * jnp.sign(x - loc) * jnp.expm1(-jnp.abs(x - loc) / scale)


def compute_rate(x, raw):
    """Bits of quantized-Laplace likelihood, floored at 2^-16."""
    mu, scale = get_mu_scale(raw)
    proba = jnp.maximum(
        laplace_cdf(x + 0.5, mu, scale) - laplace_cdf(x - 0.5, mu, scale),
        2.0**-16,
    )
    return -jnp.log2(proba), mu, scale


def extract_context(latent: jax.Array) -> jax.Array:
    """latent [H, W] -> causal neighbors [H*W, 12] (zero padded)."""
    h, w = latent.shape
    pad = MASK_SIZE // 2
    xp = jnp.pad(latent, ((pad, pad), (pad, pad)))
    cols = []
    for dy, dx in CTX_OFFSETS:
        cols.append(
            jax.lax.dynamic_slice(xp, (pad + int(dy), pad + int(dx)), (h, w))
        )
    return jnp.stack(cols, axis=-1).reshape(h * w, N_CTX)


def plane_rate(params: dict, latent: jax.Array):
    """Total bits + (mu, scale) for one [H, W] quantized latent plane."""
    ctx = extract_context(latent)
    raw = arm_apply(params, ctx)
    rate, mu, scale = compute_rate(latent.reshape(-1), raw)
    return jnp.sum(rate), mu, scale


# ---------------------------------------------------------------------------
# wavefront order
# ---------------------------------------------------------------------------

def coding_waves(h: int, w: int):
    """List of (rows, cols) index arrays per wave (w = 3*i + j order),
    matching generate_coding_order's dependency guarantee."""
    wave_of = WAVE_ROW_OFFSET * np.arange(h)[:, None] + np.arange(w)[None, :]
    waves = []
    for wv in range(int(wave_of.max()) + 1):
        ii, jj = np.nonzero(wave_of == wv)
        if ii.size:
            waves.append((ii.astype(np.int32), jj.astype(np.int32)))
    return waves


def _arm_apply_np(params: dict, ctx: np.ndarray) -> np.ndarray:
    x = ctx
    layers = params["layers"]
    for layer in layers[:-1]:
        res = "res_lin" in layer
        lin = layer["res_lin"] if res else layer["lin"]
        y = x @ np.asarray(lin["w"]) + np.asarray(lin["b"])
        if res:
            y = y + x
        x = np.maximum(y, 0.0)
    return x @ np.asarray(layers[-1]["lin"]["w"]) + np.asarray(layers[-1]["lin"]["b"])


def _mu_scale_np(raw: np.ndarray):
    mu = raw[:, 0]
    scale = np.exp(-0.5 * np.clip(raw[:, 1], -10.0, 13.8155))
    return mu, scale


def _laplace_cdf_np(x, loc, scale):
    return 0.5 - 0.5 * np.sign(x - loc) * np.expm1(-np.abs(x - loc) / scale)


def _laplace_table_np(mu, scale, rmin, rmax):
    """uint16-normalized Laplace CDF rows over symbols [rmin, rmax]."""
    lp = rmax - rmin + 2
    xs = (np.arange(lp, dtype=np.float32) + (rmin - 0.5))[None, :]
    cdf = _laplace_cdf_np(xs, mu[:, None], scale[:, None])
    cdf = np.clip(cdf, 0.0, 1.0)
    new_max = np.float32(2.0**16 - (lp - 1))
    v = np.round(cdf * new_max).astype(np.int64) + np.arange(lp)
    return v.astype(np.uint16)


def _ctx_np(padded: np.ndarray, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    pad = MASK_SIZE // 2
    cols = [padded[ii + pad + dy, jj + pad + dx] for dy, dx in CTX_OFFSETS]
    return np.stack(cols, axis=-1)


def encode_plane(params: dict, latent: np.ndarray, sym_bound: int = 256):
    """Encode one quantized [H, W] latent plane; returns bytes.

    Contexts are teacher-forced (full latent known), so the whole plane's
    CDF table is computed in one pass; symbols go to the native coder in
    wavefront order (the decoder's traversal).
    """
    from gauspcc_tpu.ops import coder

    h, w = latent.shape
    latent = np.clip(np.round(latent), -sym_bound, sym_bound).astype(np.int32)
    raw = _arm_apply_np(params, np.asarray(
        extract_context(jnp.asarray(latent.astype(np.float32)))))
    mu, scale = _mu_scale_np(raw)
    rmin = int(latent.min())
    rmax = int(latent.max())
    table = _laplace_table_np(mu.reshape(h * w), scale.reshape(h * w), rmin, rmax)

    order = np.concatenate(
        [ii * w + jj for ii, jj in coding_waves(h, w)]
    )
    syms = (latent.reshape(-1)[order] - rmin).astype(np.int16)
    payload = coder.encode_int16_cdf(table[order], syms)
    head = np.array([h, w, rmin, rmax], np.int32).tobytes()
    return head + payload


def decode_plane(params: dict, stream: bytes) -> np.ndarray:
    """Wavefront decode of one latent plane.

    Host loop over waves: each wave batches ARM inference over its pixels
    (their contexts are fully decoded by construction of the skewed order)
    and the native coder's incremental decoder consumes the stream O(n)
    total, one wave of CDF rows at a time.
    """
    from gauspcc_tpu.ops import coder as coder_lib

    h, w, rmin, rmax = (int(v) for v in np.frombuffer(stream[:16], np.int32))
    payload = stream[16:]
    n_total = h * w

    pad = MASK_SIZE // 2
    padded = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    waves = coding_waves(h, w)
    dec = coder_lib.IncrementalDecoder(payload, n_total)

    out = np.zeros((h, w), np.float32)
    for ii, jj in waves:
        ctx = _ctx_np(padded, ii, jj)
        raw = _arm_apply_np(params, ctx)
        mu, scale = _mu_scale_np(raw)
        syms = dec.decode(_laplace_table_np(mu, scale, rmin, rmax))
        vals = syms.astype(np.float32) + rmin
        padded[ii + pad, jj + pad] = vals
        out[ii, jj] = vals
    dec.close()
    return out
