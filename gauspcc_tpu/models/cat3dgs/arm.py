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


# ---------------------------------------------------------------------------
# fixed-point ARM: backend-independent decode
# ---------------------------------------------------------------------------
#
# The reference pins decode determinism with
# torch.use_deterministic_algorithms (CAT-3DGS/scene/bitstream/
# decode.py:307-310), which only fixes intra-torch runs: a float MLP
# evaluated by a different BLAS/backend can still flip a CDF bin and
# derail the range decoder. Here the ARM MLP is integerized at encode
# time (Q12 weights / Q8 activations, int64 accumulation) and the
# Laplace CDF table is built with an integer exp (Q30 product-of-
# constants factorization), so encoder and decoder agree bit-exactly on
# ANY backend — the quantized weights travel in the bitstream.

ARM_W_FRAC = 12  # weight fraction bits
ARM_A_FRAC = 8  # activation fraction bits
_EXP_T_MAX = 22 << 16  # exp(-22) rounds to 0 in Q30
# exp(-2^(i-16)) in Q30 for t_q16 bits 0..20 (hard-coded so no libm call
# can perturb the table across platforms)
_EXP_C = np.array([
    1073725440, 1073709056, 1073676290, 1073610760, 1073479712, 1073217664,
    1072693760, 1071646719, 1069555701, 1065385899, 1057095000, 1040706261,
    1008687096, 947573834, 836230973, 651257337, 395007542, 145315154,
    19666268, 360200, 121,
], dtype=np.int64)


def _exp_neg_q30(t_q16: np.ndarray) -> np.ndarray:
    """exp(-t) for t = t_q16 / 2^16 >= 0, result in Q30 (int64, exact)."""
    t = np.minimum(t_q16.astype(np.int64), _EXP_T_MAX)
    acc = np.full(t.shape, np.int64(1) << 30, np.int64)
    for i in range(_EXP_C.shape[0]):
        on = ((t >> i) & 1) == 1
        acc = np.where(on, (acc * _EXP_C[i]) >> 30, acc)
    return acc


def quantize_arm(params: dict) -> dict:
    """Float ARM pytree -> integer pytree (the form that ships in the
    bitstream). Weights Q12 int32; biases at the Q20 accumulator scale."""
    layers = []
    for layer in params["layers"]:
        res = "res_lin" in layer
        lin = layer["res_lin"] if res else layer["lin"]
        w = np.asarray(lin["w"], np.float64)
        b = np.asarray(lin["b"], np.float64)
        layers.append({
            "res": res,
            "w": np.round(w * (1 << ARM_W_FRAC)).astype(np.int32),
            "b": np.round(b * (1 << (ARM_W_FRAC + ARM_A_FRAC))).astype(np.int64),
        })
    return {"layers": layers}


def _arm_apply_fixed(qparams: dict, ctx_int: np.ndarray) -> np.ndarray:
    """ctx_int [B, 12] integer latents -> (mu_q8, ls_q8) int64 [B, 2]."""
    x = ctx_int.astype(np.int64) << ARM_A_FRAC  # Q8
    half = np.int64(1) << (ARM_W_FRAC - 1)
    for layer in qparams["layers"][:-1]:
        acc = x @ layer["w"].astype(np.int64) + layer["b"]  # Q20
        y = (acc + half) >> ARM_W_FRAC  # back to Q8, round-half-up
        if layer["res"]:
            y = y + x
        x = np.maximum(y, 0)
    last = qparams["layers"][-1]
    acc = x @ last["w"].astype(np.int64) + last["b"]
    return (acc + half) >> ARM_W_FRAC  # raw (mu, log_scale) in Q8


_LS_MIN_Q8 = -10 * 256
_LS_MAX_Q8 = 3537  # 13.8155 * 256


def _laplace_table_fixed(mu_q8, ls_q8, rmin: int, rmax: int) -> np.ndarray:
    """uint16-normalized Laplace CDF rows from integer (mu, log_scale).

    scale = exp(-0.5 * ls); cdf(x) = 0.5 exp(-(mu-x)/scale) below mu and
    1 - 0.5 exp(-(x-mu)/scale) above — all in integer fixed point."""
    ls = np.clip(ls_q8, _LS_MIN_Q8, _LS_MAX_Q8).astype(np.int64)
    # 1/scale = exp(ls / 512): Q16 via exp(-|x|) and an integer reciprocal
    t_pos = np.abs(ls) << 7  # |ls|/512 in Q16
    e = _exp_neg_q30(t_pos)
    inv_scale_q16 = np.where(
        ls >= 0,
        (np.int64(1) << 46) // np.maximum(e, 1),  # exp(+) = 1/exp(-)
        e >> 14,
    )

    lp = rmax - rmin + 2
    # symbol boundaries x = rmin - 0.5 + j, in Q8 (exact)
    xs_q8 = ((np.arange(lp, dtype=np.int64) + rmin) << 8) - 128
    d_q8 = xs_q8[None, :] - mu_q8.astype(np.int64)[:, None]
    t_q16 = (np.abs(d_q8) * inv_scale_q16[:, None]) >> 8
    eh = _exp_neg_q30(t_q16)  # Q30; 0.5*e is e at Q31
    cdf_q31 = np.where(d_q8 < 0, eh, (np.int64(1) << 31) - eh)
    new_max = np.int64(2**16 - (lp - 1))
    v = (cdf_q31 * new_max + (np.int64(1) << 30)) >> 31
    # fixed-point exp is monotone only to ~1 ulp Q30; make rows
    # non-decreasing before the strictly-increasing +arange offset
    v = np.maximum.accumulate(v, axis=1)
    return (v + np.arange(lp, dtype=np.int64)).astype(np.uint16)


def pack_arm(qparams: dict) -> bytes:
    """Serialize an integer ARM for the bitstream header."""
    import struct as _struct

    out = [_struct.pack("<I", len(qparams["layers"]))]
    for layer in qparams["layers"]:
        w, b = layer["w"], layer["b"]
        out.append(_struct.pack("<III", int(layer["res"]), *w.shape))
        out.append(w.astype("<i4").tobytes())
        out.append(b.astype("<i8").tobytes())
    return b"".join(out)


def unpack_arm(buf: bytes, off: int = 0):
    """-> (qparams, bytes consumed)."""
    import struct as _struct

    (n_layers,) = _struct.unpack_from("<I", buf, off)
    off0, off = off, off + 4
    layers = []
    for _ in range(n_layers):
        res, din, dout = _struct.unpack_from("<III", buf, off)
        off += 12
        w = np.frombuffer(buf, "<i4", din * dout, off).reshape(din, dout)
        off += 4 * din * dout
        b = np.frombuffer(buf, "<i8", dout, off)
        off += 8 * dout
        layers.append({"res": bool(res), "w": w.copy(), "b": b.copy()})
    return {"layers": layers}, off - off0


def encode_plane_fixed(qparams: dict, latent: np.ndarray,
                       sym_bound: int = 256) -> bytes:
    """encode_plane with the integer ARM + integer CDF tables."""
    from gauspcc_tpu.ops import coder

    h, w = latent.shape
    lat = np.clip(np.round(latent), -sym_bound, sym_bound).astype(np.int64)
    pad = MASK_SIZE // 2
    padded = np.zeros((h + 2 * pad, w + 2 * pad), np.int64)
    padded[pad:-pad, pad:-pad] = lat
    ii, jj = np.mgrid[0:h, 0:w]
    ctx = _ctx_np(padded, ii.reshape(-1), jj.reshape(-1))
    raw = _arm_apply_fixed(qparams, ctx)
    rmin = int(lat.min())
    rmax = int(lat.max())
    table = _laplace_table_fixed(raw[:, 0], raw[:, 1], rmin, rmax)

    order = np.concatenate([i_ * w + j_ for i_, j_ in coding_waves(h, w)])
    syms = (lat.reshape(-1)[order] - rmin).astype(np.int16)
    payload = coder.encode_int16_cdf(table[order], syms)
    head = np.array([h, w, rmin, rmax], np.int32).tobytes()
    return head + payload


def decode_plane_fixed(qparams: dict, stream: bytes) -> np.ndarray:
    """Wavefront decode with integer-only probability evaluation."""
    from gauspcc_tpu.ops import coder as coder_lib

    h, w, rmin, rmax = (int(v) for v in np.frombuffer(stream[:16], np.int32))
    payload = stream[16:]
    pad = MASK_SIZE // 2
    padded = np.zeros((h + 2 * pad, w + 2 * pad), np.int64)
    dec = coder_lib.IncrementalDecoder(payload, h * w)
    out = np.zeros((h, w), np.float32)
    for ii, jj in coding_waves(h, w):
        ctx = _ctx_np(padded, ii, jj)
        raw = _arm_apply_fixed(qparams, ctx)
        syms = dec.decode(_laplace_table_fixed(raw[:, 0], raw[:, 1],
                                               rmin, rmax))
        vals = syms.astype(np.int64) + rmin
        padded[ii + pad, jj + pad] = vals
        out[ii, jj] = vals
    dec.close()
    return out


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
