"""Interleaved rANS entropy coder that runs ON the accelerator (XLA).

The reference keeps its entropy coder on the compute device too — the
CUDA arithmetic extension runs one thread per 10k-symbol chunk
(arithmetic_kernel.cu:94-163 via HAC/utils/encodings_cuda.py:6). The TPU
has no scalar threads, so the TPU-native equivalent is LANE-interleaved
rANS: L independent streams advance in lockstep under `lax.scan`, with
positions strided across lanes (pos = t*L + lane) so every step's CDF
rows are one contiguous `dynamic_slice` — no gathers in the hot loop.

Why rANS (own format, SURVEY.md §7 "own format, self-consistent"): its
renormalization is branch-light (at most one 16-bit word in/out per
symbol), which vectorizes; the classic low/high arithmetic coder's
variable bit-emit loop does not. Everything is uint32 integer math, so
encode/decode are bit-exact by construction on any backend.

Scheme: 16-bit probabilities (the same int16-normalized CDF rows the
arithmetic path uses, core/cdf.py), state in [2^16, 2^32), 16-bit renorm.
Encode walks symbols in reverse and pushes words per lane; the HOST
reverses each lane's words once so decode reads forward. A lane's first
two words are its flushed final state.

Symbols at positions >= n_valid are skipped by both sides (the decoder
knows the valid count before decoding — it is the parent occupancy
popcount), so padded capacities cost no bits.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U16 = jnp.uint32(0xFFFF)


def lane_count(cap: int) -> int:
    """Lanes for a given (static) position capacity. Must divide cap; a
    deterministic function of cap so encoder and decoder always agree."""
    if cap >= 16384:
        return 128
    return max(8, cap // 128)


def word_capacity(cap: int, n_stages: int = 4) -> int:
    """Max words one lane can emit: <=1 renorm word per symbol (state is
    below 2^32, renorm base 2^16) + 2 flush words."""
    return n_stages * (cap // lane_count(cap)) + 2


def enc_init(cap: int, n_stages: int = 4):
    """(state, n_words, words) carry for encode, all per-lane."""
    lanes = lane_count(cap)
    return (
        jnp.full((lanes,), 1 << 16, jnp.uint32),
        jnp.zeros((lanes,), jnp.int32),
        jnp.zeros((lanes, word_capacity(cap, n_stages)), jnp.uint16),
    )


def enc_init_np(cap: int, n_stages: int = 4):
    """Numpy enc_init (callers jax.device_put it to the level's device)."""
    lanes = lane_count(cap)
    return (
        np.full((lanes,), 1 << 16, np.uint32),
        np.zeros((lanes,), np.int32),
        np.zeros((lanes, word_capacity(cap, n_stages)), np.uint16),
    )


def _row_freq(rows: jax.Array, s: jax.Array):
    """(cdf_lo, freq) for symbol s in each row. rows: [L, Lp] uint32 with
    the reference's wrap convention (the conceptual 2^16 in the last
    column is stored as 0); mod-2^16 subtraction makes freq correct there."""
    lo = jnp.take_along_axis(rows, s[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(rows, s[:, None] + 1, axis=1)[:, 0]
    return lo, (hi - lo) & U16


def encode_stage(carry, table_u16: jax.Array, syms: jax.Array,
                 n_valid: jax.Array):
    """Push one stage's symbols onto the lane streams, reverse order.

    table_u16: [cap, Lp] normalized CDF rows; syms: [cap] int32;
    n_valid: scalar. Call for stages in REVERSE stage order (3..0); the
    matching decode_stage calls run 0..3.
    """
    state0, n_words0, words0 = carry
    lanes = state0.shape[0]
    cap = table_u16.shape[0]
    steps = cap // lanes
    table = table_u16.astype(jnp.uint32)

    def step(c, t_rev):
        state, n_words, words = c
        t = steps - 1 - t_rev
        rows = jax.lax.dynamic_slice(
            table, (t * lanes, 0), (lanes, table.shape[1]))
        s = jax.lax.dynamic_slice(syms, (t * lanes,), (lanes,))
        lo, freq = _row_freq(rows, jnp.clip(s, 0, table.shape[1] - 2))
        pos = t * lanes + jnp.arange(lanes, dtype=jnp.int32)
        valid = pos < n_valid

        need = (state >= (freq << 16)) & valid
        # emit at per-lane cursors; lanes with nothing to emit scatter to
        # an out-of-range column which mode="drop" discards
        emit = (state & U16).astype(jnp.uint16)
        idx = jnp.where(need, n_words, words.shape[1])
        words = words.at[(jnp.arange(lanes), idx)].set(emit, mode="drop")
        n_words = n_words + need.astype(jnp.int32)
        state = jnp.where(need, state >> 16, state)

        new_state = ((state // freq) << 16) + (state % freq) + lo
        state = jnp.where(valid, new_state, state)
        return (state, n_words, words), None

    carry, _ = jax.lax.scan(step, (state0, n_words0, words0),
                            jnp.arange(steps))
    return carry


def enc_flush(carry):
    """Append each lane's final state (2 words: low half then high half,
    so the host reversal puts the high half first). Returns
    (words [L, W] uint16, n_words [L] int32)."""
    state, n_words, words = carry
    lanes = state.shape[0]
    il = jnp.arange(lanes)
    words = words.at[(il, n_words)].set((state & U16).astype(jnp.uint16))
    words = words.at[(il, n_words + 1)].set((state >> 16).astype(jnp.uint16))
    return words, n_words + 2


def dec_init(words: jax.Array):
    """(state, ptr) from host-reversed lane words [L, W]."""
    state = (words[:, 0].astype(jnp.uint32) << 16) | words[:, 1].astype(
        jnp.uint32)
    ptr = jnp.full((words.shape[0],), 2, jnp.int32)
    return state, ptr


def decode_stage(carry, table_u16: jax.Array, words: jax.Array,
                 n_valid: jax.Array):
    """Decode one stage's symbols (forward order). Returns
    (carry, syms [cap] int32)."""
    state0, ptr0 = carry
    lanes = state0.shape[0]
    cap = table_u16.shape[0]
    steps = cap // lanes
    lp = table_u16.shape[1]
    table = table_u16.astype(jnp.uint32)
    il = jnp.arange(lanes)

    def step(c, t):
        state, ptr, out = c
        rows = jax.lax.dynamic_slice(table, (t * lanes, 0), (lanes, lp))
        pos = t * lanes + il.astype(jnp.int32)
        valid = pos < n_valid

        slot = state & U16
        # s = #{j in [1, Lp-2] : cdf[j] <= slot} (last column wraps to 0
        # and is excluded; column 0 is always 0)
        s = jnp.sum(
            (rows[:, 1 : lp - 1] <= slot[:, None]).astype(jnp.int32), axis=1)
        lo, freq = _row_freq(rows, s)
        new_state = freq * (state >> 16) + slot - lo
        need = (new_state < (1 << 16)) & valid
        w = words[(il, jnp.clip(ptr, 0, words.shape[1] - 1))].astype(
            jnp.uint32)
        new_state = jnp.where(need, (new_state << 16) | w, new_state)
        state = jnp.where(valid, new_state, state)
        ptr = ptr + need.astype(jnp.int32)

        out = jax.lax.dynamic_update_slice(
            out, jnp.where(valid, s, 0), (t * lanes,))
        return (state, ptr, out), None

    out0 = jnp.zeros((cap,), jnp.int32)
    (state, ptr, out), _ = jax.lax.scan(
        step, (state0, ptr0, out0), jnp.arange(steps))
    return (state, ptr), out


# ---------------------------------------------------------------------------
# host-side stream (de)framing
# ---------------------------------------------------------------------------

def pack_stream(words_np: np.ndarray, n_words_np: np.ndarray) -> bytes:
    """Trim lanes to their word counts, reverse each (rANS decode reads
    the push order backwards), frame as:
    u16 lane_count | u16[lanes] counts | u16 words (lane-major)."""
    lanes = words_np.shape[0]
    parts = [np.uint16(lanes).tobytes(),
             n_words_np.astype(np.uint16).tobytes()]
    for j in range(lanes):
        parts.append(words_np[j, : n_words_np[j]][::-1].tobytes())
    return b"".join(parts)


def unpack_stream(stream: bytes, word_cap: int):
    """-> (words [lanes, word_cap] uint16 padded, counts [lanes])."""
    lanes = int(np.frombuffer(stream[:2], np.uint16)[0])
    counts = np.frombuffer(stream[2 : 2 + 2 * lanes], np.uint16).astype(
        np.int64)
    flat = np.frombuffer(stream[2 + 2 * lanes :], np.uint16)
    words = np.zeros((lanes, word_cap), np.uint16)
    off = 0
    for j in range(lanes):
        words[j, : counts[j]] = flat[off : off + counts[j]]
        off += counts[j]
    return words, counts
