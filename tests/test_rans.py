"""Device rANS coder: multi-stage lane-interleaved round-trip + rate."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gauspcc_tpu.core import cdf as cdf_lib
from gauspcc_tpu.ops import rans

pytestmark = pytest.mark.smoke


def _random_tables(rng, cap, lps):
    """One (table, syms) pair per stage; rows are peaked so rate is sane."""
    tables, syms = [], []
    for lp in lps:
        n_sym = lp - 1
        logits = rng.normal(0, 2.0, (cap, n_sym)).astype(np.float32)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        tables.append(np.asarray(
            cdf_lib.probs_to_cdf_int16(jnp.asarray(probs))))
        # draw symbols from the modeled distribution half the time
        draw = np.array([rng.choice(n_sym, p=probs[i]) for i in range(cap)])
        syms.append(draw.astype(np.int32))
    return tables, syms


def test_multistage_roundtrip_and_rate():
    rng = np.random.default_rng(0)
    cap = 1024
    lps = (3, 3, 5, 17)
    n_valid = 900
    tables, syms = _random_tables(rng, cap, lps)

    carry = rans.enc_init(cap)
    for t, s in zip(tables[::-1], syms[::-1]):
        carry = rans.encode_stage(carry, jnp.asarray(t), jnp.asarray(s),
                                  jnp.int32(n_valid))
    words, n_words = rans.enc_flush(carry)
    stream = rans.pack_stream(np.asarray(words), np.asarray(n_words))

    wcap = rans.word_capacity(cap)
    w_np, _ = rans.unpack_stream(stream, wcap)
    dc = rans.dec_init(jnp.asarray(w_np))
    for t, s in zip(tables, syms):
        dc, out = rans.decode_stage(dc, jnp.asarray(t), jnp.asarray(w_np),
                                    jnp.int32(n_valid))
        np.testing.assert_array_equal(np.asarray(out)[:n_valid], s[:n_valid])

    # rate: stream bits within overhead of the CDF cross-entropy
    bits = 0.0
    for t, s in zip(tables, syms):
        cdf = t.astype(np.int64)[:n_valid]
        lo = np.take_along_axis(cdf, s[:n_valid, None], 1)[:, 0]
        hi = np.take_along_axis(cdf, s[:n_valid, None] + 1, 1)[:, 0]
        freq = (hi - lo) % (1 << 16)
        bits += float(np.sum(-np.log2(freq / 2.0**16)))
    actual = len(stream) * 8
    lanes = rans.lane_count(cap)
    overhead = lanes * 6 * 8 + 16  # flush states + counts + lane header
    assert actual <= bits * 1.02 + overhead, (actual, bits)
    assert actual >= bits * 0.98, (actual, bits)


def test_empty_and_tiny_n_valid():
    rng = np.random.default_rng(1)
    cap = 256
    tables, syms = _random_tables(rng, cap, (5,))
    for n_valid in (0, 1, 7):
        carry = rans.enc_init(cap, n_stages=1)
        carry = rans.encode_stage(carry, jnp.asarray(tables[0]),
                                  jnp.asarray(syms[0]), jnp.int32(n_valid))
        words, n_words = rans.enc_flush(carry)
        stream = rans.pack_stream(np.asarray(words), np.asarray(n_words))
        w_np, _ = rans.unpack_stream(stream, rans.word_capacity(cap, 1))
        dc = rans.dec_init(jnp.asarray(w_np))
        _, out = rans.decode_stage(dc, jnp.asarray(tables[0]),
                                   jnp.asarray(w_np), jnp.int32(n_valid))
        np.testing.assert_array_equal(
            np.asarray(out)[:n_valid], syms[0][:n_valid])


def test_skewed_distributions():
    """Near-deterministic rows (the common case for occupancy bits)."""
    cap = 512
    n_sym = 2
    probs = np.full((cap, n_sym), [0.999, 0.001], np.float32)
    table = np.asarray(cdf_lib.probs_to_cdf_int16(jnp.asarray(probs)))
    rng = np.random.default_rng(2)
    syms = (rng.random(cap) < 0.001).astype(np.int32)
    carry = rans.enc_init(cap, n_stages=1)
    carry = rans.encode_stage(carry, jnp.asarray(table), jnp.asarray(syms),
                              jnp.int32(cap))
    words, n_words = rans.enc_flush(carry)
    stream = rans.pack_stream(np.asarray(words), np.asarray(n_words))
    w_np, _ = rans.unpack_stream(stream, rans.word_capacity(cap, 1))
    dc = rans.dec_init(jnp.asarray(w_np))
    _, out = rans.decode_stage(dc, jnp.asarray(table), jnp.asarray(w_np),
                               jnp.int32(cap))
    np.testing.assert_array_equal(np.asarray(out), syms)
