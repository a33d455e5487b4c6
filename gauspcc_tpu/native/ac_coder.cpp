// Chunk-parallel binary arithmetic coder (precision-16) over int16-normalized CDFs.
//
// TPU-native equivalent of the reference's CUDA `arithmetic` extension
// (HAC/submodules/arithmetic.zip: arithmetic_kernel.cu:94-163 encode,
// :237-356 decode) and of torchac's encode/decode_int16_normalized_cdf:
// probability evaluation happens on the TPU (XLA) and produces the
// normalized uint16 CDF table; this library performs only the inherently
// serial bit-emit/bit-consume, parallelized across independent
// fixed-size symbol chunks with std::thread (structurally identical to
// the reference's one-CUDA-thread-per-chunk design, but on host cores).
//
// CDF convention (shared with gauspcc_tpu.core.cdf.normalize_cdf_int16):
//   cdf_u16[i][s] = round(cdf_float[i][s] * (2^16 - (Lp-1))) + s   for s < Lp-1
//   the implicit top of the range for the last symbol is 2^16.
// Rows are strictly monotonically increasing, so every symbol has
// nonzero probability mass. The last column (s = Lp-1) is never read.
//
// C ABI only; bound from Python via ctypes (gauspcc_tpu/ops/coder.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecision = 16;
constexpr uint64_t kCdfTop = 1ull << kPrecision;

struct BitWriter {
  uint8_t* out;
  int64_t len = 0;
  uint8_t cache = 0;
  uint8_t count = 0;

  inline void append(int bit) {
    cache = static_cast<uint8_t>((cache << 1) | bit);
    if (++count == 8) {
      out[len++] = cache;
      count = 0;
      cache = 0;
    }
  }
  inline void append_with_pending(int bit, uint64_t& pending) {
    append(bit);
    while (pending > 0) {
      append(!bit);
      --pending;
    }
  }
  inline void flush() {
    while (count != 0) append(0);
  }
};

struct BitReader {
  const uint8_t* in;
  int64_t len;
  int64_t ptr = 0;
  uint8_t cache = 0;
  uint8_t cached_bits = 0;

  inline void get(uint32_t& value) {
    if (cached_bits == 0) {
      if (ptr == len) {
        value <<= 1;
        return;
      }
      cache = in[ptr++];
      cached_bits = 8;
    }
    value <<= 1;
    value |= (cache >> (cached_bits - 1)) & 1u;
    --cached_bits;
  }
  inline void initialize(uint32_t& value) {
    for (int i = 0; i < 32; ++i) get(value);
  }
};

// Encode symbols [begin, end) of one chunk. cdf is row-major [N, Lp] uint16.
int64_t encode_chunk(const uint16_t* cdf, const int16_t* sym, int64_t begin,
                     int64_t end, int Lp, uint8_t* out) {
  const int max_symbol = Lp - 2;
  BitWriter w{out};
  uint32_t low = 0;
  uint32_t high = 0xFFFFFFFFu;
  uint64_t pending = 0;

  for (int64_t i = begin; i < end; ++i) {
    const int s = sym[i];
    const uint16_t* row = cdf + i * Lp;
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    const uint64_t c_low = row[s];
    const uint64_t c_high = (s == max_symbol) ? kCdfTop : row[s + 1];

    high = static_cast<uint32_t>((low - 1) + ((span * c_high) >> kPrecision));
    low = static_cast<uint32_t>(low + ((span * c_low) >> kPrecision));

    while (true) {
      if (high < 0x80000000u) {
        w.append_with_pending(0, pending);
        low <<= 1;
        high = (high << 1) | 1u;
      } else if (low >= 0x80000000u) {
        w.append_with_pending(1, pending);
        low <<= 1;
        high = (high << 1) | 1u;
      } else if (low >= 0x40000000u && high < 0xC0000000u) {
        ++pending;
        low = (low << 1) & 0x7FFFFFFFu;
        high = (high << 1) | 0x80000001u;
      } else {
        break;
      }
    }
  }

  ++pending;
  if (low < 0x40000000u) {
    w.append_with_pending(0, pending);
  } else {
    w.append_with_pending(1, pending);
  }
  w.flush();
  return w.len;
}

void decode_chunk(const uint16_t* cdf, const uint8_t* in, int64_t in_len,
                  int64_t begin, int64_t end, int Lp, int16_t* out_sym) {
  const int max_symbol = Lp - 2;
  BitReader r{in, in_len};
  uint32_t low = 0;
  uint32_t high = 0xFFFFFFFFu;
  uint32_t value = 0;
  r.initialize(value);

  for (int64_t i = begin; i < end; ++i) {
    const uint16_t* row = cdf + i * Lp;
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    const uint16_t target = static_cast<uint16_t>(
        ((static_cast<uint64_t>(value) - low + 1) * kCdfTop - 1) / span);

    // Binary search: largest s in [0, max_symbol] with row[s] <= target,
    // mirroring the reference binsearch (arithmetic_kernel.cu:278-300).
    int left = 0;
    int right = max_symbol + 1;
    while (left + 1 < right) {
      const int m = (left + right) / 2;
      const uint16_t v = row[m];
      if (v < target) {
        left = m;
      } else if (v > target) {
        right = m;
      } else {
        left = m;
        break;
      }
    }
    const int s = left;
    out_sym[i] = static_cast<int16_t>(s);

    const uint64_t c_low = row[s];
    const uint64_t c_high = (s == max_symbol) ? kCdfTop : row[s + 1];
    high = static_cast<uint32_t>((low - 1) + ((span * c_high) >> kPrecision));
    low = static_cast<uint32_t>(low + ((span * c_low) >> kPrecision));

    while (true) {
      if (low >= 0x80000000u || high < 0x80000000u) {
        low <<= 1;
        high = (high << 1) | 1u;
        r.get(value);
      } else if (low >= 0x40000000u && high < 0xC0000000u) {
        low = (low << 1) & 0x7FFFFFFFu;
        high = (high << 1) | 0x80000001u;
        value -= 0x40000000u;
        r.get(value);
      } else {
        break;
      }
    }
  }
}

void parallel_for_chunks(int64_t n_chunks, int n_threads,
                         const std::function<void(int64_t)>& fn) {
  if (n_threads <= 1 || n_chunks <= 1) {
    for (int64_t c = 0; c < n_chunks; ++c) fn(c);
    return;
  }
  std::vector<std::thread> workers;
  std::atomic<int64_t> next{0};
  const int n = static_cast<int>(std::min<int64_t>(n_threads, n_chunks));
  workers.reserve(n);
  for (int t = 0; t < n; ++t) {
    workers.emplace_back([&]() {
      while (true) {
        const int64_t c = next.fetch_add(1);
        if (c >= n_chunks) return;
        fn(c);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// Per-chunk worst case output bytes (matches the reference's chunk_size*4
// bound, arithmetic_kernel.cu: out_cache_all = zeros({chunk_num, chunk_size*4}),
// plus slack for the final flush).
int64_t ac_max_chunk_bytes(int64_t chunk_size) { return chunk_size * 4 + 16; }

// Encode N symbols with row-wise CDFs.
//   cdf:        [N, Lp] uint16 normalized CDF rows
//   sym:        [N] int16 symbols in [0, Lp-2]
//   chunk_size: symbols per independent chunk
//   out:        [n_chunks * ac_max_chunk_bytes(chunk_size)] scratch; chunk c
//               writes at offset c * ac_max_chunk_bytes(chunk_size)
//   chunk_lens: [n_chunks] output byte counts
// Returns total bytes across chunks (or -1 on bad args).
int64_t ac_encode(const uint16_t* cdf, int64_t N, int32_t Lp,
                  const int16_t* sym, int64_t chunk_size, int32_t n_threads,
                  uint8_t* out, int64_t* chunk_lens) {
  if (N < 0 || Lp < 2 || chunk_size <= 0) return -1;
  if (N == 0) return 0;
  const int64_t n_chunks = (N + chunk_size - 1) / chunk_size;
  const int64_t stride = ac_max_chunk_bytes(chunk_size);
  parallel_for_chunks(n_chunks, n_threads, [&](int64_t c) {
    const int64_t begin = c * chunk_size;
    const int64_t end = std::min<int64_t>(begin + chunk_size, N);
    chunk_lens[c] = encode_chunk(cdf, sym, begin, end, Lp, out + c * stride);
  });
  int64_t total = 0;
  for (int64_t c = 0; c < n_chunks; ++c) total += chunk_lens[c];
  return total;
}

// Decode N symbols. `in` is the concatenation of chunk byte streams with
// lengths `chunk_lens` (as produced by packing ac_encode output).
int32_t ac_decode(const uint16_t* cdf, int64_t N, int32_t Lp,
                  const uint8_t* in, const int64_t* chunk_lens,
                  int64_t chunk_size, int32_t n_threads, int16_t* out_sym) {
  if (N < 0 || Lp < 2 || chunk_size <= 0) return -1;
  if (N == 0) return 0;
  const int64_t n_chunks = (N + chunk_size - 1) / chunk_size;
  std::vector<int64_t> offsets(n_chunks + 1, 0);
  for (int64_t c = 0; c < n_chunks; ++c) {
    offsets[c + 1] = offsets[c] + chunk_lens[c];
  }
  parallel_for_chunks(n_chunks, n_threads, [&](int64_t c) {
    const int64_t begin = c * chunk_size;
    const int64_t end = std::min<int64_t>(begin + chunk_size, N);
    decode_chunk(cdf, in + offsets[c], chunk_lens[c], begin, end, Lp, out_sym);
  });
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Incremental (stateful) decoder: consumes a stream sequentially in caller-
// sized batches whose CDF rows are only known progressively (autoregressive
// models — e.g. the CAT-3DGS wavefront latent decode, where wave w's
// probabilities depend on waves < w). Chunk boundaries are handled by
// re-initializing the bit reader at each chunk's offset.
// ---------------------------------------------------------------------------

struct AcDecState {
  std::vector<uint8_t> payload;
  std::vector<int64_t> offsets;  // per-chunk byte offsets (n_chunks + 1)
  int64_t chunk_size;
  int64_t n_total;
  int64_t pos = 0;  // symbols decoded so far
  // live chunk coder state
  int64_t chunk = -1;
  BitReader reader{nullptr, 0};
  uint32_t low = 0, high = 0, value = 0;
};

extern "C" {

AcDecState* ac_dec_create(const uint8_t* payload, int64_t payload_len,
                          const int64_t* chunk_lens, int64_t n_chunks,
                          int64_t chunk_size, int64_t n_total) {
  auto* st = new AcDecState();
  st->payload.assign(payload, payload + payload_len);
  st->offsets.resize(n_chunks + 1);
  st->offsets[0] = 0;
  for (int64_t c = 0; c < n_chunks; ++c) {
    st->offsets[c + 1] = st->offsets[c] + chunk_lens[c];
  }
  st->chunk_size = chunk_size;
  st->n_total = n_total;
  return st;
}

// Decode `count` further symbols; cdf holds their rows [count, Lp].
// Returns number decoded (or -1 on misuse).
int64_t ac_dec_next(AcDecState* st, const uint16_t* cdf, int32_t lp,
                    int64_t count, int16_t* out) {
  if (st == nullptr || lp < 2 || count < 0) return -1;
  if (st->pos + count > st->n_total) return -1;
  const int max_symbol = lp - 2;

  for (int64_t i = 0; i < count; ++i) {
    const int64_t chunk = st->pos / st->chunk_size;
    if (chunk != st->chunk) {
      st->chunk = chunk;
      st->reader = BitReader{st->payload.data() + st->offsets[chunk],
                             st->offsets[chunk + 1] - st->offsets[chunk]};
      st->low = 0;
      st->high = 0xFFFFFFFFu;
      st->value = 0;
      st->reader.initialize(st->value);
    }
    const uint16_t* row = cdf + i * lp;
    const uint64_t span = static_cast<uint64_t>(st->high) - st->low + 1;
    const uint16_t target = static_cast<uint16_t>(
        ((static_cast<uint64_t>(st->value) - st->low + 1) * kCdfTop - 1) / span);

    int left = 0;
    int right = max_symbol + 1;
    while (left + 1 < right) {
      const int m = (left + right) / 2;
      const uint16_t v = row[m];
      if (v < target) {
        left = m;
      } else if (v > target) {
        right = m;
      } else {
        left = m;
        break;
      }
    }
    const int s = left;
    out[i] = static_cast<int16_t>(s);

    const uint64_t c_low = row[s];
    const uint64_t c_high = (s == max_symbol) ? kCdfTop : row[s + 1];
    st->high = static_cast<uint32_t>(
        (st->low - 1) + ((span * c_high) >> kPrecision));
    st->low = static_cast<uint32_t>(st->low + ((span * c_low) >> kPrecision));

    while (true) {
      if (st->low >= 0x80000000u || st->high < 0x80000000u) {
        st->low <<= 1;
        st->high = (st->high << 1) | 1u;
        st->reader.get(st->value);
      } else if (st->low >= 0x40000000u && st->high < 0xC0000000u) {
        st->low = (st->low << 1) & 0x7FFFFFFFu;
        st->high = (st->high << 1) | 0x80000001u;
        st->value -= 0x40000000u;
        st->reader.get(st->value);
      } else {
        break;
      }
    }
    st->pos += 1;
  }
  return count;
}

void ac_dec_free(AcDecState* st) { delete st; }

}  // extern "C"

// ---------------------------------------------------------------------------
// Model-based coding: Gaussian-mixture CDFs evaluated on the fly.
//
// The table path above ships [N, Lp] uint16 rows from the device; at scene
// scale an outlier-widened residual range makes that table the dominant
// device->host transfer (tens of MB per 3000-anchor batch over a tunneled
// link). Here the host receives only the residual-space model — mu, sigma,
// weight per mixture component (12*K bytes/symbol) — and evaluates the
// same normalized-CDF convention per symbol: ~2K erfc per encoded symbol,
// ~K*log2(Lp) per decoded one. Matches the reference's probability model
// (encodings_cuda.py encoder_gaussian / encoder_gaussian_mixed +
// arithmetic_kernel.cu calculate_cdf_kernel's erfc), with the CDF math in
// one double-precision implementation shared by encode and decode.
// ---------------------------------------------------------------------------

#include <cmath>

namespace {

struct GaussRows {
  const float* mu;     // [N*K] residual-space means
  const float* sigma;  // [N*K] residual-space scales
  const float* w;      // [N*K] mixture weights (need not be normalized)
  int K;
  int Lp;      // columns incl. the +1 boundary (rmax - rmin + 2)
  int rmin;

  // raw mixture CDF at symbol boundary t - 0.5 (t in [0, Lp-1])
  inline double raw(int64_t i, int t) const {
    const double xb = rmin + t - 0.5;
    double acc = 0.0, wsum = 0.0;
    for (int k = 0; k < K; ++k) {
      const double m = mu[i * K + k];
      const double s = std::max(static_cast<double>(sigma[i * K + k]), 1e-9);
      const double ww = std::max(static_cast<double>(w[i * K + k]), 0.0);
      acc += ww * 0.5 * std::erfc(-(xb - m) / (s * 1.4142135623730951));
      wsum += ww;
    }
    return acc / std::max(wsum, 1e-30);
  }

  // normalized uint16 CDF value (same convention as the table path:
  // round(c01 * (2^16 - (Lp-1))) + t; top of range implicit at 2^16)
  inline uint64_t u16(int64_t i, int t, double f0, double inv_norm) const {
    double c01 = (raw(i, t) - f0) * inv_norm;
    c01 = c01 < 0.0 ? 0.0 : (c01 > 1.0 ? 1.0 : c01);
    const double new_max = static_cast<double>(kCdfTop) - (Lp - 1);
    return static_cast<uint64_t>(std::llround(c01 * new_max)) +
           static_cast<uint64_t>(t);
  }

  inline void norm_consts(int64_t i, double& f0, double& inv_norm) const {
    f0 = raw(i, 0);
    const double fl = raw(i, Lp - 1);
    inv_norm = 1.0 / std::max(fl - f0, 1e-12);
  }
};

int64_t encode_chunk_gauss(const GaussRows& g, const int16_t* sym,
                           int64_t begin, int64_t end, uint8_t* out) {
  const int max_symbol = g.Lp - 2;
  BitWriter wtr{out};
  uint32_t low = 0;
  uint32_t high = 0xFFFFFFFFu;
  uint64_t pending = 0;

  for (int64_t i = begin; i < end; ++i) {
    const int s = sym[i];
    double f0, inv_norm;
    g.norm_consts(i, f0, inv_norm);
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    const uint64_t c_low = g.u16(i, s, f0, inv_norm);
    const uint64_t c_high =
        (s == max_symbol) ? kCdfTop : g.u16(i, s + 1, f0, inv_norm);

    high = static_cast<uint32_t>((low - 1) + ((span * c_high) >> kPrecision));
    low = static_cast<uint32_t>(low + ((span * c_low) >> kPrecision));

    while (true) {
      if (high < 0x80000000u) {
        wtr.append_with_pending(0, pending);
        low <<= 1;
        high = (high << 1) | 1u;
      } else if (low >= 0x80000000u) {
        wtr.append_with_pending(1, pending);
        low <<= 1;
        high = (high << 1) | 1u;
      } else if (low >= 0x40000000u && high < 0xC0000000u) {
        ++pending;
        low = (low << 1) & 0x7FFFFFFFu;
        high = (high << 1) | 0x80000001u;
      } else {
        break;
      }
    }
  }

  ++pending;
  if (low < 0x40000000u) {
    wtr.append_with_pending(0, pending);
  } else {
    wtr.append_with_pending(1, pending);
  }
  wtr.flush();
  return wtr.len;
}

void decode_chunk_gauss(const GaussRows& g, const uint8_t* in, int64_t in_len,
                        int64_t begin, int64_t end, int16_t* out_sym) {
  const int max_symbol = g.Lp - 2;
  BitReader r{in, in_len};
  uint32_t low = 0;
  uint32_t high = 0xFFFFFFFFu;
  uint32_t value = 0;
  r.initialize(value);

  for (int64_t i = begin; i < end; ++i) {
    double f0, inv_norm;
    g.norm_consts(i, f0, inv_norm);
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    const uint16_t target = static_cast<uint16_t>(
        ((static_cast<uint64_t>(value) - low + 1) * kCdfTop - 1) / span);

    int left = 0;
    int right = max_symbol + 1;
    while (left + 1 < right) {
      const int m = (left + right) / 2;
      const uint64_t v = g.u16(i, m, f0, inv_norm);
      if (v < target) {
        left = m;
      } else if (v > target) {
        right = m;
      } else {
        left = m;
        break;
      }
    }
    const int s = left;
    out_sym[i] = static_cast<int16_t>(s);

    const uint64_t c_low = g.u16(i, s, f0, inv_norm);
    const uint64_t c_high =
        (s == max_symbol) ? kCdfTop : g.u16(i, s + 1, f0, inv_norm);
    high = static_cast<uint32_t>((low - 1) + ((span * c_high) >> kPrecision));
    low = static_cast<uint32_t>(low + ((span * c_low) >> kPrecision));

    while (true) {
      if (low >= 0x80000000u || high < 0x80000000u) {
        low <<= 1;
        high = (high << 1) | 1u;
        r.get(value);
      } else if (low >= 0x40000000u && high < 0xC0000000u) {
        low = (low << 1) & 0x7FFFFFFFu;
        high = (high << 1) | 0x80000001u;
        value -= 0x40000000u;
        r.get(value);
      } else {
        break;
      }
    }
  }
}

}  // namespace

extern "C" {

int64_t ac_encode_gauss(const float* mu, const float* sigma, const float* w,
                        int32_t K, int64_t N, int32_t rmin, int32_t Lp,
                        const int16_t* sym, int64_t chunk_size,
                        int32_t n_threads, uint8_t* out, int64_t* chunk_lens) {
  if (N < 0 || Lp < 2 || chunk_size <= 0 || K < 1) return -1;
  if (N == 0) return 0;
  const GaussRows g{mu, sigma, w, K, Lp, rmin};
  const int64_t n_chunks = (N + chunk_size - 1) / chunk_size;
  const int64_t stride = ac_max_chunk_bytes(chunk_size);
  parallel_for_chunks(n_chunks, n_threads, [&](int64_t c) {
    const int64_t begin = c * chunk_size;
    const int64_t end = std::min<int64_t>(begin + chunk_size, N);
    chunk_lens[c] = encode_chunk_gauss(g, sym, begin, end, out + c * stride);
  });
  int64_t total = 0;
  for (int64_t c = 0; c < n_chunks; ++c) total += chunk_lens[c];
  return total;
}

int32_t ac_decode_gauss(const float* mu, const float* sigma, const float* w,
                        int32_t K, int64_t N, int32_t rmin, int32_t Lp,
                        const uint8_t* in, const int64_t* chunk_lens,
                        int64_t chunk_size, int32_t n_threads,
                        int16_t* out_sym) {
  if (N < 0 || Lp < 2 || chunk_size <= 0 || K < 1) return -1;
  if (N == 0) return 0;
  const GaussRows g{mu, sigma, w, K, Lp, rmin};
  const int64_t n_chunks = (N + chunk_size - 1) / chunk_size;
  std::vector<int64_t> offsets(n_chunks + 1, 0);
  for (int64_t c = 0; c < n_chunks; ++c) {
    offsets[c + 1] = offsets[c] + chunk_lens[c];
  }
  parallel_for_chunks(n_chunks, n_threads, [&](int64_t c) {
    const int64_t begin = c * chunk_size;
    const int64_t end = std::min<int64_t>(begin + chunk_size, N);
    decode_chunk_gauss(g, in + offsets[c], chunk_lens[c], begin, end, out_sym);
  });
  return 0;
}

}  // extern "C"
