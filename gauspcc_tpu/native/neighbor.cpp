// Host-side sparse-voxel geometry for the GausPcgc codec.
//
// TPU-native split (SURVEY.md §3.2/§7): the occupancy-context NETWORK runs
// as batched XLA on device, but the integer set operations around it —
// child expansion of the dyadic pyramid and submanifold-conv neighbor
// maps over lex-sorted voxels — are branchy pointer-chasing that a TPU
// executes orders of magnitude slower than a host core (measured: the
// on-device binary-search neighbor map costs ~2.2 s at 262k voxels where
// this builder costs ~20 ms). The reference relegates the same work to
// torchsparse's CPU/CUDA hashmap kmaps (GausPcgc/train.py:32-34); here it
// is two-pointer merges over lex-sorted int32 coords, O(K^2 * N).
//
// Conventions (must match gauspcc_tpu/ops/sparse.py):
//   - coords are non-negative int32 [N, 3] (x, y, z), lex-sorted with z
//     most significant, unique, valid prefix of the padded capacity.
//   - octant o = (x&1) + 2*(y&1) + 4*(z&1)  (kit/nn.py:64-75 semantics).
//   - kernel tap t = ((dz+r)*k + (dy+r))*k + (dx+r)  == kernel_offsets()
//     enumeration (x fastest).
//   - neighbor map idx[t][q] = source row, or -1 when no neighbor.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Packed lex key, z most significant. Coords are biased so small negative
// probe values stay ordered; valid for coords < 2^20.
inline int64_t key3(int32_t x, int32_t y, int32_t z) {
  return ((int64_t)(z + 8) << 42) | ((int64_t)(y + 8) << 21) | (int64_t)(x + 8);
}

inline int64_t key_row(const int32_t* c, int64_t i) {
  return key3(c[3 * i], c[3 * i + 1], c[3 * i + 2]);
}

void run_parallel(int64_t n_tasks, int n_threads,
                  const std::function<void(int64_t)>& fn) {
  if (n_threads <= 1 || n_tasks <= 1) {
    for (int64_t t = 0; t < n_tasks; ++t) fn(t);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int nt = std::min<int64_t>(n_threads, n_tasks);
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) {
    pool.emplace_back([&] {
      for (int64_t t; (t = next.fetch_add(1)) < n_tasks;) fn(t);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Expand the occupied children of lex-sorted parents, in lex order.
// Output arrays have capacity `ccap`; rows past the returned count are
// zero/-1 filled. Returns the child count, or -1 on overflow.
// Equivalent of FCG expansion + sort_CF (kit/nn.py:58-98, kit/op.py:17-30).
int64_t nm_children(const int32_t* pcoords, const uint8_t* pocc, int64_t np_,
                    int64_t ccap, int32_t* ccoords, int32_t* octant,
                    int32_t* parent_idx) {
  // Per-octant child lists are already sorted (monotone map of sorted
  // parents), so the lex-sorted union is an 8-way merge.
  int64_t pos[8];
  int64_t head_key[8];
  static const int32_t OFF[8][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
                                    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
  const int64_t SENTINEL = INT64_MAX;
  auto advance = [&](int o) {
    // move pos[o] to the next parent with octant bit o set; update head key
    int64_t p = pos[o];
    while (p < np_ && !((pocc[p] >> o) & 1)) ++p;
    pos[o] = p;
    if (p >= np_) {
      head_key[o] = SENTINEL;
    } else {
      head_key[o] = key3(2 * pcoords[3 * p] + OFF[o][0],
                         2 * pcoords[3 * p + 1] + OFF[o][1],
                         2 * pcoords[3 * p + 2] + OFF[o][2]);
    }
  };
  for (int o = 0; o < 8; ++o) {
    pos[o] = 0;
    advance(o);
  }
  int64_t n = 0;
  for (;;) {
    int best = -1;
    int64_t bk = SENTINEL;
    for (int o = 0; o < 8; ++o) {
      if (head_key[o] < bk) {
        bk = head_key[o];
        best = o;
      }
    }
    if (best < 0) break;
    if (n >= ccap) return -1;
    int64_t p = pos[best];
    ccoords[3 * n] = 2 * pcoords[3 * p] + OFF[best][0];
    ccoords[3 * n + 1] = 2 * pcoords[3 * p + 1] + OFF[best][1];
    ccoords[3 * n + 2] = 2 * pcoords[3 * p + 2] + OFF[best][2];
    octant[n] = best;
    parent_idx[n] = (int32_t)p;
    ++n;
    pos[best] = p + 1;
    advance(best);
  }
  for (int64_t i = n; i < ccap; ++i) {
    ccoords[3 * i] = 0;
    ccoords[3 * i + 1] = 0;
    ccoords[3 * i + 2] = 0;
    octant[i] = 0;
    parent_idx[i] = -1;
  }
  return n;
}

// Submanifold-conv neighbor map: queries == sources == coords[0:n]
// (lex-sorted, unique). out_idx is [k^3, ncap] int32 row-major; -1 where
// no neighbor (including all padded queries q >= n).
int64_t nm_build(const int32_t* coords, int64_t n, int64_t ncap, int32_t k,
                 int32_t n_threads, int32_t* out_idx) {
  if (k < 1 || k > 9 || n < 0 || ncap < n) return -1;
  const int32_t r = k / 2;
  const int64_t k3 = (int64_t)k * k * k;
  std::memset(out_idx, 0xff, sizeof(int32_t) * k3 * ncap);  // all -1
  if (n == 0) return 0;

  // precompute source keys once (shared, read-only)
  std::vector<int64_t> keys((size_t)n);
  for (int64_t i = 0; i < n; ++i) keys[i] = key_row(coords, i);

  const int64_t block = 65536;
  const int64_t n_blocks = (n + block - 1) / block;
  const int64_t rows = (int64_t)k * k;  // (dz, dy) pairs
  std::function<void(int64_t)> task = [&](int64_t t) {
    const int64_t row = t / n_blocks;
    const int64_t b = t % n_blocks;
    const int32_t dz = (int32_t)(row / k) - r;
    const int32_t dy = (int32_t)(row % k) - r;
    const int64_t q0 = b * block;
    const int64_t q1 = std::min(n, q0 + block);
    // initial source pointer: lower_bound of the first query's probe key
    int64_t lo_key = key3(coords[3 * q0] - r, coords[3 * q0 + 1] + dy,
                          coords[3 * q0 + 2] + dz);
    int64_t p = std::lower_bound(keys.begin(), keys.end(), lo_key) -
                keys.begin();
    for (int64_t q = q0; q < q1; ++q) {
      const int32_t qx = coords[3 * q];
      const int32_t qy = coords[3 * q + 1] + dy;
      const int32_t qz = coords[3 * q + 2] + dz;
      const int64_t lo = key3(qx - r, qy, qz);
      while (p < n && keys[p] < lo) ++p;
      // inspect up to k consecutive sources in this (z, y) run
      for (int64_t s = p; s < n && s < p + k; ++s) {
        const int32_t sx = coords[3 * s];
        if (coords[3 * s + 2] != qz || coords[3 * s + 1] != qy) break;
        const int32_t dx = sx - qx;
        if (dx > r) break;
        const int64_t tap = (row * k) + (dx + r);
        out_idx[tap * ncap + q] = (int32_t)s;
      }
    }
  };
  run_parallel(rows * n_blocks, n_threads, task);
  return 0;
}

// Packed neighbor map: per (dz, dy) kernel row, the window START
// `lo[row][q]` (lower_bound of (qz+dz, qy+dy, qx-r) in the sorted
// sources) plus a 3-bit field per x-offset bin giving the window slot
// holding that neighbor (7 = none):
//   slot = (codes[row][q] >> (3 * dxbin)) & 7;  idx = lo + slot.
// 6 bytes/child/row instead of 4*k — the host->device upload is the
// serial-latency driver on a tunneled TPU. Requires k <= 5.
int64_t nm_build_packed(const int32_t* coords, int64_t n, int64_t ncap,
                        int32_t k, int32_t n_threads, int32_t* out_lo,
                        uint16_t* out_codes) {
  if (k < 1 || k > 5 || n < 0 || ncap < n) return -1;
  const int32_t r = k / 2;
  const int64_t k2 = (int64_t)k * k;
  std::memset(out_lo, 0, sizeof(int32_t) * k2 * ncap);
  // 7 in every field = no neighbor
  std::memset(out_codes, 0xff, sizeof(uint16_t) * k2 * ncap);
  if (n == 0) return 0;

  std::vector<int64_t> keys((size_t)n);
  for (int64_t i = 0; i < n; ++i) keys[i] = key_row(coords, i);

  const int64_t block = 65536;
  const int64_t n_blocks = (n + block - 1) / block;
  std::function<void(int64_t)> task = [&](int64_t t) {
    const int64_t row = t / n_blocks;
    const int64_t b = t % n_blocks;
    const int32_t dz = (int32_t)(row / k) - r;
    const int32_t dy = (int32_t)(row % k) - r;
    const int64_t q0 = b * block;
    const int64_t q1 = std::min(n, q0 + block);
    int64_t lo_key = key3(coords[3 * q0] - r, coords[3 * q0 + 1] + dy,
                          coords[3 * q0 + 2] + dz);
    int64_t p = std::lower_bound(keys.begin(), keys.end(), lo_key) -
                keys.begin();
    for (int64_t q = q0; q < q1; ++q) {
      const int32_t qx = coords[3 * q];
      const int32_t qy = coords[3 * q + 1] + dy;
      const int32_t qz = coords[3 * q + 2] + dz;
      const int64_t lo = key3(qx - r, qy, qz);
      while (p < n && keys[p] < lo) ++p;
      uint16_t code = 0x7fff;  // all fields = 7
      for (int64_t s = p; s < n && s < p + k; ++s) {
        if (coords[3 * s + 2] != qz || coords[3 * s + 1] != qy) break;
        const int32_t dx = coords[3 * s] - qx;
        if (dx > r) break;
        const int32_t bin = dx + r;
        code = (uint16_t)((code & ~(7u << (3 * bin))) |
                          ((uint32_t)(s - p) << (3 * bin)));
      }
      out_lo[row * ncap + q] = (int32_t)p;
      out_codes[row * ncap + q] = code;
    }
  };
  run_parallel(k2 * n_blocks, n_threads, task);
  return 0;
}

}  // extern "C"
