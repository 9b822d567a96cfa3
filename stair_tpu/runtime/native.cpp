// stair_tpu native runtime: the host-side hot memory paths.
//
// The reference relies on native code for its data path (h5py's C HDF5
// reader, decord's C++ video decoder, torch DataLoader workers). This
// library is the equivalent for stair_tpu's input pipeline: video features
// live in one contiguous arena, and batch assembly — the per-batch gather of
// ragged per-video features into padded [B, F, D] device buffers plus mask
// fill — runs here multithreaded, off the Python interpreter. Gold-attention
// rasterization (span_to_attention over many supervision targets) is also
// provided.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread native.cpp -o _native.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  if (n <= 0) return;
  int workers = std::min<int64_t>(threads, n);
  if (workers <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// Gather ragged per-example rows from a contiguous arena into a padded
// [B, F, D] batch plus a [B, F] validity mask. `offsets[b]` is the row
// offset of example b's features in the arena; `lengths[b]` its row count
// (clamped to F).
void stair_gather_pad_f32(const float* arena, const int64_t* offsets,
                          const int32_t* lengths, int64_t batch, int64_t max_rows,
                          int64_t dim, float* out, float* mask, int threads) {
  parallel_for(batch, threads, [&](int64_t b) {
    const int64_t rows = std::min<int64_t>(lengths[b], max_rows);
    const float* src = arena + offsets[b] * dim;
    float* dst = out + b * max_rows * dim;
    std::memcpy(dst, src, sizeof(float) * rows * dim);
    std::memset(dst + rows * dim, 0, sizeof(float) * (max_rows - rows) * dim);
    float* m = mask + b * max_rows;
    std::fill(m, m + rows, 1.0f);
    std::fill(m + rows, m + max_rows, 0.0f);
  });
}

// Rasterize fractional frame intervals into per-frame weights, matching the
// reference span_to_attention semantics (train_module.py:67-81): interior
// frames get 1, boundary frames the fractional overlap.
// intervals: [N, 2] (start, end) floats; out: [N, F].
void stair_span_to_attention(const float* intervals, int64_t n, int64_t frames,
                             float* out, int threads) {
  parallel_for(n, threads, [&](int64_t i) {
    float* row = out + i * frames;
    std::memset(row, 0, sizeof(float) * frames);
    const double fmax = static_cast<double>(frames);
    double start = std::min(fmax - 0.002, std::max(0.001, (double)intervals[2 * i]));
    double end = std::min(fmax - 0.001, (double)intervals[2 * i + 1]);
    int64_t s = (int64_t)std::ceil(start);
    int64_t e = (int64_t)std::floor(end);
    if (s < e) {
      for (int64_t f = s; f < e; ++f) row[f] += 1.0f;
    }
    if (s <= e) {
      if (s - 1 >= 0 && s - 1 < frames) row[s - 1] += (float)(s - start);
      if (e >= 0 && e < frames) row[e] += (float)(end - e);
    } else if (e >= 0 && e < frames) {
      row[e] += (float)(end - start);
    }
  });
}

// Embedding-row gather: out[i] = table[ids[i]] (ids < 0 leave zeros).
void stair_gather_rows_f32(const float* table, const int64_t* ids, int64_t n,
                           int64_t dim, float* out, int threads) {
  parallel_for(n, threads, [&](int64_t i) {
    if (ids[i] < 0) {
      std::memset(out + i * dim, 0, sizeof(float) * dim);
    } else {
      std::memcpy(out + i * dim, table + ids[i] * dim, sizeof(float) * dim);
    }
  });
}

int stair_native_version() { return 1; }

}  // extern "C"
