// Native window-batch assembler — the data-loader hot path.
//
// The reference feeds models through a torch DataLoader with worker
// processes copying per-item windows (`scripts/train.py:148-160`,
// `data/datasets/datasets.py:330-416`).  Here the equivalent runtime piece
// is a C++ multithreaded gather: given the full in-RAM split
// [T, F] (feature size F = C*(faces)*H*W flattened per timestep) and a list
// of window start indices, copy the [B, seq, F] batch into a contiguous
// output buffer with one thread per batch slice — memcpy-bound, no Python
// in the loop, no per-item tensor allocation.
//
// Also provides fused gaussian-noise injection (xorshift128+ + Box-Muller,
// per-thread streams) matching the dataset's `prognostic + noise` semantics
// (`datasets.py:414`) without a second pass over the batch.
//
// Exposed with a plain C ABI for ctypes; built by dlwpbench_tpu/data/native.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct XorShift128Plus {
  uint64_t s0, s1;
  explicit XorShift128Plus(uint64_t seed) {
    // splitmix64 init
    uint64_t z = seed + 0x9E3779B97F4A7C15ULL;
    auto next = [&z]() {
      z += 0x9E3779B97F4A7C15ULL;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
      x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
      return x ^ (x >> 31);
    };
    s0 = next();
    s1 = next();
  }
  inline uint64_t next() {
    uint64_t x = s0;
    const uint64_t y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  inline float uniform() {  // (0, 1]
    return static_cast<float>(
        static_cast<double>((next() >> 11) + 1) * 0x1.0p-53);
  }
};

inline void gauss_pair(XorShift128Plus &rng, float &a, float &b) {
  float u1 = rng.uniform();
  float u2 = rng.uniform();
  float r = std::sqrt(-2.0f * std::log(u1));
  float t = 6.283185307179586f * u2;
  a = r * std::cos(t);
  b = r * std::sin(t);
}

}  // namespace

extern "C" {

// data:   [T, F] float32, row-major
// starts: [B] int64 window start indices (start + seq <= T)
// out:    [B, seq, F] float32 (preallocated)
void assemble_windows(const float *data, int64_t T, int64_t F,
                      const int64_t *starts, int64_t B, int64_t seq,
                      float *out, int n_threads) {
  (void)T;
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const float *src = data + starts[b] * F;
      std::memcpy(out + b * seq * F, src,
                  static_cast<size_t>(seq) * F * sizeof(float));
    }
  };
  if (n_threads == 1 || B == 1) {
    worker(0, B);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (B + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads && t * chunk < B; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, B);
    threads.emplace_back(worker, lo, hi);
  }
  for (auto &th : threads) th.join();
}

// In-place gaussian noise: out += noise_std * N(0, 1), per-thread streams.
void add_gaussian_noise(float *out, int64_t n, float noise_std, uint64_t seed,
                        int n_threads) {
  if (noise_std == 0.0f) return;
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int tid, int64_t lo, int64_t hi) {
    XorShift128Plus rng(seed ^ (0x517CC1B727220A95ULL * (tid + 1)));
    int64_t i = lo;
    for (; i + 1 < hi; i += 2) {
      float a, b;
      gauss_pair(rng, a, b);
      out[i] += noise_std * a;
      out[i + 1] += noise_std * b;
    }
    if (i < hi) {
      float a, b;
      gauss_pair(rng, a, b);
      out[i] += noise_std * a;
    }
  };
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads && t * chunk < n; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n);
    threads.emplace_back(worker, t, lo, hi);
  }
  for (auto &th : threads) th.join();
}

}  // extern "C"
