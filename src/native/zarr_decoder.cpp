// Native zarr chunk decoder — the dataset-load hot path.
//
// The reference loads multi-year zarr trees into RAM through
// xarray/dask/zarr's C codecs (27.6-70 s per split on its SLURM node,
// `src/dlwpbench/Train.out:26`).  Here the equivalent runtime piece is a
// C++ multithreaded file-read + zlib-inflate: given N chunk files of one
// zarr array, threads read and decompress each chunk into one slot of a
// preallocated arena (GIL-free, memcpy/inflate-bound); Python then does
// the cheap vectorized scatter into the target array (handles edge
// chunks).  Used by `data/zarr_lite.py` when the toolchain is available;
// falls back to the pure-Python path otherwise.
//
// Exposed with a plain C ABI for ctypes; built by dlwpbench_tpu/data/native.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// Inflate `src` (zlib or gzip framed; wbits 32+15 auto-detects) into dst.
// Returns 0 on success.
int inflate_auto(const uint8_t* src, int64_t src_len, uint8_t* dst,
                 int64_t dst_cap, int64_t* dst_len) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 32 + 15) != Z_OK) return 1;
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_cap);
  int rc = inflate(&zs, Z_FINISH);
  *dst_len = static_cast<int64_t>(zs.total_out);
  inflateEnd(&zs);
  return rc == Z_STREAM_END ? 0 : 2;
}

// Hard cap on one compressed chunk file (a weather chunk is a few MB):
// guards the resize() below against garbage ftell results.
constexpr long kMaxChunkFile = 1L << 31;

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  // validate every stdio step: fopen can succeed on directories/pipes
  // where ftell returns -1 or nonsense, and resize((size_t)-1) would
  // throw inside a worker thread -> std::terminate for the whole process
  if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return 2; }
  long n = std::ftell(f);
  if (n < 0 || n > kMaxChunkFile || std::fseek(f, 0, SEEK_SET) != 0) {
    std::fclose(f);
    return 2;
  }
  buf->resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(buf->data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n) ? 0 : 2;
}

}  // namespace

extern "C" {

// Read + decode `n` chunk files into `arena` (n slots of `chunk_nbytes`).
// paths: concatenated NUL-terminated strings; offsets[i] = start of path i.
// compressed[i]: 0 = raw bytes, 1 = zlib/gzip.  ok[i]: 1 on success.
// Missing files set ok[i] = 0 (caller fills with fill_value).
void decode_zarr_chunks(const char* paths, const int64_t* offsets, int64_t n,
                        const uint8_t* compressed, uint8_t* arena,
                        int64_t chunk_nbytes, uint8_t* ok, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  auto work = [&](int tid) {
    for (int64_t i = tid; i < n; i += n_threads) {
      ok[i] = 0;
      const char* path = paths + offsets[i];
      std::vector<uint8_t> raw;
      try {
        if (read_file(path, &raw) != 0) continue;
      } catch (...) {
        continue;  // allocation failure -> ok stays 0 (never terminate)
      }
      uint8_t* dst = arena + i * chunk_nbytes;
      if (compressed[i]) {
        int64_t out_len = 0;
        if (inflate_auto(raw.data(), static_cast<int64_t>(raw.size()), dst,
                         chunk_nbytes, &out_len) != 0)
          continue;
        if (out_len != chunk_nbytes) continue;
      } else {
        if (static_cast<int64_t>(raw.size()) != chunk_nbytes) continue;
        std::memcpy(dst, raw.data(), static_cast<size_t>(chunk_nbytes));
      }
      ok[i] = 1;
    }
  };
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) workers.emplace_back(work, t);
  for (auto& w : workers) w.join();
}

}  // extern "C"
