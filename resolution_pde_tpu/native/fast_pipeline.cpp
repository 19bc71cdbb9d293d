// Native data-pipeline kernels: multithreaded batch gather and fused
// gather+standardize for the host side of the training input pipeline.
//
// The reference's data path is torch DataLoader workers doing per-sample
// __getitem__ + collate (dataloaders/*.py); here the whole pipeline is
// array-based, and the per-batch hot loop is a strided gather (fancy
// indexing) plus normalizer encode. Single-threaded numpy tops out around
// one memcpy stream; these kernels split the batch across threads.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfast_pipeline.so
//        fast_pipeline.cpp -lpthread
// Loaded via ctypes (resolution_pde_tpu/data/native.py) with a numpy
// fallback when the compiler or library is unavailable.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

void gather_range(const float* src, const int64_t* idx, float* dst,
                  int64_t row_bytes_f, int64_t begin, int64_t end) {
  for (int64_t i = begin; i < end; ++i) {
    std::memcpy(dst + i * row_bytes_f, src + idx[i] * row_bytes_f,
                row_bytes_f * sizeof(float));
  }
}

void gather_encode_range(const float* src, const int64_t* idx, float* dst,
                         int64_t row_bytes_f, float mean, float inv_std,
                         int64_t begin, int64_t end) {
  for (int64_t i = begin; i < end; ++i) {
    const float* s = src + idx[i] * row_bytes_f;
    float* d = dst + i * row_bytes_f;
    for (int64_t j = 0; j < row_bytes_f; ++j) {
      d[j] = (s[j] - mean) * inv_std;
    }
  }
}

int64_t pick_threads(int64_t n_rows, int64_t row_elems) {
  int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  if (hw <= 1) return 1;
  // don't spawn threads for tiny batches
  int64_t work = n_rows * row_elems;
  if (work < (1 << 18)) return 1;
  return std::min<int64_t>(hw, std::max<int64_t>(1, n_rows));
}

template <typename F>
void parallel_rows(int64_t n_rows, int64_t row_elems, F&& fn) {
  int64_t n_threads = pick_threads(n_rows, row_elems);
  if (n_threads == 1) {
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min(n_rows, b + chunk);
    if (b >= e) break;
    threads.emplace_back([&, b, e] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// src: (n_src, row_elems) f32 contiguous; idx: (n_rows,) i64;
// dst: (n_rows, row_elems) f32 contiguous.
void batch_gather_f32(const float* src, const int64_t* idx, float* dst,
                      int64_t n_rows, int64_t row_elems) {
  parallel_rows(n_rows, row_elems, [&](int64_t b, int64_t e) {
    gather_range(src, idx, dst, row_elems, b, e);
  });
}

// fused gather + (x - mean) / std
void batch_gather_encode_f32(const float* src, const int64_t* idx,
                             float* dst, int64_t n_rows, int64_t row_elems,
                             float mean, float std_plus_eps) {
  float inv = 1.0f / std_plus_eps;
  parallel_rows(n_rows, row_elems, [&](int64_t b, int64_t e) {
    gather_encode_range(src, idx, dst, row_elems, mean, inv, b, e);
  });
}

int native_pipeline_version() { return 1; }

}  // extern "C"
