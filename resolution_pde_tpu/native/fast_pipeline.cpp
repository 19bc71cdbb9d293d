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

int native_pipeline_version() { return 2; }

}  // extern "C"

// ---------------------------------------------------------------------------
// Background batch-producer ring (the native input-pipeline runtime).
//
// A producer thread assembles (x, y) batches — multithreaded gather into a
// ring of caller-owned buffers — while the consumer (the jitted train
// loop) drains them in order. This overlaps host batch assembly with
// device compute without fighting the Python GIL (the producer holds no
// Python state). Protocol, via ctypes (data/native.py):
//   h = pipeline_create(x, y, order, ...buffers...)
//   rows = pipeline_acquire(h)   // blocks until the next batch is ready
//   ... consume slot (acquire_slot(h) says which buffer) ...
//   pipeline_release(h)          // recycle the slot
//   pipeline_destroy(h)
// ---------------------------------------------------------------------------

#include <condition_variable>
#include <mutex>

namespace {

struct NativePipeline {
  const float* x;
  const float* y;
  int64_t xrow, yrow;
  std::vector<int64_t> order;
  int64_t total_rows, batch, n_batches, depth;
  std::vector<float*> xslots, yslots;
  std::vector<int> state;       // 0 = empty, 1 = filled, 2 = consumer-held
  std::vector<int64_t> rows_in_slot;
  std::mutex mu;
  std::condition_variable cv_fill, cv_cons;
  std::thread producer;
  bool stop = false;
  int64_t next_consume = 0;     // batch index the consumer sees next
  int64_t held_slot = -1;
};

void producer_loop(NativePipeline* p) {
  for (int64_t b = 0; b < p->n_batches; ++b) {
    int64_t slot = b % p->depth;
    {
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_fill.wait(lk, [&] { return p->stop || p->state[slot] == 0; });
      if (p->stop) return;
    }
    int64_t begin = b * p->batch;
    int64_t rows = std::min(p->batch, p->total_rows - begin);
    batch_gather_f32(p->x, p->order.data() + begin, p->xslots[slot], rows,
                     p->xrow);
    batch_gather_f32(p->y, p->order.data() + begin, p->yslots[slot], rows,
                     p->yrow);
    {
      std::lock_guard<std::mutex> lk(p->mu);
      p->state[slot] = 1;
      p->rows_in_slot[slot] = rows;
    }
    p->cv_cons.notify_all();
  }
}

}  // namespace

extern "C" {

// x/y: (n, xrow/yrow) f32; order: (total_rows,) i64 (the epoch's shuffled
// sample order); xbufs/ybufs: `depth` caller-owned (batch, row) buffers.
void* pipeline_create(const float* x, const float* y, int64_t xrow,
                      int64_t yrow, const int64_t* order,
                      int64_t total_rows, int64_t batch, int64_t depth,
                      float** xbufs, float** ybufs) {
  auto* p = new NativePipeline();
  p->x = x;
  p->y = y;
  p->xrow = xrow;
  p->yrow = yrow;
  p->order.assign(order, order + total_rows);
  p->total_rows = total_rows;
  p->batch = batch;
  p->n_batches = (total_rows + batch - 1) / batch;
  p->depth = depth;
  p->xslots.assign(xbufs, xbufs + depth);
  p->yslots.assign(ybufs, ybufs + depth);
  p->state.assign(depth, 0);
  p->rows_in_slot.assign(depth, 0);
  p->producer = std::thread(producer_loop, p);
  return p;
}

// Blocks until the next batch (in epoch order) is ready. Returns its row
// count, or -1 when the epoch is exhausted. The slot index to read is
// pipeline_slot(h); call pipeline_release before the next acquire.
int64_t pipeline_acquire(void* h) {
  auto* p = static_cast<NativePipeline*>(h);
  if (p->next_consume >= p->n_batches) return -1;
  int64_t slot = p->next_consume % p->depth;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_cons.wait(lk, [&] { return p->state[slot] == 1; });
  p->state[slot] = 2;
  p->held_slot = slot;
  p->next_consume += 1;
  return p->rows_in_slot[slot];
}

int64_t pipeline_slot(void* h) {
  return static_cast<NativePipeline*>(h)->held_slot;
}

void pipeline_release(void* h) {
  auto* p = static_cast<NativePipeline*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->held_slot >= 0) p->state[p->held_slot] = 0;
    p->held_slot = -1;
  }
  p->cv_fill.notify_all();
}

void pipeline_destroy(void* h) {
  auto* p = static_cast<NativePipeline*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    for (auto& s : p->state)
      if (s == 2) s = 0;
  }
  p->cv_fill.notify_all();
  if (p->producer.joinable()) p->producer.join();
  delete p;
}

}  // extern "C"
