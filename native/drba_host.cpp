// DRBA-TPU native host runtime.
//
// The TPU owns the compute path (XLA/Pallas); this library owns the host
// side of the pipeline, replacing the reference's CUDA-adjacent host code
// (CuPy staging + python-thread queues, models/utils/tools.py:156-213) with:
//
//   * frame format converters (BGR-uint8 <-> RGB-float32 [0,1]), the per-4K
//     frame hot host op (33 MB/frame), multithreaded + vectorizable loops;
//   * a lock-free single-producer/single-consumer frame ring with
//     preallocated slots — bounded memory by construction (the reference's
//     write queue is unbounded, tools.py:169).
//
// Exposed as a plain C API for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int clamp_threads(int64_t work, int requested) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int t = requested > 0 ? requested : hw;
  // below ~1MB per thread the spawn overhead dominates
  int64_t max_useful = work / (1 << 20);
  if (max_useful < 1) max_useful = 1;
  if (t > max_useful) t = static_cast<int>(max_useful);
  return t < 1 ? 1 : t;
}

template <typename F>
void parallel_rows(int64_t rows, int threads, F&& fn) {
  if (threads <= 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < rows ? lo + chunk : rows;
    if (lo >= hi) break;
    pool.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// BGR uint8 (H,W,3) -> RGB float32 (H,W,3) in [0,1].
void drba_bgr8_to_rgbf32(const uint8_t* src, float* dst, int64_t h, int64_t w,
                         int threads) {
  const float k = 1.0f / 255.0f;
  threads = clamp_threads(h * w * 3, threads);
  parallel_rows(h, threads, [=](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const uint8_t* s = src + y * w * 3;
      float* d = dst + y * w * 3;
      for (int64_t x = 0; x < w; ++x) {
        d[x * 3 + 0] = s[x * 3 + 2] * k;
        d[x * 3 + 1] = s[x * 3 + 1] * k;
        d[x * 3 + 2] = s[x * 3 + 0] * k;
      }
    }
  });
}

// BGR uint8 (H,W,3) -> RGB uint8 (H,W,3): the per-frame channel flip feeding
// ffmpeg's rgb24 rawvideo pipe (reference flips with numpy per frame,
// tools.py:202). Multithreaded, writes into a caller-reused buffer — no
// per-frame allocation.
void drba_bgr8_to_rgb8(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w,
                       int threads) {
  threads = clamp_threads(h * w * 3, threads);
  parallel_rows(h, threads, [=](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const uint8_t* s = src + y * w * 3;
      uint8_t* d = dst + y * w * 3;
      for (int64_t x = 0; x < w; ++x) {
        d[x * 3 + 0] = s[x * 3 + 2];
        d[x * 3 + 1] = s[x * 3 + 1];
        d[x * 3 + 2] = s[x * 3 + 0];
      }
    }
  });
}

// RGB float32 [0,1] (H,W,3) -> BGR uint8 (H,W,3), truncating like the
// reference's (x*255).astype(uint8) (tools.py:38).
void drba_rgbf32_to_bgr8(const float* src, uint8_t* dst, int64_t h, int64_t w,
                         int threads) {
  threads = clamp_threads(h * w * 3, threads);
  parallel_rows(h, threads, [=](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const float* s = src + y * w * 3;
      uint8_t* d = dst + y * w * 3;
      for (int64_t x = 0; x < w; ++x) {
        for (int c = 0; c < 3; ++c) {
          float v = s[x * 3 + c] * 255.0f;
          v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
          d[x * 3 + (2 - c)] = static_cast<uint8_t>(v);
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// Lock-free SPSC frame ring with preallocated fixed-size slots.
// ---------------------------------------------------------------------------

struct DrbaRing {
  int64_t slot_bytes;
  int64_t capacity;  // power of two
  std::vector<uint8_t> storage;
  std::vector<int64_t> sizes;
  std::atomic<int64_t> head{0};  // next write
  std::atomic<int64_t> tail{0};  // next read
  std::atomic<int> closed{0};
};

void* drba_ring_create(int64_t slot_bytes, int64_t capacity) {
  int64_t cap = 1;
  while (cap < capacity) cap <<= 1;
  auto* r = new DrbaRing();
  r->slot_bytes = slot_bytes;
  r->capacity = cap;
  r->storage.resize(static_cast<size_t>(slot_bytes * cap));
  r->sizes.resize(static_cast<size_t>(cap));
  return r;
}

void drba_ring_destroy(void* ring) { delete static_cast<DrbaRing*>(ring); }

// returns 1 on success, 0 if full, -1 if closed
int drba_ring_push(void* ring, const uint8_t* data, int64_t size) {
  auto* r = static_cast<DrbaRing*>(ring);
  if (r->closed.load(std::memory_order_acquire)) return -1;
  int64_t head = r->head.load(std::memory_order_relaxed);
  int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) return 0;
  int64_t slot = head & (r->capacity - 1);
  std::memcpy(r->storage.data() + slot * r->slot_bytes, data,
              static_cast<size_t>(size));
  r->sizes[static_cast<size_t>(slot)] = size;
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// returns byte count on success, 0 if empty, -1 if closed-and-drained
int64_t drba_ring_pop(void* ring, uint8_t* out) {
  auto* r = static_cast<DrbaRing*>(ring);
  int64_t tail = r->tail.load(std::memory_order_relaxed);
  int64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) {
    return r->closed.load(std::memory_order_acquire) ? -1 : 0;
  }
  int64_t slot = tail & (r->capacity - 1);
  int64_t size = r->sizes[static_cast<size_t>(slot)];
  std::memcpy(out, r->storage.data() + slot * r->slot_bytes,
              static_cast<size_t>(size));
  r->tail.store(tail + 1, std::memory_order_release);
  return size;
}

void drba_ring_close(void* ring) {
  static_cast<DrbaRing*>(ring)->closed.store(1, std::memory_order_release);
}

int64_t drba_ring_size(void* ring) {
  auto* r = static_cast<DrbaRing*>(ring);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

}  // extern "C"
