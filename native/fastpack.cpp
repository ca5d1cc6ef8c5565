// fastpack: native data-plane kernels for the ERA5 host pipeline.
//
// The reference framework's ingest path is pure Python/numpy
// (/root/reference/era5_data/utils_data.py:100-127): per-variable CF
// unpacking (int16 * scale + offset), level-axis reversal and variable
// stacking all run single-threaded on the loader thread, serialised with
// the train step. These kernels move that work into multithreaded C++ so
// sample assembly keeps up with the TPU step time; Python binds via ctypes
// (pangu_tpu/data/fastpack.py) with a numpy fallback when the library
// is not built.
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(chunk_begin, chunk_end) over [0, n) on `threads` workers.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  threads = std::max(1, threads);
  if (threads == 1 || n < (1 << 16)) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    pool.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// CF-packed int16 -> float32: dst[i] = src[i] * scale + offset,
// with fill-value -> NaN (CF _FillValue semantics).
void fp_unpack_i16(const int16_t* src, float* dst, int64_t n, double scale,
                   double offset, int32_t fill, int has_fill, int threads) {
  parallel_for(n, threads, [=](int64_t b, int64_t e) {
    const float s = static_cast<float>(scale);
    const float o = static_cast<float>(offset);
    if (has_fill) {
      const int16_t f = static_cast<int16_t>(fill);
      for (int64_t i = b; i < e; ++i)
        dst[i] = src[i] == f ? __builtin_nanf("")
                             : static_cast<float>(src[i]) * s + o;
    } else {
      for (int64_t i = b; i < e; ++i)
        dst[i] = static_cast<float>(src[i]) * s + o;
    }
  });
}

// Elementwise affine on float32 (scale/offset already-decoded variables).
void fp_affine_f32(const float* src, float* dst, int64_t n, double scale,
                   double offset, int threads) {
  parallel_for(n, threads, [=](int64_t b, int64_t e) {
    const float s = static_cast<float>(scale);
    const float o = static_cast<float>(offset);
    for (int64_t i = b; i < e; ++i) dst[i] = src[i] * s + o;
  });
}

// Stack `vars` per-variable cubes (levels, plane) into (vars, levels, plane)
// with the level axis REVERSED — the canonical order (index 0 == 1000 hPa)
// the whole framework uses (reference flip: utils_data.py:117).
// srcs: array of `vars` pointers, each (levels * plane) floats.
void fp_stack_flip(const float** srcs, float* dst, int32_t vars,
                   int32_t levels, int64_t plane, int threads) {
  parallel_for(static_cast<int64_t>(vars) * levels, threads,
               [=](int64_t b, int64_t e) {
                 for (int64_t i = b; i < e; ++i) {
                   int32_t v = static_cast<int32_t>(i / levels);
                   int32_t l = static_cast<int32_t>(i % levels);
                   const float* s = srcs[v] + (levels - 1 - l) * plane;
                   float* d = dst + (i)*plane;
                   std::memcpy(d, s, sizeof(float) * plane);
                 }
               });
}

// Normalise in place: x = (x - mean) / std, broadcasting mean/std of shape
// (vars, levels) over the trailing plane (era5_data/utils_data.py:315-321).
void fp_normalize(float* x, const float* mean, const float* stdv,
                  int32_t vars, int32_t levels, int64_t plane, int threads) {
  parallel_for(static_cast<int64_t>(vars) * levels, threads,
               [=](int64_t b, int64_t e) {
                 for (int64_t i = b; i < e; ++i) {
                   const float m = mean[i];
                   const float inv = 1.0f / stdv[i];
                   float* p = x + i * plane;
                   for (int64_t j = 0; j < plane; ++j)
                     p[j] = (p[j] - m) * inv;
                 }
               });
}

int32_t fp_version() { return 1; }

}  // extern "C"
