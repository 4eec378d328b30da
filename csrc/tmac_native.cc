// tmac-tpu native weight pipeline.
//
// The TPU-native counterpart of the reference's C++ layer
// (python/t_mac/intrins/tbl.cc + lut_ctor.cc run the *online* hot loop on
// CPU SIMD; include/t-mac/tmac_gemm_wrapper.h dispatches them).  On TPU the
// online hot loop is Pallas/XLA, so the native layer moves to where CPU
// cycles still matter: the *offline* checkpoint pipeline.  Packing a 7B
// checkpoint touches ~7 GB of tensors; the numpy path (ops/packing.py) is
// single-threaded and allocation-heavy.  These kernels are bit-exact ports
// of the numpy reference implementations, parallelized with std::thread.
//
// Exposed via a C ABI consumed with ctypes (tmac_tpu/native.py); every
// function works on caller-allocated buffers and returns 0 on success.
//
// Build: make -C csrc   (produces tmac_tpu/_lib/libtmac_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Run fn(begin, end) over [0, n) split across hardware threads.
void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)> &fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (nthreads == 1 || n < (1 << 12)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    threads.emplace_back([&fn, b, e] { fn(b, e); });
  }
  for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Strided bit-field packing (bit-exact vs ops/packing.py pack_strided).
//
// wq (K, M) biased-unsigned uint8 -> packed (K/p, M) uint8 with
// packed[r, m] = sum_j wq[shard_base + r' + j*(ks/p), m] << (bits*j),
// applied per contiguous K-shard (k_shards).
// ---------------------------------------------------------------------------
int tmac_pack_strided(const uint8_t *wq, uint8_t *packed, int64_t K, int64_t M,
                      int bits, int k_shards) {
  if (bits != 1 && bits != 2 && bits != 4) return 1;
  int p = 8 / bits;
  if (K % (int64_t)(p * k_shards)) return 2;
  int64_t ks = K / k_shards;      // K rows per shard
  int64_t rows = ks / p;          // packed rows per shard
  int64_t total_rows = K / p;     // packed rows overall
  parallel_for(total_rows, [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      int64_t shard = r / rows, rr = r % rows;
      const uint8_t *src0 = wq + (shard * ks + rr) * M;
      uint8_t *dst = packed + r * M;
      std::memset(dst, 0, M);
      for (int j = 0; j < p; ++j) {
        const uint8_t *src = src0 + j * rows * M;
        int shift = bits * j;
        for (int64_t m = 0; m < M; ++m) dst[m] |= (uint8_t)(src[m] << shift);
      }
    }
  });
  return 0;
}

// Inverse: packed (K/p, M) -> wq (K, M).
int tmac_unpack_strided(const uint8_t *packed, uint8_t *wq, int64_t K,
                        int64_t M, int bits, int k_shards) {
  if (bits != 1 && bits != 2 && bits != 4) return 1;
  int p = 8 / bits;
  if (K % (int64_t)(p * k_shards)) return 2;
  int64_t ks = K / k_shards;
  int64_t rows = ks / p;
  int64_t total_rows = K / p;
  uint8_t mask = (uint8_t)((1 << bits) - 1);
  parallel_for(total_rows, [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      int64_t shard = r / rows, rr = r % rows;
      const uint8_t *src = packed + r * M;
      for (int j = 0; j < p; ++j) {
        uint8_t *dst = wq + (shard * ks + rr + j * rows) * M;
        int shift = bits * j;
        for (int64_t m = 0; m < M; ++m) dst[m] = (src[m] >> shift) & mask;
      }
    }
  });
  return 0;
}

// ---------------------------------------------------------------------------
// Weight quantization (bit-exact vs ops/packing.py quantize_weights; uses
// rint like np.rint -- current rounding mode is round-to-nearest-even).
// w (K, M) f32 -> wq (K, M) u8, scales/sub (K/gs, M) f32.
// ---------------------------------------------------------------------------
int tmac_quantize_weights_b(const float *w, uint8_t *wq, float *scales,
                            float *sub, int64_t K, int64_t M, int bits,
                            int64_t group_size, int zero_point) {
  if (K % group_size) return 1;
  int64_t G = K / group_size;
  int qmax = (1 << bits) - 1;
  int mid = 1 << (bits - 1);
  parallel_for(G * M, [&](int64_t b, int64_t e) {
    // iterate over (g, m) pairs; columns of one group are strided, so walk
    // m-major inside a g to stay cache-friendly on the (K, M) layout
    int64_t gb = b / M, ge = (e + M - 1) / M;
    for (int64_t g = gb; g < ge; ++g) {
      int64_t mb = (g == gb) ? b % M : 0;
      int64_t me = (g == ge - 1 && e % M) ? e % M : M;
      const float *wg = w + g * group_size * M;
      uint8_t *wqg = wq + g * group_size * M;
      for (int64_t m = mb; m < me; ++m) {
        if (zero_point) {
          float lo = wg[m], hi = wg[m];
          for (int64_t k = 1; k < group_size; ++k) {
            float v = wg[k * M + m];
            lo = std::min(lo, v);
            hi = std::max(hi, v);
          }
          float sc = std::max(hi - lo, 1e-8f) / (float)qmax;
          for (int64_t k = 0; k < group_size; ++k) {
            float q = std::nearbyintf((wg[k * M + m] - lo) / sc);
            wqg[k * M + m] = (uint8_t)std::min(std::max(q, 0.f), (float)qmax);
          }
          scales[g * M + m] = sc;
          sub[g * M + m] = -lo;
        } else {
          float amax = 0.f;
          for (int64_t k = 0; k < group_size; ++k)
            amax = std::max(amax, std::fabs(wg[k * M + m]));
          float sc = std::max(amax, 1e-8f) / (float)mid;
          for (int64_t k = 0; k < group_size; ++k) {
            float q = std::nearbyintf(wg[k * M + m] / sc) + (float)mid;
            wqg[k * M + m] = (uint8_t)std::min(std::max(q, 0.f), (float)qmax);
          }
          scales[g * M + m] = sc;
          sub[g * M + m] = (float)mid * sc;
        }
      }
    }
  });
  return 0;
}

// ---------------------------------------------------------------------------
// GPTQ int32 field unpacking (semantics of convert/gptq.py
// _unpack_int32_fields; reference model_utils.py:104-129).
// ---------------------------------------------------------------------------

// qweight (R, M) int32, fields along axis 0: out (R*f, M) uint8,
// out[r*f + j, m] = (qweight[r, m] >> (bits*j)) & mask.
int tmac_unpack_gptq_qweight(const int32_t *qw, uint8_t *out, int64_t R,
                             int64_t M, int bits) {
  int f = 32 / bits;
  uint32_t mask = (1u << bits) - 1u;
  parallel_for(R, [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint32_t *src = (const uint32_t *)qw + r * M;
      for (int j = 0; j < f; ++j) {
        uint8_t *dst = out + (r * f + j) * M;
        int shift = bits * j;
        for (int64_t m = 0; m < M; ++m)
          dst[m] = (uint8_t)((src[m] >> shift) & mask);
      }
    }
  });
  return 0;
}

// qzeros (G, M/f) int32, fields along axis 1: out (G, M) uint8,
// out[g, c*f + j] = (qzeros[g, c] >> (bits*j)) & mask   (+1 if v1).
int tmac_unpack_gptq_qzeros(const int32_t *qz, uint8_t *out, int64_t G,
                            int64_t Mf, int bits, int add_one) {
  int f = 32 / bits;
  uint32_t mask = (1u << bits) - 1u;
  parallel_for(G, [&](int64_t gb, int64_t ge) {
    for (int64_t g = gb; g < ge; ++g) {
      const uint32_t *src = (const uint32_t *)qz + g * Mf;
      uint8_t *dst = out + g * Mf * f;
      for (int64_t c = 0; c < Mf; ++c) {
        uint32_t v = src[c];
        for (int j = 0; j < f; ++j)
          dst[c * f + j] = (uint8_t)(((v >> (bits * j)) & mask) + add_one);
      }
    }
  });
  return 0;
}

// ---------------------------------------------------------------------------
// BitNet b1.58 absmean ternarization (bit-exact vs convert/bitnet.py):
// gamma = float32(mean(|W|)) over the WHOLE tensor;
// wq = clip(rint(w / gamma), -1, 1) + 2  in {1,2,3} (mid = 2 under bits=2);
// scales/sub: (k_shards, M) filled with gamma / 2*gamma.
// ---------------------------------------------------------------------------
int tmac_quantize_bitnet(const float *w, uint8_t *wq, float *scales,
                         float *sub, int64_t K, int64_t M, int k_shards) {
  if (K % k_shards) return 1;
  int64_t n = K * M;
  // parallel absmean reduction (f64 accumulate like np.mean, cast to f32)
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t nthreads = std::max<int64_t>(1, std::min<int64_t>(hw, 64));
  std::vector<double> partial(nthreads, 0.0);
  {
    std::vector<std::thread> th;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int64_t t = 0; t < nthreads; ++t) {
      int64_t b = t * chunk, e = std::min(n, b + chunk);
      if (b >= e) break;
      th.emplace_back([&, t, b, e] {
        double acc = 0;
        for (int64_t i = b; i < e; ++i) acc += std::fabs(w[i]);
        partial[t] = acc;
      });
    }
    for (auto &x : th) x.join();
  }
  double total = 0;
  for (double v : partial) total += v;
  float gamma = std::max((float)(total / (double)n), 1e-8f);
  float inv = 1.0f / gamma;
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      float q = std::nearbyintf(w[i] * inv);
      q = std::min(std::max(q, -1.f), 1.f);
      wq[i] = (uint8_t)(q + 2.f);
    }
  });
  for (int64_t i = 0; i < (int64_t)k_shards * M; ++i) {
    scales[i] = gamma;
    sub[i] = 2.0f * gamma;
  }
  return 0;
}

int tmac_native_version() { return 1; }

}  // extern "C"
