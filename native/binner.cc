// Fast multi-threaded feature binner.
//
// Native counterpart of the reference's per-feature radix argsort +
// threshold-table build at training init (src/learning/forests/mart.cc:
// 136-170) and the stmap doc->bin quantization (src/learning/tree/
// rtnode_histogram.cc:227-253).
//
// Build strategy per feature: one O(N) pass tracks min/max and feeds a
// small hash set capped at nthresholds+1 distinct values.  Most continuous
// features overflow the cap within a few hundred rows — the set is dropped
// and the equi-width grid needs only (min, max), so NO sort of the 2.6M-row
// column ever happens.  Low-cardinality features keep their <= nthresholds
// distinct values, which are sorted (tiny) and emitted verbatim — exactly
// the unique-values branch of ops/binning.py.
//
// Quantization is a lower_bound per value (numpy searchsorted side='left'),
// parallelized over ROW blocks so feature reads stream contiguously and the
// whole [F, B] threshold table stays cache-resident.
//
// All float arithmetic matches the numpy implementation bit-for-bit
// (compile with -ffp-contract=off: no FMA in fmin + step*i).
//
// Build: g++ -O3 -march=native -ffp-contract=off -shared -fPIC -std=c++17 \
//            -pthread -o libbinner.so binner.cc

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

unsigned resolve_threads(int nthreads) {
  if (nthreads > 0) return static_cast<unsigned>(nthreads);
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? hw : 1;
}

template <typename Fn>
void parallel_range(int64_t n, int nthreads, Fn fn) {
  unsigned T = std::min<unsigned>(resolve_threads(nthreads),
                                  static_cast<unsigned>(n > 0 ? n : 1));
  if (T <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(T);
  const int64_t chunk = (n + T - 1) / T;
  for (unsigned t = 0; t < T; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=]() { fn(lo, hi); });
  }
  for (auto &th : threads) th.join();
}

inline float norm_zero(float v) { return v == 0.0f ? 0.0f : v; }

}  // namespace

extern "C" {

// thresholds: caller-allocated [F, Bcap] with Bcap = nthresholds + 1,
// fully written (FLT_MAX padded).  counts: [F].  nthresholds must be > 0
// (the "all unique values" mode has no static width bound; callers use the
// numpy path for it).
int bin_build_thresholds(const float *feats, int64_t N, int64_t F,
                         int nthresholds, int nthreads, float *thresholds,
                         int32_t *counts) {
  if (nthresholds <= 0 || N <= 0 || F <= 0) return 1;
  const int64_t Bcap = static_cast<int64_t>(nthresholds) + 1;
  parallel_range(F, nthreads, [=](int64_t f0, int64_t f1) {
    std::unordered_set<float> uniq;
    for (int64_t f = f0; f < f1; ++f) {
      uniq.clear();
      uniq.reserve(static_cast<size_t>(nthresholds) * 2);
      bool overflow = false;
      float fmin = FLT_MAX, fmax = -FLT_MAX;
      const float *p = feats + f;
      for (int64_t i = 0; i < N; ++i, p += F) {
        const float v = *p;
        fmin = std::min(fmin, v);
        fmax = std::max(fmax, v);
        if (!overflow) {
          uniq.insert(norm_zero(v));
          if (static_cast<int64_t>(uniq.size()) > nthresholds)
            overflow = true;
        }
      }
      float *out = thresholds + f * Bcap;
      int64_t cnt;
      if (!overflow) {
        std::vector<float> vals(uniq.begin(), uniq.end());
        std::sort(vals.begin(), vals.end());
        const int64_t nu = static_cast<int64_t>(vals.size());
        for (int64_t i = 0; i < nu; ++i) out[i] = vals[i];
        out[nu] = FLT_MAX;
        cnt = nu + 1;
      } else {
        // DOUBLE arithmetic (matching the numpy fallback bit-for-bit):
        // fmax - fmin can exceed FLT_MAX for full-range features (e.g.
        // +/-3.4e38 after the non-finite sanitize), overflowing a float
        // step to inf and the first grid entry to NaN (inf * 0)
        const double lo = static_cast<double>(fmin);
        const double step =
            std::fabs(static_cast<double>(fmax) - lo) /
            static_cast<double>(nthresholds);
        for (int64_t i = 0; i < nthresholds; ++i)
          out[i] = static_cast<float>(lo + step * static_cast<double>(i));
        out[nthresholds] = FLT_MAX;
        cnt = Bcap;
      }
      for (int64_t i = cnt; i < Bcap; ++i) out[i] = FLT_MAX;
      counts[f] = static_cast<int32_t>(cnt);
    }
  });
  return 0;
}

// binned: caller-allocated int32 [N, F].  thresholds: [F, B] ascending with
// FLT_MAX pads (the bin_build_thresholds layout, any B).
int bin_apply(const float *feats, int64_t N, int64_t F,
              const float *thresholds, int64_t B, int nthreads,
              int32_t *binned) {
  if (N <= 0 || F <= 0 || B <= 0) return 1;
  parallel_range(N, nthreads, [=](int64_t r0, int64_t r1) {
    for (int64_t i = r0; i < r1; ++i) {
      const float *row = feats + i * F;
      int32_t *out = binned + i * F;
      for (int64_t f = 0; f < F; ++f) {
        const float *th = thresholds + f * B;
        const float v = row[f];
        if (v != v) {
          // NaN routes right at every real split (v <= thr is false in
          // value space), so its bin-space id is the top bin: B-1 <= tbin
          // only at the never-chosen FLT_MAX sentinel split.  (lower_bound
          // would return 0 for NaN — bin 0 routes LEFT everywhere,
          // diverging from value-space descent and the numpy path.)
          out[f] = static_cast<int32_t>(B - 1);
          continue;
        }
        // first index with th[idx] >= v  (searchsorted side='left'),
        // clamped to the top bin so +inf (past the FLT_MAX sentinel)
        // cannot produce an out-of-range id that histogram passes drop
        int64_t idx = std::lower_bound(th, th + B, v) - th;
        out[f] = static_cast<int32_t>(idx < B ? idx : B - 1);
      }
    }
  });
  return 0;
}

}  // extern "C"
