// Native host kernels for deepof_tpu.
//
// The reference's "native tier" is 23 numba-JIT (LLVM) kernels in
// deepof/utils.py; the inherently sequential, host-side ones are
// implemented here in C++ (device-parallel ones live in XLA/Pallas via
// deepof_tpu.ops). Exposed through ctypes (see deepof_tpu/native/__init__.py)
// with pure-numpy fallbacks so the package works without a compiler.
//
// Kernels:
//   kleinberg_q    — Viterbi-style burst-level DP (deepof/utils.py:3142)
//   filter_short   — boolean run-length filter     (deepof/utils.py:3999)
//   binary_median  — binary moving median          (deepof/utils.py:3519)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// Optimal burst-level sequence for Kleinberg's model.
// gaps: n_gaps inter-event gaps; out_q: n_gaps optimal levels (1-based).
void kleinberg_q(const double* gaps, int64_t n_gaps, double s, double gamma,
                 int64_t n, double T, int64_t k, double* out_q) {
  const double g_hat = T / static_cast<double>(n);
  const double gamma_log_n = gamma * std::log(static_cast<double>(n));

  std::vector<double> alpha(k), log_alpha(k);
  for (int64_t x = 0; x < k; ++x) {
    alpha[x] = std::pow(s, static_cast<double>(x)) / g_hat;
    log_alpha[x] = std::log(alpha[x]);
  }

  std::vector<double> c(k, std::numeric_limits<double>::infinity());
  c[0] = 0.0;
  std::vector<int32_t> back(n_gaps * k);
  std::vector<double> c_next(k);

  for (int64_t t = 0; t < n_gaps; ++t) {
    for (int64_t j = 0; j < k; ++j) {
      double best = std::numeric_limits<double>::infinity();
      int32_t best_i = 0;
      for (int64_t i = 0; i < k; ++i) {
        double cost = c[i];
        if (i < j) cost += static_cast<double>(j - i) * gamma_log_n;
        if (cost < best) {
          best = cost;
          best_i = static_cast<int32_t>(i);
        }
      }
      const double emission = -(log_alpha[j] - alpha[j] * gaps[t]);
      c_next[j] = best + emission;
      back[t * k + j] = best_i;
    }
    std::swap(c, c_next);
  }

  int64_t state = 0;
  double best = c[0];
  for (int64_t j = 1; j < k; ++j) {
    if (c[j] < best) {
      best = c[j];
      state = j;
    }
  }
  for (int64_t t = n_gaps - 1; t >= 0; --t) {
    out_q[t] = static_cast<double>(state + 1);
    state = back[t * k + state];
  }
}

// Zero out True runs shorter than min_length.
void filter_short(const uint8_t* a, int64_t n, int64_t min_length,
                  uint8_t* out) {
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = 0;
    if (a[i]) {
      ++count;
    } else {
      if (count >= min_length)
        for (int64_t j = i - count; j < i; ++j) out[j] = 1;
      count = 0;
    }
  }
  if (count >= min_length)
    for (int64_t j = n - count; j < n; ++j) out[j] = 1;
}

// Binary moving median: out[i] = window of size lag around i has > pad ones.
void binary_median(const uint8_t* a, int64_t n, int64_t lag, uint8_t* out) {
  const int64_t pad = (lag - 1) / 2;
  for (int64_t i = 0; i < n; ++i) out[i] = 0;
  if (n < 2 * pad + 1) return;
  int64_t s = 0;
  for (int64_t i = 0; i < 2 * pad + 1; ++i) s += a[i];
  for (int64_t i = pad; i < n - pad; ++i) {
    out[i] = s > pad ? 1 : 0;
    if (i + pad + 1 < n) s += a[i + pad + 1] - a[i - pad];
  }
}

}  // extern "C"
