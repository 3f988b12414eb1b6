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

// Point-vs-polygon geometry in one pass: for each query point, the
// minimum distance to the polygon boundary (NaN for non-finite points)
// and the ray-casting inside flag (reference crossing rule,
// deepof/utils.py:1443-1541). One O(T*E) scan with O(1) temporaries
// replaces the numpy broadcast's (T, E, 2) float64 intermediates — at
// recording scale this is the supervised rule battery's hottest host op.
void point_polygon(const double* pts, int64_t n_pts, const double* poly,
                   int64_t n_v, double* out_dist, uint8_t* out_inside) {
  for (int64_t p = 0; p < n_pts; ++p) {
    const double x = pts[2 * p];
    const double y = pts[2 * p + 1];
    if (!std::isfinite(x) || !std::isfinite(y)) {
      out_dist[p] = std::numeric_limits<double>::quiet_NaN();
      // The numpy twin's crossing test propagates NaN comparisons to
      // False, so non-finite points are reported outside.
      out_inside[p] = 0;
      continue;
    }
    double best = std::numeric_limits<double>::infinity();
    int64_t crossings = 0;
    for (int64_t e = 0; e < n_v; ++e) {
      const double x1 = poly[2 * e], y1 = poly[2 * e + 1];
      const int64_t e2 = (e + 1 == n_v) ? 0 : e + 1;
      const double x2 = poly[2 * e2], y2 = poly[2 * e2 + 1];

      // Segment distance.
      const double vx = x2 - x1, vy = y2 - y1;
      const double wx = x - x1, wy = y - y1;
      const double c2 = vx * vx + vy * vy;
      double t = c2 > 0.0 ? (wx * vx + wy * vy) / c2 : 0.0;
      t = std::min(1.0, std::max(0.0, t));
      const double dx = x - (x1 + t * vx);
      const double dy = y - (y1 + t * vy);
      const double d2 = dx * dx + dy * dy;
      if (d2 < best) best = d2;

      // Ray-casting crossing (reference rule: min(y1,y2) < y <= max and
      // point left of the intersection, vertical edges at/right of x).
      if (y > std::min(y1, y2) && y <= std::max(y1, y2) &&
          x <= std::max(x1, x2)) {
        const double dyv = y2 - y1;
        const double xinters =
            dyv != 0.0 ? (y - y1) * (x2 - x1) / dyv + x1 : x1;
        if (x1 == x2 || x <= xinters) ++crossings;
      }
    }
    out_dist[p] = std::sqrt(best);
    out_inside[p] = (crossings % 2 == 1) ? 1 : 0;
  }
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
