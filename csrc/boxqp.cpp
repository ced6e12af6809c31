// Exact dense box-constrained QP solver (primal active-set method).
//
//   minimize   0.5 x' P x + q' x     subject to  lo <= x <= hi
//
// Role in koopmanx: the high-precision CPU oracle the batched TPU ADMM
// solver (koopmanx/control/qp.py) is validated against — the counterpart
// of the reference's exact `quadprog` (Tank_System.m:158) semantics — and
// a host-side fallback for applications that need active-set exactness.
// The reference contains no native code (SURVEY §2); this is a new
// component of the runtime around the XLA compute path.
//
// Algorithm: classic primal active set for strictly convex P.
//   repeat:
//     solve the free-variable KKT system  P_ff x_f = -(q_f + P_fa x_a)
//     clamp free variables that violate their bounds (add to active set)
//     release active variables whose multiplier sign is non-optimal
//   until the working set is stable (finite termination for SPD P).
//
// Dense LDL^T-free implementation with partial-pivot Gaussian elimination
// on the free block — n <= ~64 in all koopmanx workloads.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// Solve A x = b (n x n, row-major) by Gaussian elimination with partial
// pivoting. Returns false on (numerical) singularity.
bool dense_solve(int n, std::vector<double> a, std::vector<double> b,
                 double* x) {
  std::vector<int> piv(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double best = std::fabs(a[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(a[i * n + k]);
      if (v > best) {
        best = v;
        p = i;
      }
    }
    if (best < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(a[k * n + j], a[p * n + j]);
      std::swap(b[k], b[p]);
    }
    double inv = 1.0 / a[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      double f = a[i * n + k] * inv;
      if (f == 0.0) continue;
      for (int j = k; j < n; ++j) a[i * n + j] -= f * a[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= a[i * n + j] * x[j];
    x[i] = s / a[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 if max_iter hit (x still feasible), 2 on
// singular free block.
int boxqp_solve(int n, const double* p, const double* q, const double* lo,
                const double* hi, double* x, int max_iter) {
  // state: 0 free, -1 at lower, +1 at upper
  std::vector<int> state(n, 0);
  std::vector<double> xv(n);
  for (int i = 0; i < n; ++i) {
    double mid = 0.0;
    if (std::isfinite(lo[i]) && std::isfinite(hi[i]))
      mid = 0.5 * (lo[i] + hi[i]);
    xv[i] = mid;
  }

  const double tol = 1e-12;
  for (int iter = 0; iter < max_iter; ++iter) {
    // collect free indices
    std::vector<int> free_idx;
    free_idx.reserve(n);
    for (int i = 0; i < n; ++i)
      if (state[i] == 0) free_idx.push_back(i);
    int nf = static_cast<int>(free_idx.size());

    if (nf > 0) {
      // rhs_f = -(q_f + P_fa x_a)
      std::vector<double> pf(static_cast<size_t>(nf) * nf);
      std::vector<double> rhs(nf);
      for (int a = 0; a < nf; ++a) {
        int i = free_idx[a];
        double s = q[i];
        for (int j = 0; j < n; ++j)
          if (state[j] != 0) s += p[i * n + j] * xv[j];
        rhs[a] = -s;
        for (int b = 0; b < nf; ++b) pf[a * nf + b] = p[i * n + free_idx[b]];
      }
      std::vector<double> xf(nf);
      if (!dense_solve(nf, pf, rhs, xf.data())) return 2;
      for (int a = 0; a < nf; ++a) xv[free_idx[a]] = xf[a];
    }

    // clamp violating free variables (largest violation first)
    int worst = -1;
    double worst_v = tol;
    for (int a = 0; a < nf; ++a) {
      int i = free_idx[a];
      double v = 0.0;
      if (xv[i] < lo[i]) v = lo[i] - xv[i];
      if (xv[i] > hi[i]) v = xv[i] - hi[i];
      if (v > worst_v) {
        worst_v = v;
        worst = i;
      }
    }
    if (worst >= 0) {
      state[worst] = (xv[worst] < lo[worst]) ? -1 : +1;
      xv[worst] = (state[worst] < 0) ? lo[worst] : hi[worst];
      continue;
    }

    // multipliers of active bounds: g = P x + q; lower active needs g >= 0,
    // upper active needs g <= 0; release the worst-signed one
    int release = -1;
    double release_v = tol;
    for (int i = 0; i < n; ++i) {
      if (state[i] == 0) continue;
      double g = q[i];
      for (int j = 0; j < n; ++j) g += p[i * n + j] * xv[j];
      double v = (state[i] < 0) ? -g : g;  // violation if positive
      if (v > release_v) {
        release_v = v;
        release = i;
      }
    }
    if (release >= 0) {
      state[release] = 0;
      continue;
    }

    // optimal
    std::memcpy(x, xv.data(), sizeof(double) * n);
    return 0;
  }
  for (int i = 0; i < n; ++i)
    x[i] = std::fmin(std::fmax(xv[i], lo[i]), hi[i]);
  return 1;
}

// Batched entry point: solves `count` independent problems laid out
// contiguously (P: count*n*n, q/lo/hi/x: count*n).
int boxqp_solve_batch(int count, int n, const double* p, const double* q,
                      const double* lo, const double* hi, double* x,
                      int max_iter) {
  int rc = 0;
  for (int k = 0; k < count; ++k) {
    int r = boxqp_solve(n, p + static_cast<size_t>(k) * n * n, q + k * n,
                        lo + k * n, hi + k * n, x + k * n, max_iter);
    if (r > rc) rc = r;
  }
  return rc;
}

}  // extern "C"
