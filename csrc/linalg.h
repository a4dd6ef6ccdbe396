// Minimal fixed-size dense linear algebra for the native estimation core.
// No external dependencies (the image has no Eigen/BLAS); sizes are tiny
// (3x3, 6x6, and 6K x 6K pose-graph systems with K in the hundreds), so a
// plain Cholesky is the right tool.
#pragma once

#include <cmath>
#include <cstring>
#include <vector>

namespace ssl {

// ---- small fixed helpers (row-major) --------------------------------------

inline void mat3_mul(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[i * 3 + k] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

inline void mat3_tmul(const double* A, const double* B, double* C) {  // A^T B
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[k * 3 + i] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

inline void mat3_vec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = A[i * 3 + 0] * x[0] + A[i * 3 + 1] * x[1] + A[i * 3 + 2] * x[2];
}

inline void mat3_tvec(const double* A, const double* x, double* y) {  // A^T x
  for (int i = 0; i < 3; ++i)
    y[i] = A[0 * 3 + i] * x[0] + A[1 * 3 + i] * x[1] + A[2 * 3 + i] * x[2];
}

// ---- Cholesky solve for symmetric positive definite N x N -----------------

// In-place LL^T; returns false if not SPD. A row-major (n x n).
inline bool cholesky(std::vector<double>& A, int n) {
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (d <= 0.0 || !std::isfinite(d)) return false;
    const double Ljj = std::sqrt(d);
    A[j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = s / Ljj;
    }
  }
  return true;
}

// Solve A x = b using the Cholesky factor stored in L (lower). x := solution.
inline void cholesky_solve(const std::vector<double>& L, int n,
                           const std::vector<double>& b, std::vector<double>& x) {
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * y[k];
    y[i] = s / L[i * n + i];
  }
  x.assign(n, 0.0);
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

// Solve (A + lambda I) x = -g for a dense SPD-ish system. Returns false on
// factorization failure.
inline bool damped_solve(const std::vector<double>& A, const std::vector<double>& g,
                         int n, double lambda, std::vector<double>& x) {
  std::vector<double> M = A;
  for (int i = 0; i < n; ++i) M[i * n + i] += lambda;
  if (!cholesky(M, n)) return false;
  std::vector<double> nb(n);
  for (int i = 0; i < n; ++i) nb[i] = -g[i];
  cholesky_solve(M, n, nb, x);
  return true;
}

}  // namespace ssl
