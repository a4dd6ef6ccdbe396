// SE(3) Lie-group ops, GTSAM Pose3 conventions (rotation-first tangent
// [w, v], right retraction T * Exp(xi)) — the native mirror of
// superslam_tpu/geometry/se3.py, validated against it in
// tests/test_native_core.py.
#pragma once

#include <cmath>
#include <cstring>

#include "linalg.h"

namespace ssl {

struct Pose {
  double R[9];  // row-major
  double t[3];
  Pose() {
    std::memset(R, 0, sizeof(R));
    R[0] = R[4] = R[8] = 1.0;
    t[0] = t[1] = t[2] = 0.0;
  }
};

inline void skew(const double* w, double* W) {
  W[0] = 0; W[1] = -w[2]; W[2] = w[1];
  W[3] = w[2]; W[4] = 0; W[5] = -w[0];
  W[6] = -w[1]; W[7] = w[0]; W[8] = 0;
}

inline void so3_exp(const double* w, double* R) {
  const double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double W[9], W2[9];
  skew(w, W);
  mat3_mul(W, W, W2);
  double a, b;
  if (th2 < 1e-10) {
    a = 1.0;
    b = 0.5;
  } else {
    const double th = std::sqrt(th2);
    a = std::sin(th) / th;
    b = (1.0 - std::cos(th)) / th2;
  }
  for (int i = 0; i < 9; ++i) R[i] = a * W[i] + b * W2[i];
  R[0] += 1.0; R[4] += 1.0; R[8] += 1.0;
}

inline void so3_log(const double* R, double* w) {
  const double tr = R[0] + R[4] + R[8];
  double c = (tr - 1.0) * 0.5;
  if (c > 1.0) c = 1.0;
  if (c < -1.0) c = -1.0;
  const double th = std::acos(c);
  const double v[3] = {R[7] - R[5], R[2] - R[6], R[3] - R[1]};
  if (th < 1e-7) {
    for (int i = 0; i < 3; ++i) w[i] = 0.5 * v[i];
    return;
  }
  if (M_PI - th < 1e-7) {
    // Near pi: axis from the symmetric part.
    double axis[3] = {std::sqrt(std::fmax((R[0] + 1) * 0.5, 0.0)),
                      std::sqrt(std::fmax((R[4] + 1) * 0.5, 0.0)),
                      std::sqrt(std::fmax((R[8] + 1) * 0.5, 0.0))};
    int k = 0;
    if (axis[1] > axis[k]) k = 1;
    if (axis[2] > axis[k]) k = 2;
    double s[3];
    const double A[9] = {(R[0] + 1) * 0.5, (R[1] + R[3]) * 0.25 * 2, (R[2] + R[6]) * 0.25 * 2,
                         0, (R[4] + 1) * 0.5, (R[5] + R[7]) * 0.25 * 2,
                         0, 0, (R[8] + 1) * 0.5};
    s[k] = axis[k];
    for (int j = 0; j < 3; ++j)
      if (j != k) s[j] = (j > k ? A[k * 3 + j] : A[j * 3 + k]) / axis[k];
    double n = std::sqrt(s[0] * s[0] + s[1] * s[1] + s[2] * s[2]);
    for (int i = 0; i < 3; ++i) w[i] = th * s[i] / n;
    return;
  }
  const double f = th / (2.0 * std::sin(th));
  for (int i = 0; i < 3; ++i) w[i] = f * v[i];
}

inline void so3_left_jacobian(const double* w, double* V) {
  const double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double W[9], W2[9];
  skew(w, W);
  mat3_mul(W, W, W2);
  double b, c;
  if (th2 < 1e-10) {
    b = 0.5;
    c = 1.0 / 6.0;
  } else {
    const double th = std::sqrt(th2);
    b = (1.0 - std::cos(th)) / th2;
    c = (th - std::sin(th)) / (th2 * th);
  }
  for (int i = 0; i < 9; ++i) V[i] = b * W[i] + c * W2[i];
  V[0] += 1.0; V[4] += 1.0; V[8] += 1.0;
}

inline void so3_left_jacobian_inv(const double* w, double* Vi) {
  const double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double W[9], W2[9];
  skew(w, W);
  mat3_mul(W, W, W2);
  double c;
  if (th2 < 1e-10) {
    c = 1.0 / 12.0;
  } else {
    const double th = std::sqrt(th2);
    const double half = 0.5 * th;
    c = (1.0 - half / std::tan(half)) / th2;
  }
  for (int i = 0; i < 9; ++i) Vi[i] = -0.5 * W[i] + c * W2[i];
  Vi[0] += 1.0; Vi[4] += 1.0; Vi[8] += 1.0;
}

inline Pose se3_exp(const double* xi) {  // xi = [w, v]
  Pose T;
  so3_exp(xi, T.R);
  double V[9];
  so3_left_jacobian(xi, V);
  mat3_vec(V, xi + 3, T.t);
  return T;
}

inline void se3_log(const Pose& T, double* xi) {
  so3_log(T.R, xi);
  double Vi[9];
  so3_left_jacobian_inv(xi, Vi);
  mat3_vec(Vi, T.t, xi + 3);
}

inline Pose compose(const Pose& A, const Pose& B) {
  Pose C;
  mat3_mul(A.R, B.R, C.R);
  mat3_vec(A.R, B.t, C.t);
  for (int i = 0; i < 3; ++i) C.t[i] += A.t[i];
  return C;
}

inline Pose inverse(const Pose& A) {
  Pose B;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) B.R[i * 3 + j] = A.R[j * 3 + i];
  double nt[3];
  mat3_vec(B.R, A.t, nt);
  for (int i = 0; i < 3; ++i) B.t[i] = -nt[i];
  return B;
}

inline Pose between(const Pose& A, const Pose& B) { return compose(inverse(A), B); }

inline Pose retract(const Pose& T, const double* xi) {
  return compose(T, se3_exp(xi));
}

// World -> camera: p_c = R^T (p_w - t).
inline void transform_to(const Pose& T, const double* pw, double* pc) {
  double d[3] = {pw[0] - T.t[0], pw[1] - T.t[1], pw[2] - T.t[2]};
  mat3_tvec(T.R, d, pc);
}

// 6x6 adjoint with [w, v] ordering: [[R, 0], [skew(t) R, R]].
inline void adjoint(const Pose& T, double* A) {
  double St[9], StR[9];
  skew(T.t, St);
  mat3_mul(St, T.R, StR);
  std::memset(A, 0, 36 * sizeof(double));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      A[i * 6 + j] = T.R[i * 3 + j];
      A[(i + 3) * 6 + (j + 3)] = T.R[i * 3 + j];
      A[(i + 3) * 6 + j] = StR[i * 3 + j];
    }
}

}  // namespace ssl
