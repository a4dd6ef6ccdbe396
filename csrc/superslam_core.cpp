// superslam_tpu native estimation core.
//
// The reference implements its whole estimation layer in C++ on GTSAM
// (FrameTracker, GlobalPoseGraph; /root/reference/src/FrameTracker.cc,
// GlobalPoseGraph.cc). This library is the TPU-framework counterpart: the
// per-frame pose-only Levenberg-Marquardt solve and the batch pose-graph LM
// as dependency-free C++ with a C ABI, loaded from Python via ctypes
// (superslam_tpu/native.py). Semantics mirror the numpy implementations
// exactly (same factors, same Huber, same damping strategy); those remain
// the oracle in tests/test_native_core.py.
//
// Build: make -C csrc   (g++ -O3 -shared, no dependencies)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "linalg.h"
#include "se3.h"

namespace {

using ssl::Pose;

Pose pose_from(const double* Rt) {  // 12 doubles: R row-major then t
  Pose p;
  std::memcpy(p.R, Rt, 9 * sizeof(double));
  std::memcpy(p.t, Rt + 9, 3 * sizeof(double));
  return p;
}

void pose_to(const Pose& p, double* Rt) {
  std::memcpy(Rt, p.R, 9 * sizeof(double));
  std::memcpy(Rt + 9, p.t, 3 * sizeof(double));
}

// Stereo residual + optional 3x6 pose Jacobian for one point. Cheirality ->
// residual 2*fx, zero J (PoseOptimizationFactors.h:94-99 semantics).
inline void stereo_factor(const Pose& T, const double* Xw, const double* meas,
                          double fx, double fy, double cx, double cy, double b,
                          double* r, double* J /* may be null */) {
  double p[3];
  ssl::transform_to(T, Xw, p);
  if (p[2] <= 1e-9) {
    r[0] = r[1] = r[2] = 2.0 * fx;
    if (J) std::memset(J, 0, 18 * sizeof(double));
    return;
  }
  const double iz = 1.0 / p[2], iz2 = iz * iz;
  r[0] = fx * p[0] * iz + cx - meas[0];
  r[1] = fx * (p[0] - b) * iz + cx - meas[1];
  r[2] = fy * p[1] * iz + cy - meas[2];
  if (!J) return;
  // Jp = d(uL,uR,v)/dp_cam ; Dcam = [skew(p), -I]
  const double Jp[9] = {fx * iz, 0, -fx * p[0] * iz2,
                        fx * iz, 0, -fx * (p[0] - b) * iz2,
                        0, fy * iz, -fy * p[1] * iz2};
  // Dcam = [skew(p_cam), -I] (right retraction; matches core/factors.py).
  const double D[18] = {0, -p[2], p[1], -1, 0, 0,
                        p[2], 0, -p[0], 0, -1, 0,
                        -p[1], p[0], 0, 0, 0, -1};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 6; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += Jp[i * 3 + k] * D[k * 6 + j];
      J[i * 6 + j] = s;
    }
}

}  // namespace

extern "C" {

// ---- SE(3) primitives (for cross-validation from Python) -------------------

void ssl_se3_exp(const double* xi, double* Rt_out) {
  pose_to(ssl::se3_exp(xi), Rt_out);
}

void ssl_se3_log(const double* Rt, double* xi_out) {
  ssl::se3_log(pose_from(Rt), xi_out);
}

void ssl_se3_compose(const double* A, const double* B, double* out) {
  pose_to(ssl::compose(pose_from(A), pose_from(B)), out);
}

void ssl_se3_between(const double* A, const double* B, double* out) {
  pose_to(ssl::between(pose_from(A), pose_from(B)), out);
}

// ---- pose-only stereo LM (FrameTracker) ------------------------------------
//
// Xw (n,3), meas (n,3) = (uL,uR,v), sigmas (n,3) diagonal noise,
// pose_init/pose_out: 12 doubles (R row-major, t). Returns iterations used.

int ssl_pose_only_lm(const double* Xw, const double* meas, const double* sigmas,
                     int n, double fx, double fy, double cx, double cy,
                     double baseline, double huber_k, const double* pose_init,
                     double* pose_out, int max_iters) {
  Pose pose = pose_from(pose_init);
  if (n == 0) {
    pose_to(pose, pose_out);
    return 0;
  }

  auto robust_error = [&](const Pose& T) {
    double err = 0;
    double r[3];
    for (int i = 0; i < n; ++i) {
      stereo_factor(T, Xw + 3 * i, meas + 3 * i, fx, fy, cx, cy, baseline, r,
                    nullptr);
      double nw = 0;
      for (int d = 0; d < 3; ++d) {
        const double rw = r[d] / sigmas[3 * i + d];
        nw += rw * rw;
      }
      nw = std::sqrt(nw);
      err += (nw <= huber_k) ? 0.5 * nw * nw : huber_k * nw - 0.5 * huber_k * huber_k;
    }
    return err;
  };

  double lam = 1e-5;
  const double lam_factor = 10.0;
  double err = robust_error(pose);
  int it = 0;
  std::vector<double> H(36), g(6), delta;
  for (; it < max_iters; ++it) {
    std::fill(H.begin(), H.end(), 0.0);
    std::fill(g.begin(), g.end(), 0.0);
    double r[3], J[18];
    for (int i = 0; i < n; ++i) {
      stereo_factor(pose, Xw + 3 * i, meas + 3 * i, fx, fy, cx, cy, baseline, r, J);
      double rw[3], Jw[18], nw = 0;
      for (int d = 0; d < 3; ++d) {
        const double inv = 1.0 / sigmas[3 * i + d];
        rw[d] = r[d] * inv;
        for (int j = 0; j < 6; ++j) Jw[d * 6 + j] = J[d * 6 + j] * inv;
        nw += rw[d] * rw[d];
      }
      nw = std::sqrt(nw);
      const double w = (nw <= huber_k || nw < 1e-12) ? 1.0 : huber_k / nw;
      for (int d = 0; d < 3; ++d) {
        for (int j = 0; j < 6; ++j) {
          g[j] += w * Jw[d * 6 + j] * rw[d];
          for (int k = j; k < 6; ++k) H[j * 6 + k] += w * Jw[d * 6 + j] * Jw[d * 6 + k];
        }
      }
    }
    for (int j = 0; j < 6; ++j)
      for (int k = 0; k < j; ++k) H[j * 6 + k] = H[k * 6 + j];

    bool stepped = false;
    for (int tries = 0; tries < 10; ++tries) {
      if (!ssl::damped_solve(H, g, 6, lam, delta)) {
        lam *= lam_factor;
        continue;
      }
      const Pose cand = ssl::retract(pose, delta.data());
      const double cand_err = robust_error(cand);
      if (cand_err < err) {
        const double improvement = err - cand_err;
        pose = cand;
        err = cand_err;
        lam = std::max(lam / lam_factor, 1e-10);
        stepped = true;
        if (improvement < 1e-5 * std::max(err, 1.0) || improvement < 1e-5) {
          pose_to(pose, pose_out);
          return it + 1;
        }
        break;
      }
      lam *= lam_factor;
      if (lam > 1e10) {
        pose_to(pose, pose_out);
        return it + 1;
      }
    }
    if (!stepped) break;
  }
  pose_to(pose, pose_out);
  return it;
}

// ---- batch pose-graph LM (GlobalPoseGraph) ---------------------------------
//
// nodes: K seeds (K x 12). edges: E rows of
//   [i, j] int32 pairs, rel (E x 12), inv_sigmas (E x 6), huber_k (E,)
//   (huber_k <= 0 -> quadratic edge).
// prior_idx: node with a prior (its seed value), prior_info scalar (1/s^2).
// Writes K x 12 out. Returns LM iterations, or -1 on failure/divergence
// (caller keeps seeds and applies the loop-rollback policy in Python).

int ssl_pose_graph_lm(const double* seeds, int K, const int32_t* edge_ij, int E,
                      const double* rel, const double* edge_inv_sig,
                      const double* edge_huber, int prior_idx, double prior_info,
                      double* out, int max_iters) {
  std::vector<Pose> poses(K);
  for (int i = 0; i < K; ++i) poses[i] = pose_from(seeds + 12 * i);
  const Pose prior_pose = poses[prior_idx];
  const int N = 6 * K;

  auto edge_residual = [&](const std::vector<Pose>& ps, int e, double* r6) {
    const int i = edge_ij[2 * e], j = edge_ij[2 * e + 1];
    const Pose Eij = ssl::compose(ssl::inverse(pose_from(rel + 12 * e)),
                                  ssl::between(ps[i], ps[j]));
    ssl::se3_log(Eij, r6);
  };

  auto total_error = [&](const std::vector<Pose>& ps) {
    double err = 0;
    double r[6];
    for (int e = 0; e < E; ++e) {
      edge_residual(ps, e, r);
      double nw = 0;
      for (int d = 0; d < 6; ++d) {
        const double rw = r[d] * edge_inv_sig[6 * e + d];
        nw += rw * rw;
      }
      const double hk = edge_huber[e];
      if (hk > 0) {
        const double nn = std::sqrt(nw);
        err += (nn <= hk) ? 0.5 * nw : hk * nn - 0.5 * hk * hk;
      } else {
        err += 0.5 * nw;
      }
    }
    double dxi[6];
    ssl::se3_log(ssl::between(prior_pose, ps[prior_idx]), dxi);
    for (int d = 0; d < 6; ++d) err += 0.5 * prior_info * dxi[d] * dxi[d];
    return err;
  };

  double err = total_error(poses);
  if (!std::isfinite(err)) return -1;
  double lam = 1e-5;
  const double lam_factor = 10.0;
  int it = 0;

  std::vector<double> H(static_cast<size_t>(N) * N), g(N), delta;
  for (; it < max_iters; ++it) {
    std::fill(H.begin(), H.end(), 0.0);
    std::fill(g.begin(), g.end(), 0.0);
    double r[6], Ji[36], Jj[36], Ad[36];
    for (int e = 0; e < E; ++e) {
      const int i = edge_ij[2 * e], j = edge_ij[2 * e + 1];
      edge_residual(poses, e, r);
      // d r/d xi_j ~= I ; d r/d xi_i ~= -Ad(Tj^-1 Ti)  (pose_graph.py).
      ssl::adjoint(ssl::between(poses[j], poses[i]), Ad);
      for (int a = 0; a < 36; ++a) {
        Ji[a] = -Ad[a];
        Jj[a] = 0;
      }
      for (int a = 0; a < 6; ++a) Jj[a * 6 + a] = 1.0;

      double rw[6], Jiw[36], Jjw[36], nw = 0;
      for (int d = 0; d < 6; ++d) {
        const double inv = edge_inv_sig[6 * e + d];
        rw[d] = r[d] * inv;
        for (int c = 0; c < 6; ++c) {
          Jiw[d * 6 + c] = Ji[d * 6 + c] * inv;
          Jjw[d * 6 + c] = Jj[d * 6 + c] * inv;
        }
        nw += rw[d] * rw[d];
      }
      const double hk = edge_huber[e];
      if (hk > 0) {
        const double nn = std::sqrt(nw);
        if (nn > hk) {
          // sqrt of the IRLS weight hk/|r|: r and J each carry sqrt(w) so
          // the assembled J^T J / J^T r carry w exactly once.
          const double s = std::sqrt(hk / nn);
          for (int d = 0; d < 6; ++d) {
            rw[d] *= s;
            for (int c = 0; c < 6; ++c) {
              Jiw[d * 6 + c] *= s;
              Jjw[d * 6 + c] *= s;
            }
          }
        }
      }
      const int oi = 6 * i, oj = 6 * j;
      for (int a = 0; a < 6; ++a)
        for (int b2 = 0; b2 < 6; ++b2) {
          double hii = 0, hjj = 0, hij = 0;
          for (int d = 0; d < 6; ++d) {
            hii += Jiw[d * 6 + a] * Jiw[d * 6 + b2];
            hjj += Jjw[d * 6 + a] * Jjw[d * 6 + b2];
            hij += Jiw[d * 6 + a] * Jjw[d * 6 + b2];
          }
          H[(oi + a) * N + (oi + b2)] += hii;
          H[(oj + a) * N + (oj + b2)] += hjj;
          H[(oi + a) * N + (oj + b2)] += hij;
          H[(oj + b2) * N + (oi + a)] += hij;
        }
      for (int a = 0; a < 6; ++a) {
        double gi = 0, gj = 0;
        for (int d = 0; d < 6; ++d) {
          gi += Jiw[d * 6 + a] * rw[d];
          gj += Jjw[d * 6 + a] * rw[d];
        }
        g[oi + a] += gi;
        g[oj + a] += gj;
      }
    }
    // Prior block.
    {
      double dxi[6];
      ssl::se3_log(ssl::between(prior_pose, poses[prior_idx]), dxi);
      const int op = 6 * prior_idx;
      for (int a = 0; a < 6; ++a) {
        H[(op + a) * N + (op + a)] += prior_info;
        g[op + a] += prior_info * dxi[a];
      }
    }

    bool stepped = false;
    for (int tries = 0; tries < 10; ++tries) {
      if (!ssl::damped_solve(H, g, N, lam, delta)) {
        lam *= lam_factor;
        if (lam > 1e10) goto done;
        continue;
      }
      bool finite = true;
      for (int a = 0; a < N; ++a)
        if (!std::isfinite(delta[a])) finite = false;
      if (!finite) return -1;
      std::vector<Pose> cand(K);
      for (int i = 0; i < K; ++i) cand[i] = ssl::retract(poses[i], delta.data() + 6 * i);
      const double cand_err = total_error(cand);
      if (cand_err < err) {
        const double improvement = err - cand_err;
        poses.swap(cand);
        err = cand_err;
        lam = std::max(lam / lam_factor, 1e-10);
        stepped = true;
        if (improvement < 1e-5 * std::max(err, 1.0) || improvement < 1e-6) goto done;
        break;
      }
      lam *= lam_factor;
      if (lam > 1e10) goto done;
    }
    if (!stepped) break;
  }
done:
  for (int i = 0; i < K; ++i) pose_to(poses[i], out + 12 * i);
  return it;
}

}  // extern "C"
