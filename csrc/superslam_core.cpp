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

// ---- sliding-window smoother LM (WindowSmoother) ----------------------------
//
// The smart-stereo-factor window solve in variable-projection form, the
// native mirror of core/window_smoother.py::_lm (which mirrors GTSAM's
// SmartStereoProjectionPoseFactor semantics from
// /root/reference/src/WindowSmoother.cc:38-118): per landmark, re-triangulate
// from the current poses (5 GN iterations, poses fixed), dynamic outlier
// rejection on the max per-view reprojection error, Schur-eliminate the
// point into a dense 6K x 6K reduced camera system, gauge prior on pose 0.
//
// poses: K x 12 seeds. views: L x m_max int32 (padded); meas: L x m_max x 3;
// mlen: L valid-view counts (>= 2). Writes K x 12. Returns LM iterations
// (caller keeps seeds on divergence, matching the python policy).

namespace {

struct WinCalib {
  double fx, fy, cx, cy, b, bf;
};

// Camera-frame projection Jacobian d(uL,uR,v)/dp_cam (row-major 3x3).
inline void win_proj_jac(const WinCalib& c, const double* p, double iz,
                         double* Jp) {
  const double iz2 = iz * iz;
  Jp[0] = c.fx * iz; Jp[1] = 0;         Jp[2] = -c.fx * p[0] * iz2;
  Jp[3] = c.fx * iz; Jp[4] = 0;         Jp[5] = -c.fx * (p[0] - c.b) * iz2;
  Jp[6] = 0;         Jp[7] = c.fy * iz; Jp[8] = -c.fy * p[1] * iz2;
}

inline void win_residual(const WinCalib& c, const double* p, double iz,
                         const double* meas, double* r) {
  r[0] = c.fx * p[0] * iz + c.cx - meas[0];
  r[1] = c.fx * (p[0] - c.b) * iz + c.cx - meas[1];
  r[2] = c.fy * p[1] * iz + c.cy - meas[2];
}

constexpr double kWinEps = 1e-9;  // WindowSmoother.DEGENERACY_EPS

// GN triangulation of one landmark from fixed poses. Returns validity.
inline bool win_triangulate(const std::vector<Pose>& poses, const WinCalib& c,
                            const int32_t* views, const double* meas, int m,
                            double* X) {
  // Init: first view's stereo backprojection lifted to world.
  const double disp0 = meas[0] - meas[1];
  bool ok = disp0 > 1e-6;
  const double z0 = c.bf / (ok ? disp0 : 1.0);
  const double cam0[3] = {(meas[0] - c.cx) * z0 / c.fx,
                          (meas[2] - c.cy) * z0 / c.fy, z0};
  const Pose& T0 = poses[views[0]];
  ssl::mat3_vec(T0.R, cam0, X);
  for (int d = 0; d < 3; ++d) X[d] += T0.t[d];

  for (int it = 0; it < 5; ++it) {
    double A[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
    double g[3] = {0, 0, 0};
    for (int v = 0; v < m; ++v) {
      const Pose& T = poses[views[v]];
      double p[3];
      ssl::transform_to(T, X, p);
      if (p[2] <= kWinEps) ok = false;
      const double zs = p[2] > kWinEps ? p[2] : 1.0;
      const double iz = 1.0 / zs;
      double r[3], Jp[9], Jx[9];
      win_residual(c, p, iz, meas + 3 * v, r);
      win_proj_jac(c, p, iz, Jp);
      // Jx = Jp @ R^T (p_cam = R^T (X - t)).
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
          double s = 0;
          for (int k = 0; k < 3; ++k) s += Jp[i * 3 + k] * T.R[j * 3 + k];
          Jx[i * 3 + j] = s;
        }
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
          for (int k = j; k < 3; ++k) A[j * 3 + k] += Jx[i * 3 + j] * Jx[i * 3 + k];
          g[j] += Jx[i * 3 + j] * r[i];
        }
    }
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < j; ++k) A[j * 3 + k] = A[k * 3 + j];
    for (int d = 0; d < 3; ++d) A[d * 3 + d] += 1e-9;
    // 3x3 solve via adjugate (A is SPD-ish and tiny).
    const double det = A[0] * (A[4] * A[8] - A[5] * A[7]) -
                       A[1] * (A[3] * A[8] - A[5] * A[6]) +
                       A[2] * (A[3] * A[7] - A[4] * A[6]);
    if (!(std::fabs(det) > 1e-300)) return false;
    const double id = 1.0 / det;
    const double Ai[9] = {
        (A[4] * A[8] - A[5] * A[7]) * id, (A[2] * A[7] - A[1] * A[8]) * id,
        (A[1] * A[5] - A[2] * A[4]) * id, (A[5] * A[6] - A[3] * A[8]) * id,
        (A[0] * A[8] - A[2] * A[6]) * id, (A[2] * A[3] - A[0] * A[5]) * id,
        (A[3] * A[7] - A[4] * A[6]) * id, (A[1] * A[6] - A[0] * A[7]) * id,
        (A[0] * A[4] - A[1] * A[3]) * id};
    if (ok) {
      for (int d = 0; d < 3; ++d)
        X[d] -= Ai[d * 3 + 0] * g[0] + Ai[d * 3 + 1] * g[1] + Ai[d * 3 + 2] * g[2];
    }
  }
  for (int v = 0; v < m; ++v) {
    double p[3];
    ssl::transform_to(poses[views[v]], X, p);
    if (p[2] <= kWinEps) ok = false;
  }
  for (int d = 0; d < 3; ++d)
    if (!std::isfinite(X[d])) ok = false;
  return ok;
}

}  // namespace

extern "C" {

int ssl_window_lm(const double* pose_seeds, int K, const int32_t* views,
                  const double* meas, const int32_t* mlen, int L, int m_max,
                  double fx, double fy, double cx, double cy, double baseline,
                  double inv_sigma, double dyn_outlier_px, double prior_info,
                  double huber_k, double* out, int max_iters) {
  std::vector<Pose> poses(K);
  for (int i = 0; i < K; ++i) poses[i] = pose_from(pose_seeds + 12 * i);
  const Pose prior_pose = poses[0];
  const WinCalib c{fx, fy, cx, cy, baseline, fx * baseline};
  const int N = 6 * K;

  // Per-landmark keep decision + 0.5*chi2 (fresh triangulation each call).
  auto total_error = [&](const std::vector<Pose>& ps) {
    double err = 0;
    double X[3];
    for (int l = 0; l < L; ++l) {
      const int m = mlen[l];
      const int32_t* vw = views + static_cast<size_t>(l) * m_max;
      const double* ms = meas + static_cast<size_t>(l) * m_max * 3;
      if (!win_triangulate(ps, c, vw, ms, m, X)) continue;
      double maxerr = 0, chi = 0;
      for (int v = 0; v < m; ++v) {
        double p[3], r[3];
        ssl::transform_to(ps[vw[v]], X, p);
        const double zs = p[2] > kWinEps ? p[2] : 1.0;
        win_residual(c, p, 1.0 / zs, ms + 3 * v, r);
        const double nn = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
        if (nn > maxerr) maxerr = nn;
        const double e = nn * inv_sigma;  // whitened per-view residual norm
        if (huber_k > 0 && e > huber_k)
          chi += 2.0 * (huber_k * e - 0.5 * huber_k * huber_k);
        else
          chi += e * e;
      }
      if (dyn_outlier_px > 0 && maxerr >= dyn_outlier_px) continue;
      err += 0.5 * chi;
    }
    double dxi[6];
    ssl::se3_log(ssl::between(prior_pose, ps[0]), dxi);
    for (int d = 0; d < 6; ++d) err += 0.5 * prior_info * dxi[d] * dxi[d];
    return err;
  };

  // Schur-reduced camera system H (6K x 6K), b (6K). Returns false when no
  // factor survives (python: keep seeds).
  std::vector<double> H(static_cast<size_t>(N) * N), b(N);
  auto build = [&](const std::vector<Pose>& ps) {
    std::fill(H.begin(), H.end(), 0.0);
    std::fill(b.begin(), b.end(), 0.0);
    bool any = false;
    double X[3];
    std::vector<double> U(m_max * 18), Jx(m_max * 9), rw(m_max * 3), W(m_max * 18);
    for (int l = 0; l < L; ++l) {
      const int m = mlen[l];
      const int32_t* vw = views + static_cast<size_t>(l) * m_max;
      const double* ms = meas + static_cast<size_t>(l) * m_max * 3;
      const bool ok = win_triangulate(ps, c, vw, ms, m, X);
      double maxerr = 0;
      double A[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
      double gx[3] = {0, 0, 0};
      for (int v = 0; v < m; ++v) {
        const Pose& T = ps[vw[v]];
        double p[3], r[3], Jp[9];
        ssl::transform_to(T, X, p);
        const double zs = p[2] > kWinEps ? p[2] : 1.0;
        const double iz = 1.0 / zs;
        win_residual(c, p, iz, ms + 3 * v, r);
        win_proj_jac(c, p, iz, Jp);
        const double nn = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
        if (nn > maxerr) maxerr = nn;
        // Dcam = [skew(p_cam), -I]; U = (Jp @ Dcam) * inv_sigma (3x6).
        const double D[18] = {0, -p[2], p[1], -1, 0, 0,
                              p[2], 0, -p[0], 0, -1, 0,
                              -p[1], p[0], 0, 0, 0, -1};
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 6; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += Jp[i * 3 + k] * D[k * 6 + j];
            U[v * 18 + i * 6 + j] = s * inv_sigma;
          }
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += Jp[i * 3 + k] * T.R[j * 3 + k];
            Jx[v * 9 + i * 3 + j] = s * inv_sigma;
          }
        for (int d = 0; d < 3; ++d) rw[v * 3 + d] = r[d] * inv_sigma;
        if (huber_k > 0) {
          // IRLS Huber: scale this view's whitened residual + Jacobians by
          // sqrt(min(1, k/e)) so outlier views have bounded influence
          // (mirrors WindowSmoother._build_reduced_system).
          const double e = std::sqrt(rw[v * 3] * rw[v * 3] +
                                     rw[v * 3 + 1] * rw[v * 3 + 1] +
                                     rw[v * 3 + 2] * rw[v * 3 + 2]);
          if (e > huber_k) {
            const double sw = std::sqrt(huber_k / e);
            for (int d = 0; d < 18; ++d) U[v * 18 + d] *= sw;
            for (int d = 0; d < 9; ++d) Jx[v * 9 + d] *= sw;
            for (int d = 0; d < 3; ++d) rw[v * 3 + d] *= sw;
          }
        }
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j) {
            for (int k = 0; k < 3; ++k)
              if (k >= j) A[j * 3 + k] += Jx[v * 9 + i * 3 + j] * Jx[v * 9 + i * 3 + k];
            gx[j] += Jx[v * 9 + i * 3 + j] * rw[v * 3 + i];
          }
      }
      if (!ok || (dyn_outlier_px > 0 && maxerr >= dyn_outlier_px)) continue;
      any = true;
      for (int j = 0; j < 3; ++j)
        for (int k = 0; k < j; ++k) A[j * 3 + k] = A[k * 3 + j];
      for (int d = 0; d < 3; ++d) A[d * 3 + d] += 1e-12;
      const double det = A[0] * (A[4] * A[8] - A[5] * A[7]) -
                         A[1] * (A[3] * A[8] - A[5] * A[6]) +
                         A[2] * (A[3] * A[7] - A[4] * A[6]);
      if (!(std::fabs(det) > 1e-300)) continue;
      const double id = 1.0 / det;
      const double Ai[9] = {
          (A[4] * A[8] - A[5] * A[7]) * id, (A[2] * A[7] - A[1] * A[8]) * id,
          (A[1] * A[5] - A[2] * A[4]) * id, (A[5] * A[6] - A[3] * A[8]) * id,
          (A[0] * A[8] - A[2] * A[6]) * id, (A[2] * A[3] - A[0] * A[5]) * id,
          (A[3] * A[7] - A[4] * A[6]) * id, (A[1] * A[6] - A[0] * A[7]) * id,
          (A[0] * A[4] - A[1] * A[3]) * id};
      double Ainv_gx[3];
      ssl::mat3_vec(Ai, gx, Ainv_gx);
      // W_v = U_v^T Jx_v (6x3).
      for (int v = 0; v < m; ++v)
        for (int a = 0; a < 6; ++a)
          for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int i = 0; i < 3; ++i)
              s += U[v * 18 + i * 6 + a] * Jx[v * 9 + i * 3 + j];
            W[v * 18 + a * 3 + j] = s;
          }
      for (int v = 0; v < m; ++v) {
        const int ov = 6 * vw[v];
        for (int a = 0; a < 6; ++a) {
          double gd = 0;
          for (int i = 0; i < 3; ++i) gd += U[v * 18 + i * 6 + a] * rw[v * 3 + i];
          double gc = 0;
          for (int j = 0; j < 3; ++j) gc += W[v * 18 + a * 3 + j] * Ainv_gx[j];
          b[ov + a] += gd - gc;
          for (int a2 = 0; a2 < 6; ++a2) {
            double hd = 0;
            for (int i = 0; i < 3; ++i)
              hd += U[v * 18 + i * 6 + a] * U[v * 18 + i * 6 + a2];
            H[(ov + a) * static_cast<size_t>(N) + (ov + a2)] += hd;
          }
        }
        // -W_v A^-1 W_k^T over all view pairs.
        double WA[18];  // W_v @ Ainv (6x3)
        for (int a = 0; a < 6; ++a)
          for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += W[v * 18 + a * 3 + k] * Ai[k * 3 + j];
            WA[a * 3 + j] = s;
          }
        for (int k = 0; k < m; ++k) {
          const int ok2 = 6 * vw[k];
          for (int a = 0; a < 6; ++a)
            for (int a2 = 0; a2 < 6; ++a2) {
              double s = 0;
              for (int j = 0; j < 3; ++j)
                s += WA[a * 3 + j] * W[k * 18 + a2 * 3 + j];
              H[(ov + a) * static_cast<size_t>(N) + (ok2 + a2)] -= s;
            }
        }
      }
    }
    if (!any) return false;
    // Gauge prior on the oldest keyframe.
    double dxi[6];
    ssl::se3_log(ssl::between(prior_pose, ps[0]), dxi);
    for (int a = 0; a < 6; ++a) {
      H[a * static_cast<size_t>(N) + a] += prior_info;
      b[a] += prior_info * dxi[a];
    }
    return true;
  };

  double err = total_error(poses);
  double lam = 1e-5;
  const double lam_factor = 10.0;
  const double rel_tol = 1e-3, abs_tol = 1e-3;
  int it = 0;
  std::vector<double> delta;
  for (; it < max_iters; ++it) {
    if (!build(poses)) break;
    bool stepped = false;
    for (int tries = 0; tries < 8; ++tries) {
      if (!ssl::damped_solve(H, b, N, lam, delta)) {
        lam *= lam_factor;
        continue;
      }
      std::vector<Pose> cand(K);
      for (int i = 0; i < K; ++i)
        cand[i] = ssl::retract(poses[i], delta.data() + 6 * i);
      const double cand_err = total_error(cand);
      if (cand_err < err) {
        const double improvement = err - cand_err;
        poses.swap(cand);
        err = cand_err;
        lam = std::max(lam / lam_factor, 1e-10);
        stepped = true;
        if (improvement < rel_tol * std::max(err, 1.0) || improvement < abs_tol)
          goto win_done;
        break;
      }
      lam *= lam_factor;
      if (lam > 1e8) goto win_done;
    }
    if (!stepped) break;
  }
win_done:
  for (int i = 0; i < K; ++i) pose_to(poses[i], out + 12 * i);
  return it;
}

// Seed gate for the window smoother: triangulate every track ONCE at the
// seed poses (the same win_triangulate the LM uses) and keep tracks whose
// max per-view reprojection-error norm is under gate_px, with cheirality.
// Native mirror of WindowSmoother._prefilter_groups (the numpy oracle) —
// the gate is evaluated once and FROZEN for the solve by design (the LM is
// then called with dyn_outlier_px = 0); see window_smoother.py for why the
// GTSAM-style per-linearization re-gate was rejected. One deliberate
// difference: a singular triangulation normal matrix marks that single
// track keep=0, where the batched numpy path raises and re-gates per group.
void ssl_window_seed_gate(const double* pose_seeds, int K,
                          const int32_t* views, const double* meas,
                          const int32_t* mlen, int L, int m_max, double fx,
                          double fy, double cx, double cy, double baseline,
                          double gate_px, uint8_t* keep_out) {
  std::vector<Pose> poses(K);
  for (int i = 0; i < K; ++i) poses[i] = pose_from(pose_seeds + 12 * i);
  const WinCalib c{fx, fy, cx, cy, baseline, fx * baseline};
  double X[3];
  for (int l = 0; l < L; ++l) {
    const int m = mlen[l];
    const int32_t* vw = views + static_cast<size_t>(l) * m_max;
    const double* ms = meas + static_cast<size_t>(l) * m_max * 3;
    const bool ok = win_triangulate(poses, c, vw, ms, m, X);
    double maxerr = 0;
    if (ok) {
      for (int v = 0; v < m; ++v) {
        double p[3], r[3];
        ssl::transform_to(poses[vw[v]], X, p);
        const double zs = p[2] > kWinEps ? p[2] : 1.0;
        win_residual(c, p, 1.0 / zs, ms + 3 * v, r);
        const double nn = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
        if (nn > maxerr) maxerr = nn;
      }
    }
    keep_out[l] = (ok && maxerr < gate_px) ? 1 : 0;
  }
}

}  // extern "C"
