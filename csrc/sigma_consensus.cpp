// σ-consensus model polishing — the TPU framework's native counterpart of
// the reference's pymagsac C++ boundary (SURVEY.md §2.12):
//   * findEssentialMatrix / findFundamentalMatrix / findRigidTransformation
//     final-model polishing (σ-marginalized iteratively-reweighted LS), and
//   * optimizeEssentialMatrix-style Levenberg–Marquardt refinement of E on
//     inliers (reference call site ransac.py:157-165).
//
// Architecture note: in the reference the ENTIRE robust search crosses into
// C++ (pymagsac) because its Python hypothesis loop is slow. Here the search
// runs on TPU; only the final sequential polish — a poor fit for batched
// XLA programs — is native code. Exposed via extern "C" for ctypes.
//
// σ-consensus: marginalize the unknown inlier noise scale σ over (0, σ_max]
// (MAGSAC-style discrete marginalization over K levels): each point's weight
// is the σ-averaged truncated-Gaussian density of its residual; the model is
// re-fit by weighted least squares and iterated.

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// Small dense linear algebra (fixed sizes; no external deps)
// ---------------------------------------------------------------------------

// Cyclic Jacobi eigendecomposition of a symmetric n×n matrix (n <= 16).
// A is row-major and destroyed; V receives eigenvectors in columns;
// w receives eigenvalues (unsorted).
void jacobi_eigh(double* A, double* V, double* w, int n, int sweeps = 12) {
  for (int i = 0; i < n * n; ++i) V[i] = 0.0;
  for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;
  for (int s = 0; s < sweeps; ++s) {
    for (int p = 0; p < n - 1; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-300) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) / (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
        double c = 1.0 / std::sqrt(1.0 + t * t);
        double sn = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - sn * akq;
          A[k * n + q] = sn * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - sn * aqk;
          A[q * n + k] = sn * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - sn * vkq;
          V[k * n + q] = sn * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < n; ++i) w[i] = A[i * n + i];
}

// index of the smallest eigenvalue
int argmin_n(const double* w, int n) {
  int best = 0;
  for (int i = 1; i < n; ++i)
    if (w[i] < w[best]) best = i;
  return best;
}

// SVD of a 3×3 matrix via eigendecomposition of MᵀM (V) and MMᵀ (U) with
// sign-consistent singular vectors. Returns U, s, Vt row-major.
void svd3(const double* M, double* U, double* s, double* Vt) {
  double MtM[9], MMt[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double a = 0, b = 0;
      for (int k = 0; k < 3; ++k) {
        a += M[k * 3 + i] * M[k * 3 + j];
        b += M[i * 3 + k] * M[j * 3 + k];
      }
      MtM[i * 3 + j] = a;
      MMt[i * 3 + j] = b;
    }
  double V[9], wv[3], Acopy[9];
  std::memcpy(Acopy, MtM, sizeof(Acopy));
  jacobi_eigh(Acopy, V, wv, 3);
  // sort descending
  int order[3] = {0, 1, 2};
  std::sort(order, order + 3, [&](int a, int b) { return wv[a] > wv[b]; });
  for (int c = 0; c < 3; ++c) {
    s[c] = std::sqrt(std::max(0.0, wv[order[c]]));
    for (int r = 0; r < 3; ++r) Vt[c * 3 + r] = V[r * 3 + order[c]];
  }
  // U columns = M v / s (with graceful fallback for zero singulars)
  for (int c = 0; c < 3; ++c) {
    double u[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) u[r] += M[r * 3 + k] * Vt[c * 3 + k];
    double nrm = std::sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2]);
    if (nrm < 1e-12) {
      // complete to an orthonormal basis via cross product of prior columns
      if (c == 2) {
        u[0] = U[0 * 3 + 0] * 0 + (U[1 * 3 + 0] * U[2 * 3 + 1] - U[2 * 3 + 0] * U[1 * 3 + 1]);
        u[0] = U[1 * 3 + 0] * U[2 * 3 + 1] - U[2 * 3 + 0] * U[1 * 3 + 1];
        u[1] = U[2 * 3 + 0] * U[0 * 3 + 1] - U[0 * 3 + 0] * U[2 * 3 + 1];
        u[2] = U[0 * 3 + 0] * U[1 * 3 + 1] - U[1 * 3 + 0] * U[0 * 3 + 1];
        nrm = std::sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2]);
      }
      if (nrm < 1e-12) { u[0] = 1; u[1] = 0; u[2] = 0; nrm = 1; }
    }
    for (int r = 0; r < 3; ++r) U[r * 3 + c] = u[r] / nrm;
  }
}

// Sampson squared distance of correspondence (x1,y1,x2,y2) to model M
// (convention x2ᵀ M x1 = 0).
double sampson_sq(const double* m, double x1, double y1, double x2, double y2) {
  double Mx1_0 = m[0] * x1 + m[1] * y1 + m[2];
  double Mx1_1 = m[3] * x1 + m[4] * y1 + m[5];
  double Mx1_2 = m[6] * x1 + m[7] * y1 + m[8];
  double Mtx2_0 = m[0] * x2 + m[3] * y2 + m[6];
  double Mtx2_1 = m[1] * x2 + m[4] * y2 + m[7];
  double num = x2 * Mx1_0 + y2 * Mx1_1 + Mx1_2;
  double den = Mx1_0 * Mx1_0 + Mx1_1 * Mx1_1 + Mtx2_0 * Mtx2_0 + Mtx2_1 * Mtx2_1;
  return num * num / (den + 1e-15);
}

// Weighted epipolar DLT: minimize Σ w_i (a_iᵀ f)² -> smallest eigenvector of
// Σ w_i a_i a_iᵀ. Column order = row-major vec(F) with x2ᵀ F x1 = 0.
void weighted_epipolar_fit(const double* pts, const double* wts, int n, double* model) {
  double G[81] = {0};
  for (int i = 0; i < n; ++i) {
    double w = wts[i];
    if (w <= 0) continue;
    double x1 = pts[i * 4 + 0], y1 = pts[i * 4 + 1];
    double x2 = pts[i * 4 + 2], y2 = pts[i * 4 + 3];
    double a[9] = {x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, 1.0};
    for (int r = 0; r < 9; ++r)
      for (int c = 0; c < 9; ++c) G[r * 9 + c] += w * a[r] * a[c];
  }
  double V[81], w9[9];
  jacobi_eigh(G, V, w9, 9);
  int k = argmin_n(w9, 9);
  for (int i = 0; i < 9; ++i) model[i] = V[i * 9 + k];
}

// project onto the essential manifold (singular values 1,1,0)
void project_essential(double* model) {
  double U[9], s[3], Vt[9];
  svd3(model, U, s, Vt);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      model[r * 3 + c] = U[r * 3 + 0] * Vt[0 * 3 + c] + U[r * 3 + 1] * Vt[1 * 3 + c];
}

// project onto rank-2 (fundamental): zero the smallest singular value
void project_rank2(double* model) {
  double U[9], s[3], Vt[9];
  svd3(model, U, s, Vt);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      model[r * 3 + c] = s[0] * U[r * 3 + 0] * Vt[0 * 3 + c] + s[1] * U[r * 3 + 1] * Vt[1 * 3 + c];
}

constexpr int kSigmaLevels = 10;

// σ-marginalized weight of a squared residual (discrete MAGSAC
// marginalization over K σ-levels in (0, σ_max]).
double sigma_weight(double r2, double sigma_max) {
  double w = 0.0;
  for (int k = 1; k <= kSigmaLevels; ++k) {
    double sigma = sigma_max * k / kSigmaLevels;
    double tau = 3.64 * sigma;  // 0.99 quantile of the 2-DoF residual
    if (r2 < tau * tau) w += std::exp(-r2 / (2.0 * sigma * sigma)) / sigma;
  }
  return w / kSigmaLevels;
}

}  // namespace

extern "C" {

// σ-consensus polish of an epipolar model (E or F).
//   pts: n×4 correspondences (E: calibrated; F: pixels)
//   model: in/out 3×3 row-major (x2ᵀ M x1 = 0 convention)
//   sigma_max: maximum inlier noise scale (same units as pts)
//   essential: 1 -> project to essential manifold each iteration, else rank-2
//   iterations: IRLS iterations
// Returns the final σ-consensus quality (Σ weights), or -1 on failure.
double sigma_consensus_polish(const double* pts, int n, double* model,
                              double sigma_max, int essential, int iterations) {
  if (n < 8) return -1.0;
  double* r2s = new double[n];
  double* wts = new double[n];
  double quality = 0.0;
  for (int it = 0; it < iterations; ++it) {
    for (int i = 0; i < n; ++i)
      r2s[i] = sampson_sq(model, pts[i * 4], pts[i * 4 + 1], pts[i * 4 + 2], pts[i * 4 + 3]);
    // σ-consensus: fit one model per σ level on its hard inlier set and
    // average the (sign-aligned) models weighted by inlier support — the
    // original MAGSAC marginalization over the noise scale.
    double acc[9] = {0};
    double ref[9];
    bool have_ref = false;
    quality = 0.0;
    for (int k = 1; k <= kSigmaLevels; ++k) {
      double tau = 3.64 * sigma_max * k / kSigmaLevels;
      double tau2 = tau * tau;
      int cnt = 0;
      for (int i = 0; i < n; ++i) {
        wts[i] = (r2s[i] < tau2) ? 1.0 : 0.0;
        cnt += (wts[i] > 0);
      }
      if (cnt < 10) continue;
      double fk[9];
      weighted_epipolar_fit(pts, wts, n, fk);
      if (essential) project_essential(fk);
      else project_rank2(fk);
      double nrm = 0;
      bool finite = true;
      for (int i = 0; i < 9; ++i) { nrm += fk[i] * fk[i]; finite = finite && std::isfinite(fk[i]); }
      if (!finite || nrm < 1e-20) continue;
      nrm = std::sqrt(nrm);
      for (int i = 0; i < 9; ++i) fk[i] /= nrm;
      if (!have_ref) { std::memcpy(ref, fk, sizeof(ref)); have_ref = true; }
      double dot = 0;
      for (int i = 0; i < 9; ++i) dot += fk[i] * ref[i];
      double sgn = (dot >= 0) ? 1.0 : -1.0;
      for (int i = 0; i < 9; ++i) acc[i] += cnt * sgn * fk[i];
      quality += cnt * (double)k / kSigmaLevels;
    }
    double nrm = 0;
    for (int i = 0; i < 9; ++i) nrm += acc[i] * acc[i];
    if (!have_ref || nrm < 1e-20) break;
    nrm = std::sqrt(nrm);
    for (int i = 0; i < 9; ++i) acc[i] /= nrm;
    if (essential) project_essential(acc);
    else project_rank2(acc);
    bool finite = true;
    for (int i = 0; i < 9; ++i) finite = finite && std::isfinite(acc[i]);
    if (!finite) break;
    std::memcpy(model, acc, sizeof(acc));
  }
  double nrm = 0;
  for (int i = 0; i < 9; ++i) nrm += model[i] * model[i];
  nrm = std::sqrt(nrm);
  if (nrm > 1e-12)
    for (int i = 0; i < 9; ++i) model[i] /= nrm;
  delete[] wts;
  delete[] r2s;
  return quality;
}

// σ-consensus polish of a rigid 3D transform.
//   pts: n×6 (src xyz, ref xyz); model: in/out 4×4 row-major.
double sigma_consensus_polish_rigid(const double* pts, int n, double* model,
                                    double sigma_max, int iterations) {
  if (n < 3) return -1.0;
  double* wts = new double[n];
  double quality = 0.0;
  for (int it = 0; it < iterations; ++it) {
    quality = 0.0;
    for (int i = 0; i < n; ++i) {
      const double* p = pts + i * 6;
      double tx = model[0] * p[0] + model[1] * p[1] + model[2] * p[2] + model[3];
      double ty = model[4] * p[0] + model[5] * p[1] + model[6] * p[2] + model[7];
      double tz = model[8] * p[0] + model[9] * p[1] + model[10] * p[2] + model[11];
      double dx = tx - p[3], dy = ty - p[4], dz = tz - p[5];
      double r2 = dx * dx + dy * dy + dz * dz;
      wts[i] = sigma_weight(r2, sigma_max);
      quality += wts[i];
    }
    // weighted Kabsch
    double wsum = 0, c0[3] = {0, 0, 0}, c1[3] = {0, 0, 0};
    for (int i = 0; i < n; ++i) {
      wsum += wts[i];
      for (int d = 0; d < 3; ++d) {
        c0[d] += wts[i] * pts[i * 6 + d];
        c1[d] += wts[i] * pts[i * 6 + 3 + d];
      }
    }
    if (wsum < 1e-12) break;
    for (int d = 0; d < 3; ++d) { c0[d] /= wsum; c1[d] /= wsum; }
    double H[9] = {0};
    for (int i = 0; i < n; ++i)
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c)
          H[r * 3 + c] += wts[i] * (pts[i * 6 + r] - c0[r]) * (pts[i * 6 + 3 + c] - c1[c]);
    double U[9], s[3], Vt[9];
    svd3(H, U, s, Vt);
    // R = V diag(1,1,det) Uᵀ
    double R[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = 0;
        for (int k = 0; k < 3; ++k) v += Vt[k * 3 + r] * U[c * 3 + k];
        R[r * 3 + c] = v;
      }
    double det = R[0] * (R[4] * R[8] - R[5] * R[7]) - R[1] * (R[3] * R[8] - R[5] * R[6]) +
                 R[2] * (R[3] * R[7] - R[4] * R[6]);
    if (det < 0) {
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) {
          double v = 0;
          for (int k = 0; k < 3; ++k) {
            double vk = Vt[k * 3 + r] * (k == 2 ? -1.0 : 1.0);
            v += vk * U[c * 3 + k];
          }
          R[r * 3 + c] = v;
        }
    }
    for (int r = 0; r < 3; ++r) {
      double t = c1[r];
      for (int k = 0; k < 3; ++k) t -= R[r * 3 + k] * c0[k];
      for (int c = 0; c < 3; ++c) model[r * 4 + c] = R[r * 3 + c];
      model[r * 4 + 3] = t;
    }
    model[12] = model[13] = model[14] = 0.0;
    model[15] = 1.0;
  }
  delete[] wts;
  return quality;
}

// Levenberg–Marquardt refinement of an essential matrix over the (R, t)
// manifold, minimizing the total Sampson error of the given inliers — the
// counterpart of pymagsac.optimizeEssentialMatrix
// (reference essential_matrix_estimator_nister.py:10-24).
//   pts: n×4 calibrated; inlier_idx: m indices; model: in/out 3×3.
// Parametrization: 5 dof — so(3) rotation update + 2-dof tangent update of
// the unit translation. Gauss–Newton with LM damping; numeric Jacobian of
// the per-point Sampson residuals.
double lm_refine_essential(const double* pts, int n, const long long* inlier_idx,
                           int m, double* model, int max_iters) {
  if (m < 6) return -1.0;
  // decompose model -> R, t (any valid decomposition; the cost depends only
  // on E = [t]x R up to sign so cheirality does not matter here)
  double U[9], s[3], Vt[9];
  svd3(model, U, s, Vt);
  double du = U[0] * (U[4] * U[8] - U[5] * U[7]) - U[1] * (U[3] * U[8] - U[5] * U[6]) +
              U[2] * (U[3] * U[7] - U[4] * U[6]);
  double dv = Vt[0] * (Vt[4] * Vt[8] - Vt[5] * Vt[7]) - Vt[1] * (Vt[3] * Vt[8] - Vt[5] * Vt[6]) +
              Vt[2] * (Vt[3] * Vt[7] - Vt[4] * Vt[6]);
  if (du < 0) for (int i = 0; i < 9; ++i) U[i] = -U[i];
  if (dv < 0) for (int i = 0; i < 9; ++i) Vt[i] = -Vt[i];
  const double W[9] = {0, -1, 0, 1, 0, 0, 0, 0, 1};
  double R[9];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      double v = 0;
      for (int k = 0; k < 3; ++k)
        for (int l = 0; l < 3; ++l) v += U[r * 3 + k] * W[k * 3 + l] * Vt[l * 3 + c];
      R[r * 3 + c] = v;
    }
  double t[3] = {U[2], U[5], U[8]};

  auto compose = [](const double* R_, const double* t_, double* E) {
    double Tx[9] = {0, -t_[2], t_[1], t_[2], 0, -t_[0], -t_[1], t_[0], 0};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = 0;
        for (int k = 0; k < 3; ++k) v += Tx[r * 3 + k] * R_[k * 3 + c];
        E[r * 3 + c] = v;
      }
    double nrm = 0;
    for (int i = 0; i < 9; ++i) nrm += E[i] * E[i];
    nrm = std::sqrt(nrm) + 1e-15;
    for (int i = 0; i < 9; ++i) E[i] /= nrm;
  };
  auto apply_rot = [](double* R_, const double* w) {
    // R <- exp([w]x) R via first order + Gram-Schmidt re-orthonormalization
    double Wx[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
    double Rn[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = R_[r * 3 + c];
        for (int k = 0; k < 3; ++k) v += Wx[r * 3 + k] * R_[k * 3 + c];
        Rn[r * 3 + c] = v;
      }
    auto norm3 = [](double* v) {
      double nn = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) + 1e-15;
      v[0] /= nn; v[1] /= nn; v[2] /= nn;
    };
    norm3(Rn);
    double d = Rn[0] * Rn[3] + Rn[1] * Rn[4] + Rn[2] * Rn[5];
    Rn[3] -= d * Rn[0]; Rn[4] -= d * Rn[1]; Rn[5] -= d * Rn[2];
    norm3(Rn + 3);
    Rn[6] = Rn[1] * Rn[5] - Rn[2] * Rn[4];
    Rn[7] = Rn[2] * Rn[3] - Rn[0] * Rn[5];
    Rn[8] = Rn[0] * Rn[4] - Rn[1] * Rn[3];
    std::memcpy(R_, Rn, sizeof(Rn));
  };
  auto tangent_basis = [](const double* t_, double* b1, double* b2) {
    double a[3] = {0, 0, 0};
    a[(std::fabs(t_[0]) < 0.9) ? 0 : 1] = 1.0;
    b1[0] = t_[1] * a[2] - t_[2] * a[1];
    b1[1] = t_[2] * a[0] - t_[0] * a[2];
    b1[2] = t_[0] * a[1] - t_[1] * a[0];
    double nb = std::sqrt(b1[0] * b1[0] + b1[1] * b1[1] + b1[2] * b1[2]) + 1e-15;
    for (int k = 0; k < 3; ++k) b1[k] /= nb;
    b2[0] = t_[1] * b1[2] - t_[2] * b1[1];
    b2[1] = t_[2] * b1[0] - t_[0] * b1[2];
    b2[2] = t_[0] * b1[1] - t_[1] * b1[0];
  };
  auto perturb = [&](const double* R_, const double* t_, const double* delta,
                     double* Rp, double* tp) {
    std::memcpy(Rp, R_, 9 * sizeof(double));
    double w[3] = {delta[0], delta[1], delta[2]};
    apply_rot(Rp, w);
    double b1[3], b2[3];
    tangent_basis(t_, b1, b2);
    for (int k = 0; k < 3; ++k) tp[k] = t_[k] + delta[3] * b1[k] + delta[4] * b2[k];
    double nt = std::sqrt(tp[0] * tp[0] + tp[1] * tp[1] + tp[2] * tp[2]) + 1e-15;
    for (int k = 0; k < 3; ++k) tp[k] /= nt;
  };

  double* res = new double[m];
  double* res_p = new double[m];
  double* J = new double[m * 5];
  auto residuals = [&](const double* R_, const double* t_, double* out) {
    double E[9];
    compose(R_, t_, E);
    double total = 0;
    for (int j = 0; j < m; ++j) {
      long long i = inlier_idx[j];
      double r2 = sampson_sq(E, pts[i * 4], pts[i * 4 + 1], pts[i * 4 + 2], pts[i * 4 + 3]);
      out[j] = std::sqrt(r2);
      total += r2;
    }
    return total;
  };

  double best = residuals(R, t, res);
  double lambda = 1e-4;
  const double eps = 1e-7;
  for (int it = 0; it < max_iters; ++it) {
    // numeric Jacobian of per-point residuals wrt the 5 local dof
    for (int d = 0; d < 5; ++d) {
      double delta[5] = {0, 0, 0, 0, 0};
      delta[d] = eps;
      double Rp[9], tp[3];
      perturb(R, t, delta, Rp, tp);
      residuals(Rp, tp, res_p);
      for (int j = 0; j < m; ++j) J[j * 5 + d] = (res_p[j] - res[j]) / eps;
    }
    // normal equations JtJ delta = -Jt r with LM damping
    double JtJ[25] = {0}, Jtr[5] = {0};
    for (int j = 0; j < m; ++j) {
      for (int a = 0; a < 5; ++a) {
        Jtr[a] += J[j * 5 + a] * res[j];
        for (int b = 0; b < 5; ++b) JtJ[a * 5 + b] += J[j * 5 + a] * J[j * 5 + b];
      }
    }
    bool improved = false;
    for (int attempt = 0; attempt < 6 && !improved; ++attempt) {
      double Asys[25];
      std::memcpy(Asys, JtJ, sizeof(Asys));
      for (int a = 0; a < 5; ++a) Asys[a * 5 + a] += lambda * (JtJ[a * 5 + a] + 1e-12);
      // solve 5x5 via Gaussian elimination with partial pivoting
      double rhs[5];
      for (int a = 0; a < 5; ++a) rhs[a] = -Jtr[a];
      int piv[5] = {0, 1, 2, 3, 4};
      bool ok = true;
      for (int col = 0; col < 5 && ok; ++col) {
        int p = col;
        for (int rr = col + 1; rr < 5; ++rr)
          if (std::fabs(Asys[rr * 5 + col]) > std::fabs(Asys[p * 5 + col])) p = rr;
        if (std::fabs(Asys[p * 5 + col]) < 1e-18) { ok = false; break; }
        if (p != col) {
          for (int cc = 0; cc < 5; ++cc) std::swap(Asys[p * 5 + cc], Asys[col * 5 + cc]);
          std::swap(rhs[p], rhs[col]);
        }
        for (int rr = col + 1; rr < 5; ++rr) {
          double f = Asys[rr * 5 + col] / Asys[col * 5 + col];
          for (int cc = col; cc < 5; ++cc) Asys[rr * 5 + cc] -= f * Asys[col * 5 + cc];
          rhs[rr] -= f * rhs[col];
        }
      }
      double delta[5] = {0, 0, 0, 0, 0};
      if (ok) {
        for (int rr = 4; rr >= 0; --rr) {
          double v = rhs[rr];
          for (int cc = rr + 1; cc < 5; ++cc) v -= Asys[rr * 5 + cc] * delta[cc];
          delta[rr] = v / Asys[rr * 5 + rr];
        }
      }
      double Rn[9], tn[3];
      perturb(R, t, delta, Rn, tn);
      double c = residuals(Rn, tn, res_p);
      if (ok && c < best) {
        best = c;
        std::memcpy(R, Rn, sizeof(Rn));
        std::memcpy(t, tn, sizeof(tn));
        std::memcpy(res, res_p, m * sizeof(double));
        lambda = std::max(1e-9, lambda * 0.3);
        improved = true;
      } else {
        lambda *= 10.0;
      }
    }
    if (!improved) break;
  }
  compose(R, t, model);
  delete[] res;
  delete[] res_p;
  delete[] J;
  return best;
}

}  // extern "C"
