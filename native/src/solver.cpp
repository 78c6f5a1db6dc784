#include "cmpc/solver.h"

#include <algorithm>
#include <cmath>

namespace cmpc {

Factors lqr_factorize(const StageQP& qp, const std::vector<Mat>& Qa,
                      const std::vector<Mat>& Ra,
                      const std::vector<Mat>& Sa, double reg) {
  const int N = qp.N;
  Factors fac;
  fac.K.resize(N);
  fac.Lchol.resize(N);
  fac.Qxu.resize(N);
  fac.m.resize(N);

  Mat P = Qa[N];
  for (int k = N - 1; k >= 0; --k) {
    const Mat& F = qp.F[k];
    const Mat& G = qp.G[k];
    Mat PF = matmul(P, F);
    Mat PG = matmul(P, G);
    Mat Ft = transpose(F);
    Mat Qxx = add(Qa[k], matmul(Ft, PF));
    Mat Quu = add(Ra[k], matmul(transpose(G), PG));
    Mat Qxu = add(Sa[k], matmul(Ft, PG));
    for (int i = 0; i < Quu.r; ++i) Quu(i, i) += reg;
    // symmetrise
    for (int i = 0; i < Quu.r; ++i)
      for (int j = 0; j < i; ++j) {
        const double v = 0.5 * (Quu(i, j) + Quu(j, i));
        Quu(i, j) = Quu(j, i) = v;
      }
    Mat L = Quu;
    if (!cholesky(L)) fac.ok = false;
    Mat K = cho_solve_mat(L, transpose(Qxu));
    for (auto& v : K.d) v = -v;
    fac.m[k] = matvec(P, qp.d[k]);
    fac.K[k] = K;
    fac.Lchol[k] = L;
    fac.Qxu[k] = Qxu;
    // P = Qxx + Qxu K, symmetrised
    Mat Pn = add(Qxx, matmul(Qxu, K));
    for (int i = 0; i < Pn.r; ++i)
      for (int j = 0; j < i; ++j) {
        const double v = 0.5 * (Pn(i, j) + Pn(j, i));
        Pn(i, j) = Pn(j, i) = v;
      }
    P = Pn;
  }
  return fac;
}

void lqr_affine_solve(const StageQP& qp, const Factors& fac,
                      const std::vector<Vec>& q, const std::vector<Vec>& r,
                      const Vec& z0, std::vector<Vec>* z,
                      std::vector<Vec>* c) {
  const int N = qp.N;
  std::vector<Vec> kff(N);
  Vec p = q[N];
  for (int k = N - 1; k >= 0; --k) {
    Vec t = p;
    axpy(1.0, fac.m[k], t);
    Vec Qu = r[k];
    axpy(1.0, matvecT(qp.G[k], t), Qu);
    Vec kf = cho_solve(fac.Lchol[k], Qu);
    for (auto& v : kf) v = -v;
    kff[k] = kf;
    Vec pn = q[k];
    axpy(1.0, matvecT(qp.F[k], t), pn);
    axpy(1.0, matvec(fac.Qxu[k], kf), pn);
    p = pn;
  }
  z->assign(N + 1, Vec());
  c->assign(N, Vec());
  (*z)[0] = z0;
  for (int k = 0; k < N; ++k) {
    Vec ck = matvec(fac.K[k], (*z)[k]);
    axpy(1.0, kff[k], ck);
    (*c)[k] = ck;
    Vec zn = matvec(qp.F[k], (*z)[k]);
    axpy(1.0, matvec(qp.G[k], ck), zn);
    axpy(1.0, qp.d[k], zn);
    (*z)[k + 1] = zn;
  }
}

Solution admm_solve(const StageQP& qp, const Vec& z0, int iters, double rho,
                    double alpha, double eps, int epoch_len,
                    const Vec* rho_scale0, const std::vector<Vec>* w0,
                    const std::vector<Vec>* y0) {
  const int N = qp.N, m = qp.m;
  Solution sol;
  sol.w.assign(N, Vec(m, 0.0));
  sol.y.assign(N, Vec(m, 0.0));
  if (w0) sol.w = *w0;
  if (y0) sol.y = *y0;
  for (int k = 0; k < N; ++k)
    for (int j = 0; j < m; ++j)
      sol.w[k][j] = std::clamp(sol.w[k][j], qp.lo[k][j], qp.hi[k][j]);
  // per-row-class rho multipliers (the ops/admm.py twin: stiff soft rows
  // and plain box rows each drive their own penalty)
  sol.rho_scale = (rho_scale0 && !rho_scale0->empty()) ? *rho_scale0
                                                       : Vec(m, 1.0);
  Vec rp_row(m), rd_row(m);

  // iters rounds DOWN to whole epochs so the stated budget is a hard cap
  const int n_epochs = std::max(1, iters / epoch_len);
  std::vector<Mat> Qa(qp.N + 1), Ra(qp.N), Sa(qp.N);
  std::vector<Vec> qlin(qp.N + 1), rlin(qp.N);

  for (int ep = 0; ep < n_epochs; ++ep) {
    Vec rv(m);
    for (int row = 0; row < m; ++row) rv[row] = rho * sol.rho_scale[row];
    // augmented quadratics: Q + D' diag(rv) D, R + E' diag(rv) E,
    // S = D' diag(rv) E
    for (int k = 0; k <= qp.N; ++k) Qa[k] = qp.Q[k];
    for (int k = 0; k < qp.N; ++k) {
      Ra[k] = qp.R[k];
      Sa[k] = Mat(qp.nz, qp.nc);
      for (int row = 0; row < m; ++row) {
        for (int i = 0; i < qp.nz; ++i) {
          const double di = qp.D[k](row, i);
          if (di == 0.0) continue;
          for (int j = 0; j < qp.nz; ++j)
            Qa[k](i, j) += rv[row] * di * qp.D[k](row, j);
          for (int j = 0; j < qp.nc; ++j)
            Sa[k](i, j) += rv[row] * di * qp.E[k](row, j);
        }
        for (int i = 0; i < qp.nc; ++i) {
          const double ei = qp.E[k](row, i);
          if (ei == 0.0) continue;
          for (int j = 0; j < qp.nc; ++j)
            Ra[k](i, j) += rv[row] * ei * qp.E[k](row, j);
        }
      }
    }
    Factors fac = lqr_factorize(qp, Qa, Ra, Sa);
    if (!fac.ok) {  // non-SPD stage Hessian: report failure, don't emit NaNs
      sol.r_prim = kInf;
      sol.feasible = false;
      // keep z/c allocated so callers can index the (meaningless) result
      if (sol.z.empty()) {
        sol.z.assign(qp.N + 1, z0);
        sol.c.assign(qp.N, Vec(qp.nc, 0.0));
      }
      return sol;
    }

    std::vector<Vec> w_prev;
    for (int it = 0; it < epoch_len; ++it) {
      for (int k = 0; k <= qp.N; ++k) qlin[k] = qp.q[k];
      for (int k = 0; k < qp.N; ++k) {
        rlin[k] = qp.r[k];
        for (int row = 0; row < m; ++row) {
          const double t = rv[row] * (sol.y[k][row] - sol.w[k][row]);
          if (t == 0.0) continue;
          for (int i = 0; i < qp.nz; ++i) qlin[k][i] += qp.D[k](row, i) * t;
          for (int i = 0; i < qp.nc; ++i) rlin[k][i] += qp.E[k](row, i) * t;
        }
      }
      lqr_affine_solve(qp, fac, qlin, rlin, z0, &sol.z, &sol.c);

      w_prev = sol.w;
      std::fill(rp_row.begin(), rp_row.end(), 0.0);
      std::fill(rd_row.begin(), rd_row.end(), 0.0);
      for (int k = 0; k < qp.N; ++k) {
        for (int row = 0; row < m; ++row) {
          double v = 0.0;
          for (int i = 0; i < qp.nz; ++i)
            v += qp.D[k](row, i) * sol.z[k][i];
          for (int i = 0; i < qp.nc; ++i)
            v += qp.E[k](row, i) * sol.c[k][i];
          const double vhat = alpha * v + (1.0 - alpha) * w_prev[k][row];
          const double wbar = vhat + sol.y[k][row];
          const double lo = qp.lo[k][row], hi = qp.hi[k][row];
          double w = wbar;
          if (wbar > hi) {
            const double s = qp.soft_hi[k][row];
            const double f = std::isinf(s) ? 0.0 : rv[row] / (rv[row] + 2.0 * s);
            w = hi + f * (wbar - hi);
          } else if (wbar < lo) {
            const double s = qp.soft_lo[k][row];
            const double f = std::isinf(s) ? 0.0 : rv[row] / (rv[row] + 2.0 * s);
            w = lo + f * (wbar - lo);
          }
          sol.w[k][row] = w;
          sol.y[k][row] += vhat - w;
          rp_row[row] = std::max(rp_row[row], std::fabs(v - w));
          rd_row[row] = std::max(rd_row[row], std::fabs(w - w_prev[k][row]));
        }
      }
      ++sol.iterations;
    }
    sol.r_prim = *std::max_element(rp_row.begin(), rp_row.end());
    sol.r_dual = *std::max_element(rd_row.begin(), rd_row.end());

    if (sol.r_prim < eps && sol.r_dual < eps) break;
    // per-class rescale (classes inside tolerance keep their rho)
    Vec corr(m, 1.0);
    for (int row = 0; row < m; ++row) {
      if (rp_row[row] < eps && rd_row[row] < eps) continue;
      double ratio = std::sqrt(rp_row[row] / std::max(rd_row[row], 1e-12));
      ratio = std::clamp(ratio, 0.2, 10.0);
      const double ns = std::clamp(sol.rho_scale[row] * ratio, 1e-3, 1e6);
      corr[row] = sol.rho_scale[row] / ns;
      sol.rho_scale[row] = ns;
    }
    for (auto& yk : sol.y)
      for (int row = 0; row < m; ++row) yk[row] *= corr[row];
  }
  // tolerant acceptance matching the Python twin (feas_tol = 1e-2; see
  // CLAUDE.md invariants and ops/admm.py)
  sol.feasible = std::isfinite(sol.r_prim) && sol.r_prim < 1e-2;
  return sol;
}

}  // namespace cmpc
