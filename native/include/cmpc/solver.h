// Stage-structured QP solver: Riccati factorisation + soft-constraint ADMM
// with adaptive rho — the native (host, float64) twin of the on-device
// engine in colaborativempc_tpu/ops/{lqr,admm}.py. Native role mirrors the
// reference's in-tree C++ controller (MPCC-master/C++), built on this
// framework's algorithm instead of HPIPM.
#pragma once

#include <limits>
#include <vector>

#include "cmpc/linalg.h"

namespace cmpc {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct StageQP {
  int N = 0, nz = 0, nc = 0, m = 0;
  std::vector<Mat> F, G;        // dynamics (N)
  std::vector<Vec> d;           // affine (N)
  std::vector<Mat> Q;           // state cost (N+1)
  std::vector<Vec> q;           // (N+1)
  std::vector<Mat> R;           // control cost (N)
  std::vector<Vec> r;           // (N)
  std::vector<Mat> D, E;        // constraint rows (N)
  std::vector<Vec> lo, hi;      // bounds (N x m)
  std::vector<Vec> soft_lo, soft_hi;  // penalty weights, kInf = hard
};

struct Factors {
  std::vector<Mat> K, Lchol, Qxu;
  std::vector<Vec> m;  // P_{k+1} d_k
  bool ok = true;      // false if any Quu Cholesky failed (non-SPD)
};

struct Solution {
  std::vector<Vec> z;  // (N+1)
  std::vector<Vec> c;  // (N)
  std::vector<Vec> w, y;
  double r_prim = kInf, r_dual = kInf;
  Vec rho_scale;  // (m) per-row-class rho multipliers (ops/admm.py twin)
  int iterations = 0;
  bool feasible = false;
};

Factors lqr_factorize(const StageQP& qp, const std::vector<Mat>& Qa,
                      const std::vector<Mat>& Ra,
                      const std::vector<Mat>& Sa, double reg = 1e-10);

void lqr_affine_solve(const StageQP& qp, const Factors& fac,
                      const std::vector<Vec>& q, const std::vector<Vec>& r,
                      const Vec& z0, std::vector<Vec>* z,
                      std::vector<Vec>* c);

Solution admm_solve(const StageQP& qp, const Vec& z0, int iters = 300,
                    double rho = 10.0, double alpha = 1.6, double eps = 1e-6,
                    int epoch_len = 10, const Vec* rho_scale0 = nullptr,
                    const std::vector<Vec>* w0 = nullptr,
                    const std::vector<Vec>* y0 = nullptr);

}  // namespace cmpc
