// Native LPV collaborative-MPC planner assembly — the float64 host twin of
// colaborativempc_tpu/planners/lpv.py (reference provenance
// LPV_Planner.py:115-475). Shares the exact stage-row layout with the JAX
// path so the two implementations cross-validate each other.
#include <cmath>
#include <cstring>

#include "cmpc/model.h"
#include "cmpc/solver.h"

namespace cmpc {

static constexpr double kSoftCap = 1e4;  // planners/lpv.py SOFT_WEIGHT_CAP

struct PlaneSet {
  // (N, n_nb, 3): a_x, a_y, b  and separation weights (N, n_nb)
  std::vector<double> abc;
  std::vector<double> w;
};

static PlaneSet compute_planes(int N, int n_nb, const double* ego_xy,
                               const double* neigh_xy, double min_dist) {
  // geometry/planes.py compute_hyperplanes(keep_sign) + separation_weights.
  // ego_xy/neigh_xy carry N+1 stage rows; planes use stages 0..N-1
  // (LPV_Planner.py:138 via compute_hyperplane) and weights use stages
  // 1..N (misc.py:10-18 operates on pose[1:]), matching the JAX path.
  PlaneSet out;
  out.abc.assign(static_cast<size_t>(N) * n_nb * 3, 0.0);
  out.w.assign(static_cast<size_t>(N) * n_nb, 0.0);
  for (int k = 0; k < N; ++k) {
    for (int nb = 0; nb < n_nb; ++nb) {
      const double ex = ego_xy[2 * k], ey = ego_xy[2 * k + 1];
      const double nx = neigh_xy[((k * n_nb) + nb) * 2];
      const double ny = neigh_xy[((k * n_nb) + nb) * 2 + 1];
      double ax = nx - ex, ay = ny - ey;
      const double norm = std::max(std::sqrt(ax * ax + ay * ay), 1e-9);
      ax /= norm; ay /= norm;
      const double b = -0.5 * (ax * (ex + nx) + ay * (ey + ny));
      double* row = &out.abc[((static_cast<size_t>(k) * n_nb) + nb) * 3];
      row[0] = ax; row[1] = ay; row[2] = b;
      const double e1x = ego_xy[2 * (k + 1)], e1y = ego_xy[2 * (k + 1) + 1];
      const double n1x = neigh_xy[(((k + 1) * n_nb) + nb) * 2];
      const double n1y = neigh_xy[(((k + 1) * n_nb) + nb) * 2 + 1];
      const double dist1 = std::max(
          std::sqrt((e1x - n1x) * (e1x - n1x) + (e1y - n1y) * (e1y - n1y)),
          1e-9);
      out.w[static_cast<size_t>(k) * n_nb + nb] =
          (2.0 * min_dist - dist1) / n_nb;
    }
  }
  return out;
}

StageQP build_lpv_qp(const Track& trk, const Gains& g, const Limits& lim,
                     const ModelParams& mp, int N, double dt,
                     const double* x_lin, const double* u_lin,
                     int n_nb, const double* neigh_xy) {
  const int m = 4 + std::max(n_nb, 1);
  StageQP qp;
  qp.N = N; qp.nz = NZ; qp.nc = NC; qp.m = m;
  qp.F.resize(N); qp.G.resize(N); qp.d.assign(N, Vec(NZ, 0.0));
  qp.Q.assign(N + 1, Mat(NZ, NZ)); qp.q.assign(N + 1, Vec(NZ, 0.0));
  qp.R.assign(N, Mat(NC, NC)); qp.r.assign(N, Vec(NC, 0.0));
  qp.D.assign(N, Mat(m, NZ)); qp.E.assign(N, Mat(m, NC));
  qp.lo.assign(N, Vec(m, -kInf)); qp.hi.assign(N, Vec(m, kInf));
  qp.soft_lo.assign(N, Vec(m, kInf)); qp.soft_hi.assign(N, Vec(m, kInf));

  const double qs0 = std::min(g.qs[0], kSoftCap);
  const double qs1 = std::min(g.qs[1], kSoftCap);
  const double qs2 = std::min(g.qs[2], kSoftCap);

  PlaneSet planes;
  std::vector<double> ego_xy(static_cast<size_t>(N + 1) * 2);
  if (n_nb > 0) {
    for (int k = 0; k <= N; ++k) {
      ego_xy[2 * k] = x_lin[k * NX + 7];
      ego_xy[2 * k + 1] = x_lin[k * NX + 8];
    }
    planes = compute_planes(N, n_nb, ego_xy.data(), neigh_xy, lim.min_dist);
  }

  for (int k = 0; k < N; ++k) {
    Mat A, B;
    const double kappa = trk.curvature(x_lin[k * NX + 6]);
    lpv_matrices(&x_lin[k * NX], &u_lin[k * NU], kappa, mp, &A, &B);
    Mat F(NZ, NZ), G(NZ, NC);
    for (int i = 0; i < NX; ++i)
      for (int j = 0; j < NX; ++j)
        F(i, j) = (i == j ? 1.0 : 0.0) + dt * A(i, j);
    for (int i = 0; i < NX; ++i)
      for (int j = 0; j < NU; ++j) {
        F(i, NX + j) = dt * B(i, j);
        G(i, j) = dt * B(i, j);
      }
    for (int j = 0; j < NU; ++j) {
      F(NX + j, NX + j) = 1.0;
      G(NX + j, j) = 1.0;
    }
    qp.F[k] = F;
    qp.G[k] = G;

    // cost (stage k+1 states; planners/lpv.py build_lpv_qp)
    Mat& Q = qp.Q[k + 1];
    for (int i = 0; i < NX; ++i) Q(i, i) = 2.0 * g.q[i];
    for (int j = 0; j < NU; ++j) Q(NX + j, NX + j) = 2.0 * g.r[j];
    qp.q[k + 1][0] = -2.0 * g.q[0] * lim.vx_ref;
    Mat& R = qp.R[k];
    for (int j = 0; j < NU; ++j) R(j, j) = 2.0 * g.dr[j];

    // constraint rows on x_{k+1} composed through the dynamics
    auto set_next_row = [&](int row, int state_idx, double scale) {
      for (int j = 0; j < NZ; ++j)
        qp.D[k](row, j) += scale * F(state_idx, j);
      for (int j = 0; j < NC; ++j)
        qp.E[k](row, j) += scale * G(state_idx, j);
    };
    // velocity: hard lower, soft upper
    set_next_row(0, 0, 1.0);
    qp.lo[k][0] = lim.min_vel;
    qp.hi[k][0] = lim.max_vel;
    qp.soft_hi[k][0] = qs0;
    // lateral band, soft both sides
    set_next_row(1, 3, 1.0);
    const double ub = trk.halfwidth(x_lin[k * NX + 6], lim.sm);
    qp.lo[k][1] = -ub;
    qp.hi[k][1] = ub;
    qp.soft_lo[k][1] = qs1;
    qp.soft_hi[k][1] = qs1;
    // input box (hard)
    qp.D[k](2, NX + 0) = 1.0;
    qp.E[k](2, 0) = 1.0;
    qp.lo[k][2] = -lim.max_ls;
    qp.hi[k][2] = lim.max_rs;
    qp.D[k](3, NX + 1) = 1.0;
    qp.E[k](3, 1) = 1.0;
    qp.lo[k][3] = -lim.max_dc;
    qp.hi[k][3] = lim.max_ac;
    // plane rows + separation reward
    for (int nb = 0; nb < n_nb; ++nb) {
      const double* pl = &planes.abc[((static_cast<size_t>(k) * n_nb)
                                      + nb) * 3];
      const int row = 4 + nb;
      set_next_row(row, 7, pl[0]);
      set_next_row(row, 8, pl[1]);
      qp.hi[k][row] = -lim.min_dist / 2.0 - pl[2];
      qp.soft_hi[k][row] = qs2;
      const double wk = planes.w[static_cast<size_t>(k) * n_nb + nb];
      qp.q[k + 1][7] += 2.0 * g.wq * wk * pl[0];
      qp.q[k + 1][8] += 2.0 * g.wq * wk * pl[1];
    }
  }
  return qp;
}

}  // namespace cmpc
