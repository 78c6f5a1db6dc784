// Native nonlinear SQP planner with Euclidean OCD coupling — the float64
// host twin of colaborativempc_tpu/planners/nl.py (coupling="eu").
// Linearisation is by central finite differences of the Euler-discretised
// nonlinear dynamics (the JAX side uses autodiff; the reference's native
// stack hand-derives Jacobians, MPCC-master Model/model.cpp:73-160).
#include <cmath>
#include <cstring>
#include <vector>

#include "cmpc/model.h"
#include "cmpc/nl.h"
#include "cmpc/solver.h"

namespace cmpc {

static constexpr double kSoftCap = 1e4;

static void fd_step(const Track& trk, const double* x, const double* u,
                    double dt, const ModelParams& mp, double* out) {
  const double kappa = trk.curvature(x[6]);
  double f[NX];
  f_continuous(x, u, kappa, mp, f);
  for (int i = 0; i < NX; ++i) out[i] = x[i] + dt * f[i];
}

// central finite-difference (Ad, Bd, rd) around (x, u)
static void linearize_fd(const Track& trk, const double* x, const double* u,
                         double dt, const ModelParams& mp, Mat* Ad, Mat* Bd,
                         Vec* rd) {
  *Ad = Mat(NX, NX);
  *Bd = Mat(NX, NU);
  rd->assign(NX, 0.0);
  const double eps = 1e-6;
  double xp[NX], xm[NX], fp[NX], fm[NX], f0[NX];
  fd_step(trk, x, u, dt, mp, f0);
  for (int j = 0; j < NX; ++j) {
    std::memcpy(xp, x, sizeof(xp));
    std::memcpy(xm, x, sizeof(xm));
    xp[j] += eps; xm[j] -= eps;
    fd_step(trk, xp, u, dt, mp, fp);
    fd_step(trk, xm, u, dt, mp, fm);
    for (int i = 0; i < NX; ++i) (*Ad)(i, j) = (fp[i] - fm[i]) / (2 * eps);
  }
  double up[NU], um[NU];
  for (int j = 0; j < NU; ++j) {
    std::memcpy(up, u, sizeof(up));
    std::memcpy(um, u, sizeof(um));
    up[j] += eps; um[j] -= eps;
    fd_step(trk, x, up, dt, mp, fp);
    fd_step(trk, x, um, dt, mp, fm);
    for (int i = 0; i < NX; ++i) (*Bd)(i, j) = (fp[i] - fm[i]) / (2 * eps);
  }
  for (int i = 0; i < NX; ++i) {
    double s = f0[i];
    for (int j = 0; j < NX; ++j) s -= (*Ad)(i, j) * x[j];
    for (int j = 0; j < NU; ++j) s -= (*Bd)(i, j) * u[j];
    (*rd)[i] = s;
  }
}

// Build the SQP inner QP (planners/nl.py build_nl_qp, coupling="eu").
// lambdas: n_nb*N prices; neigh_xy: N*n_nb*2 stage-aligned neighbour
// positions (stages 1..N); master[i] = 1 when ego id < neighbour id.
StageQP build_nl_qp_native(const Track& trk, const NLGains& g,
                           const Limits& lim, const ModelParams& mp, int N,
                           double dt, const double* x_bar,
                           const double* u_bar, int n_nb,
                           const double* neigh_xy, const double* lambdas,
                           const int* master, double tr_d, double tr_a) {
  const int m = 4 + std::max(n_nb, 1);
  StageQP qp;
  qp.N = N; qp.nz = NZ; qp.nc = NC; qp.m = m;
  qp.F.resize(N); qp.G.resize(N); qp.d.assign(N, Vec(NZ, 0.0));
  qp.Q.assign(N + 1, Mat(NZ, NZ)); qp.q.assign(N + 1, Vec(NZ, 0.0));
  qp.R.assign(N, Mat(NC, NC)); qp.r.assign(N, Vec(NC, 0.0));
  qp.D.assign(N, Mat(m, NZ)); qp.E.assign(N, Mat(m, NC));
  qp.lo.assign(N, Vec(m, -kInf)); qp.hi.assign(N, Vec(m, kInf));
  qp.soft_lo.assign(N, Vec(m, kInf)); qp.soft_hi.assign(N, Vec(m, kInf));

  const double qs_m = std::min(g.qs_model, kSoftCap);
  const double qs_o = std::min(g.qs_obs, kSoftCap);

  for (int k = 0; k < N; ++k) {
    Mat Ad, Bd;
    Vec rd;
    linearize_fd(trk, &x_bar[k * NX], &u_bar[k * NU], dt, mp, &Ad, &Bd, &rd);
    Mat F(NZ, NZ), G(NZ, NC);
    for (int i = 0; i < NX; ++i)
      for (int j = 0; j < NX; ++j) F(i, j) = Ad(i, j);
    for (int i = 0; i < NX; ++i)
      for (int j = 0; j < NU; ++j) {
        F(i, NX + j) = Bd(i, j);
        G(i, j) = Bd(i, j);
      }
    for (int j = 0; j < NU; ++j) {
      F(NX + j, NX + j) = 1.0;
      G(NX + j, j) = 1.0;
    }
    qp.F[k] = F;
    qp.G[k] = G;
    for (int i = 0; i < NX; ++i) qp.d[k][i] = rd[i];

    Mat& Q = qp.Q[k + 1];
    for (int i = 0; i < NX; ++i) Q(i, i) = 2.0 * g.q[i];
    for (int j = 0; j < NU; ++j) Q(NX + j, NX + j) = 2.0 * g.r[j];
    qp.q[k + 1][0] = -2.0 * g.q[0] * lim.vx_ref;
    for (int j = 0; j < NU; ++j) qp.R[k](j, j) = 2.0 * g.dr[j];

    // rows composed through the dynamics see x_{k+1} - d_k: shift every
    // bound by the row's d-part
    auto set_next_row = [&](int row, int si, double scale) {
      for (int j = 0; j < NZ; ++j) qp.D[k](row, j) += scale * F(si, j);
      for (int j = 0; j < NC; ++j) qp.E[k](row, j) += scale * G(si, j);
      return scale * rd[si];
    };
    // velocity band, soft both sides
    double doff = set_next_row(0, 0, 1.0);
    qp.lo[k][0] = lim.min_vel - doff;
    qp.hi[k][0] = lim.max_vel - doff;
    qp.soft_lo[k][0] = qs_m;
    qp.soft_hi[k][0] = qs_m;
    // ey band, soft
    doff = set_next_row(1, 3, 1.0);
    const double ub = trk.halfwidth(x_bar[k * NX + 6], lim.sm);
    qp.lo[k][1] = -ub - doff;
    qp.hi[k][1] = ub - doff;
    qp.soft_lo[k][1] = qs_m;
    qp.soft_hi[k][1] = qs_m;
    // input box intersected with trust region
    qp.D[k](2, NX + 0) = 1.0; qp.E[k](2, 0) = 1.0;
    qp.lo[k][2] = std::max(-lim.max_ls, u_bar[k * NU] - tr_d);
    qp.hi[k][2] = std::min(lim.max_rs, u_bar[k * NU] + tr_d);
    qp.D[k](3, NX + 1) = 1.0; qp.E[k](3, 1) = 1.0;
    qp.lo[k][3] = std::max(-lim.max_dc, u_bar[k * NU + 1] - tr_a);
    qp.hi[k][3] = std::min(lim.max_ac, u_bar[k * NU + 1] + tr_a);

    // coupling: master price in q, slave linearised distance rows
    const double px = x_bar[(k + 1) * NX + 7];
    const double py = x_bar[(k + 1) * NX + 8];
    for (int nb = 0; nb < n_nb; ++nb) {
      const double nx = neigh_xy[((static_cast<size_t>(k) * n_nb) + nb) * 2];
      const double ny =
          neigh_xy[((static_cast<size_t>(k) * n_nb) + nb) * 2 + 1];
      double gx = px - nx, gy = py - ny;
      const double dist = std::max(std::sqrt(gx * gx + gy * gy), 1e-6);
      gx /= dist; gy /= dist;
      const int row = 4 + nb;
      if (master[nb]) {
        const double lam = lambdas[static_cast<size_t>(nb) * N + k];
        qp.q[k + 1][7] += -lam * gx;
        qp.q[k + 1][8] += -lam * gy;
      } else {
        double dofr = set_next_row(row, 7, gx);
        dofr += set_next_row(row, 8, gy);
        qp.lo[k][row] = lim.min_dist - dist + gx * px + gy * py - dofr;
        qp.soft_lo[k][row] = qs_o;
      }
    }
  }
  return qp;
}

// One OCD sub-problem solve: SQP with solution mixing.
Solution nl_solve_native(const Track& trk, const NLGains& g,
                         const Limits& lim, const ModelParams& mp, int N,
                         double dt, const double* x0, double* x_bar,
                         double* u_bar, const double* u_old, int n_nb,
                         const double* neigh_xy, const double* lambdas,
                         const int* master, int sqp_iters, double mix,
                         int admm_iters) {
  Vec z0(NZ);
  for (int i = 0; i < NX; ++i) z0[i] = x0[i];
  for (int i = 0; i < NU; ++i) z0[NX + i] = u_old[i];
  Solution sol;
  for (int it = 0; it < sqp_iters; ++it) {
    StageQP qp = build_nl_qp_native(trk, g, lim, mp, N, dt, x_bar, u_bar,
                                    n_nb, neigh_xy, lambdas, master,
                                    0.06, 0.6);
    sol = admm_solve(qp, z0, admm_iters, 10.0, 1.6, 1e-5, 10,
                     sol.rho_scale.empty() ? nullptr : &sol.rho_scale,
                     sol.w.empty() ? nullptr : &sol.w,
                     sol.y.empty() ? nullptr : &sol.y);
    for (int k = 0; k <= N; ++k)
      for (int i = 0; i < NX; ++i) {
        const double xn = sol.z[k][i];
        x_bar[k * NX + i] = mix * xn + (1.0 - mix) * x_bar[k * NX + i];
      }
    for (int k = 0; k < N; ++k)
      for (int i = 0; i < NU; ++i) {
        const double un = sol.z[k + 1][NX + i];
        u_bar[k * NU + i] = mix * un + (1.0 - mix) * u_bar[k * NU + i];
      }
  }
  return sol;
}

}  // namespace cmpc
