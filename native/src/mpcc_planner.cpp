// Native MPCC racing planner — the float64 host twin of
// colaborativempc_tpu/planners/mpcc.py + runtime/racing.py. Mirrors the
// reference's own native contouring controller (MPCC-master/C++): SQP with
// solution mixing (mpc.cpp:198-259) over the framework's Frenet
// formulation; tire rows linearised by central finite differences (the JAX
// side uses autodiff, the reference hand-derives, constraints.cpp:57-160).
#include <cmath>
#include <cstring>
#include <vector>

#include "cmpc/model.h"
#include "cmpc/pacejka.h"
#include "cmpc/solver.h"

namespace cmpc {

namespace {

void fd_step_pacejka(const Track& trk, const double* x, const double* u,
                     double dt, const PacejkaParams& p, double* out) {
  const double kappa = trk.curvature(x[6]);
  double f[NX];
  f_pacejka(x, u, kappa, p, f);
  for (int i = 0; i < NX; ++i) out[i] = x[i] + dt * f[i];
}

// central finite-difference (Ad, Bd, rd) of the Euler step around (x, u)
void linearize_pacejka_fd(const Track& trk, const double* x, const double* u,
                          double dt, const PacejkaParams& p, Mat* Ad,
                          Mat* Bd, Vec* rd) {
  *Ad = Mat(NX, NX);
  *Bd = Mat(NX, NU);
  rd->assign(NX, 0.0);
  const double eps = 1e-6;
  double xp[NX], xm[NX], fp[NX], fm[NX], f0[NX];
  fd_step_pacejka(trk, x, u, dt, p, f0);
  for (int j = 0; j < NX; ++j) {
    std::memcpy(xp, x, sizeof(xp));
    std::memcpy(xm, x, sizeof(xm));
    xp[j] += eps; xm[j] -= eps;
    fd_step_pacejka(trk, xp, u, dt, p, fp);
    fd_step_pacejka(trk, xm, u, dt, p, fm);
    for (int i = 0; i < NX; ++i) (*Ad)(i, j) = (fp[i] - fm[i]) / (2 * eps);
  }
  double up[NU], um[NU];
  for (int j = 0; j < NU; ++j) {
    std::memcpy(up, u, sizeof(up));
    std::memcpy(um, u, sizeof(um));
    up[j] += eps; um[j] -= eps;
    fd_step_pacejka(trk, x, up, dt, p, fp);
    fd_step_pacejka(trk, x, um, dt, p, fm);
    for (int i = 0; i < NX; ++i) (*Bd)(i, j) = (fp[i] - fm[i]) / (2 * eps);
  }
  for (int i = 0; i < NX; ++i) {
    double s = f0[i];
    for (int j = 0; j < NX; ++j) s -= (*Ad)(i, j) * x[j];
    for (int j = 0; j < NU; ++j) s -= (*Bd)(i, j) * u[j];
    (*rd)[i] = s;
  }
}

// value + gradients of the 3 tire rows (friction ellipse, +/- slip angle)
void tire_rows_fd(const double* x, const double* u, const PacejkaParams& p,
                  double* vals, double* gx, double* gu) {
  auto eval = [&](const double* xx, const double* uu, double* v3) {
    v3[0] = friction_ellipse_residual(xx, uu, p);
    slip_angle_residuals(xx, uu, p, v3 + 1);
  };
  eval(x, u, vals);
  const double eps = 1e-6;
  double xp[NX], xm[NX], vp[3], vm[3];
  for (int j = 0; j < NX; ++j) {
    std::memcpy(xp, x, sizeof(xp));
    std::memcpy(xm, x, sizeof(xm));
    xp[j] += eps; xm[j] -= eps;
    eval(xp, u, vp); eval(xm, u, vm);
    for (int r = 0; r < 3; ++r) gx[r * NX + j] = (vp[r] - vm[r]) / (2 * eps);
  }
  double up[NU], um[NU];
  for (int j = 0; j < NU; ++j) {
    std::memcpy(up, u, sizeof(up));
    std::memcpy(um, u, sizeof(um));
    up[j] += eps; um[j] -= eps;
    eval(x, up, vp); eval(x, um, vm);
    for (int r = 0; r < 3; ++r) gu[r * NU + j] = (vp[r] - vm[r]) / (2 * eps);
  }
}

// Assemble the racing stage QP (planners/mpcc.py build_mpcc_qp twin).
StageQP build_mpcc_qp_native(const Track& trk, const MPCCGainsN& g,
                             const PacejkaParams& p, const MPCCBoundsN& b,
                             int N, double dt, const double* x_bar,
                             const double* u_bar) {
  const int m = 7;
  StageQP qp;
  qp.N = N; qp.nz = NZ; qp.nc = NC; qp.m = m;
  qp.F.resize(N); qp.G.resize(N); qp.d.assign(N, Vec(NZ, 0.0));
  qp.Q.assign(N + 1, Mat(NZ, NZ)); qp.q.assign(N + 1, Vec(NZ, 0.0));
  qp.R.assign(N, Mat(NC, NC)); qp.r.assign(N, Vec(NC, 0.0));
  qp.D.assign(N, Mat(m, NZ)); qp.E.assign(N, Mat(m, NC));
  qp.lo.assign(N, Vec(m, -kInf)); qp.hi.assign(N, Vec(m, kInf));
  qp.soft_lo.assign(N, Vec(m, kInf)); qp.soft_hi.assign(N, Vec(m, kInf));

  for (int k = 0; k < N; ++k) {
    Mat Ad, Bd;
    Vec rd;
    linearize_pacejka_fd(trk, &x_bar[k * NX], &u_bar[k * NU], dt, p, &Ad,
                         &Bd, &rd);
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

    // cost (planners/mpcc.py: vy/wz/ey/epsi quadratics, progress reward)
    Mat& Q = qp.Q[k + 1];
    Q(1, 1) = 2.0 * g.q_vy;
    Q(2, 2) = 2.0 * g.q_wz;
    Q(3, 3) = 2.0 * g.q_contour;
    Q(4, 4) = 2.0 * g.q_heading;
    Q(NX + 0, NX + 0) = 2.0 * g.r_delta;
    Q(NX + 1, NX + 1) = 2.0 * g.r_drive;
    qp.q[k + 1][6] = -2.0 * g.q_progress;
    qp.R[k](0, 0) = 2.0 * g.dr_delta;
    qp.R[k](1, 1) = 2.0 * g.dr_drive;

    auto set_next_row = [&](int row, int si, double scale) {
      for (int j = 0; j < NZ; ++j) qp.D[k](row, j) += scale * F(si, j);
      for (int j = 0; j < NC; ++j) qp.E[k](row, j) += scale * G(si, j);
      return scale * rd[si];
    };
    // track corridor on ey_{k+1}, soft both sides (constraints.cpp:30)
    double doff = set_next_row(0, 3, 1.0);
    const double ub = trk.halfwidth(x_bar[k * NX + 6], 0.95);
    qp.lo[k][0] = -ub - doff;
    qp.hi[k][0] = ub - doff;
    qp.soft_lo[k][0] = g.w_soft;
    qp.soft_hi[k][0] = g.w_soft;
    // input boxes with SQP trust region
    qp.D[k](1, NX + 0) = 1.0; qp.E[k](1, 0) = 1.0;
    qp.lo[k][1] = std::max(-b.delta_max, u_bar[k * NU] - b.trust_delta);
    qp.hi[k][1] = std::min(b.delta_max, u_bar[k * NU] + b.trust_delta);
    qp.D[k](2, NX + 1) = 1.0; qp.E[k](2, 1) = 1.0;
    qp.lo[k][2] = std::max(b.drive_min, u_bar[k * NU + 1] - b.trust_drive);
    qp.hi[k][2] = std::min(b.drive_max, u_bar[k * NU + 1] + b.trust_drive);
    // tire rows, linearised at (x_bar_k, u_bar_k), soft upper bound:
    // g.x + gu.u <= g.x_bar + gu.u_bar - value
    double vals[3], gx[3 * NX], gu[3 * NU];
    tire_rows_fd(&x_bar[k * NX], &u_bar[k * NU], p, vals, gx, gu);
    for (int r = 0; r < 3; ++r) {
      const int row = 3 + r;
      double bound = -vals[r];
      for (int j = 0; j < NX; ++j) {
        qp.D[k](row, j) = gx[r * NX + j];
        bound += gx[r * NX + j] * x_bar[k * NX + j];
      }
      for (int j = 0; j < NU; ++j) {
        qp.D[k](row, NX + j) = gu[r * NU + j];
        qp.E[k](row, j) = gu[r * NU + j];
        bound += gu[r * NU + j] * u_bar[k * NU + j];
      }
      qp.hi[k][row] = bound;
      qp.soft_hi[k][row] = g.w_soft;
    }
    // vx >= vx_min, soft
    doff = set_next_row(6, 0, 1.0);
    qp.lo[k][6] = b.vx_min - doff;
    qp.soft_lo[k][6] = g.w_soft;
  }
  return qp;
}

// porjectOnSpline twin (arc_length_spline.cpp:267-309 /
// geometry/spline.py project_on_spline): Newton on the squared distance
// from a warm-started s, global nearest-table-point re-seed when far.
double project_on_track(const Track& trk, double X, double Y, double s_guess,
                        double max_dist = 2.0) {
  double px, py, th;
  double s = trk.wrapped(s_guess);
  trk.global_position(s, 0.0, &px, &py, &th);
  const double d0 = std::hypot(px - X, py - Y);
  if (d0 >= max_dist) {
    double best = 1e18;
    for (size_t i = 0; i < trk.x0.size(); ++i) {
      const double d2 = (trk.x0[i] - X) * (trk.x0[i] - X) +
                        (trk.y0[i] - Y) * (trk.y0[i] - Y);
      if (d2 < best) { best = d2; s = trk.s0[i]; }
    }
  }
  for (int it = 0; it < 20; ++it) {
    trk.global_position(s, 0.0, &px, &py, &th);
    const double kappa = trk.curvature(s);
    const double dx = px - X, dy = py - Y;
    const double tx = std::cos(th), ty = std::sin(th);
    const double nx = -std::sin(th), ny = std::cos(th);
    const double jac = 2.0 * (dx * tx + dy * ty);
    double hess = 2.0 + 2.0 * kappa * (dx * nx + dy * ny);
    if (std::fabs(hess) < 1e-6) hess = hess < 0 ? -1e-6 : 1e-6;
    const double step = jac / hess;
    const double s_new = trk.wrapped(s - step);
    if (std::fabs(s_new - s) <= 1e-7) return s_new;
    s = s_new;
  }
  return s;
}

}  // namespace

Solution mpcc_solve_native(const Track& trk, const MPCCGainsN& g,
                           const PacejkaParams& p, const MPCCBoundsN& b,
                           int N, double dt, const double* x0, double* x_bar,
                           double* u_bar, const double* u_old, int sqp_iters,
                           double mix, int admm_iters) {
  Vec z0(NZ);
  for (int i = 0; i < NX; ++i) z0[i] = x0[i];
  for (int i = 0; i < NU; ++i) z0[NX + i] = u_old[i];
  Solution sol;
  for (int it = 0; it < sqp_iters; ++it) {
    StageQP qp = build_mpcc_qp_native(trk, g, p, b, N, dt, x_bar, u_bar);
    sol = admm_solve(qp, z0, admm_iters, 10.0, 1.6, 1e-5, 10,
                     sol.rho_scale.empty() ? nullptr : &sol.rho_scale,
                     sol.w.empty() ? nullptr : &sol.w,
                     sol.y.empty() ? nullptr : &sol.y);
    bool finite = true;
    for (int k = 0; k <= N && finite; ++k)
      for (int i = 0; i < NZ; ++i)
        if (!std::isfinite(sol.z[k][i])) { finite = false; break; }
    if (!finite) break;  // keep the incumbent guess (mpc.cpp:239-241)
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

int mpcc_race_native(const Track& trk, const MPCCGainsN& g,
                     const PacejkaParams& p, const MPCCBoundsN& b, int N,
                     double dt, int steps, double v0, int n_sqp, double mix,
                     int admm_iters, double* x_hist, double* u_hist,
                     int* feasible_hist) {
  // start pose on the track, cold guess along the centerline
  // (generateNewInitialGuess, mpc.cpp:175-196)
  std::vector<double> x_bar((N + 1) * NX, 0.0), u_bar(N * NU, 0.0);
  double x[NX] = {0};
  double px, py, th;
  trk.global_position(0.0, 0.0, &px, &py, &th);
  x[0] = v0; x[5] = th; x[7] = px; x[8] = py;

  auto cold_start = [&](const double* xc) {
    for (int k = 0; k <= N; ++k) {
      const double s = xc[6] + k * dt * v0;
      trk.global_position(s, 0.0, &px, &py, &th);
      double* row = &x_bar[k * NX];
      std::memset(row, 0, NX * sizeof(double));
      row[0] = v0; row[5] = th; row[6] = s; row[7] = px; row[8] = py;
    }
    std::memcpy(&x_bar[0], xc, NX * sizeof(double));
    std::fill(u_bar.begin(), u_bar.end(), 0.0);
  };

  double u_old[NU] = {0, 0};
  bool valid_guess = false;
  int t = 0;
  for (; t < steps; ++t) {
    // re-localise: projection warm-started from the previous s, result
    // re-attached to the lap count (mpc.cpp:223-224 + unwrap)
    const double s_prev = x[6];
    const double s_proj = project_on_track(trk, x[7], x[8], s_prev);
    double ds = s_proj - trk.wrapped(s_prev);
    if (!trk.open) {
      if (ds > trk.length / 2) ds -= trk.length;
      if (ds < -trk.length / 2) ds += trk.length;
    }
    x[6] = s_prev + ds;
    trk.global_position(x[6], 0.0, &px, &py, &th);
    x[3] = -(x[7] - px) * std::sin(th) + (x[8] - py) * std::cos(th);
    x[4] = std::atan2(std::sin(x[5] - th), std::cos(x[5] - th));

    if (valid_guess) {
      // shift + tail (updateInitialGuess, mpc.cpp:135-150)
      std::memmove(&x_bar[NX], &x_bar[2 * NX], (N - 1) * NX * sizeof(double));
      std::memcpy(&x_bar[0], x, NX * sizeof(double));
      double tail[NX];
      std::memcpy(tail, &x_bar[(N - 1) * NX], sizeof(tail));
      double f[NX];
      f_pacejka(tail, u_old, trk.curvature(tail[6]), p, f);
      for (int i = 0; i < NX; ++i) tail[i] += dt * f[i];
      std::memcpy(&x_bar[N * NX], tail, sizeof(tail));
      std::memmove(&u_bar[0], &u_bar[NU], (N - 1) * NU * sizeof(double));
      u_bar[(N - 1) * NU] = 0.0;
      u_bar[(N - 1) * NU + 1] = 0.0;
    } else {
      cold_start(x);
    }

    Solution sol = mpcc_solve_native(trk, g, p, b, N, dt, x, x_bar.data(),
                                     u_bar.data(), u_old, n_sqp, mix,
                                     admm_iters);
    bool finite = std::isfinite(x_bar[NX]) && std::isfinite(u_bar[0]);
    valid_guess = finite;
    feasible_hist[t] = (finite && sol.feasible) ? 1 : 0;
    u_old[0] = finite ? u_bar[0] : 0.0;
    u_old[1] = finite ? u_bar[1] : 0.0;

    step_rk4_pacejka(trk, x, u_old, dt, p);
    std::memcpy(&x_hist[t * NX], x, NX * sizeof(double));
    std::memcpy(&u_hist[t * NU], u_old, NU * sizeof(double));
    if (!std::isfinite(x[0])) break;
  }
  return t;
}

}  // namespace cmpc
