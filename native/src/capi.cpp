// C API for ctypes bindings (colaborativempc_tpu/native/__init__.py).
// The reference exposes no C API; its native MPCC is driven only by its own
// main.cpp. Here the native stack is a first-class library twin of the JAX
// path, callable from Python for cross-validation and host-side serving.
#include <cstring>

#include "cmpc/model.h"
#include "cmpc/nl.h"
#include "cmpc/pacejka.h"
#include "cmpc/safety.h"
#include "cmpc/solver.h"

namespace cmpc {
StageQP build_lpv_qp(const Track&, const Gains&, const Limits&,
                     const ModelParams&, int, double, const double*,
                     const double*, int, const double*);
}

using namespace cmpc;

namespace {

Track make_track_from_table(int n_seg, const double* seg, double length,
                            int open_flag) {
  Track t;
  t.x0.resize(n_seg); t.y0.resize(n_seg); t.psi0.resize(n_seg);
  t.s0.resize(n_seg); t.len.resize(n_seg); t.curv.resize(n_seg);
  t.hw.resize(n_seg);
  for (int i = 0; i < n_seg; ++i) {
    t.x0[i] = seg[i * 7 + 0];
    t.y0[i] = seg[i * 7 + 1];
    t.psi0[i] = seg[i * 7 + 2];
    t.s0[i] = seg[i * 7 + 3];
    t.len[i] = seg[i * 7 + 4];
    t.curv[i] = seg[i * 7 + 5];
    t.hw[i] = seg[i * 7 + 6];
  }
  t.length = length;
  t.open = open_flag != 0;
  return t;
}

}  // namespace

extern "C" {

// Solve one LPV collaborative-MPC problem. Layouts are row-major float64.
// gains: q[9] qs[3] r[2] dr[2] wq  (17 doubles)
// limits: vx_ref min_dist max_vel min_vel max_rs max_ls max_ac max_dc sm (9)
// model: lf lr m I Cf Cr mu (7)
// Returns 1 if feasible. x_out: (N+1)*9, u_out: N*2.
int cmpc_lpv_solve_dt(int N, double dt, int n_nb, int n_seg,
                      const double* seg, double track_len, int open_flag,
                      const double* x_lin, const double* u_lin,
                      const double* x0, const double* u_old,
                      const double* neigh_xy,
                      const double* gains, const double* limits,
                      const double* model,
                      int iters, double rho, double eps,
                      double* x_out, double* u_out, double* resid_out) {
  Track trk = make_track_from_table(n_seg, seg, track_len, open_flag);
  Gains g;
  std::memcpy(g.q.data(), gains, 9 * sizeof(double));
  std::memcpy(g.qs.data(), gains + 9, 3 * sizeof(double));
  std::memcpy(g.r.data(), gains + 12, 2 * sizeof(double));
  std::memcpy(g.dr.data(), gains + 14, 2 * sizeof(double));
  g.wq = gains[16];
  Limits lim{limits[0], limits[1], limits[2], limits[3], limits[4],
             limits[5], limits[6], limits[7], limits[8]};
  ModelParams mp{model[0], model[1], model[2], model[3], model[4],
                 model[5], model[6]};

  StageQP qp = build_lpv_qp(trk, g, lim, mp, N, dt, x_lin, u_lin, n_nb,
                            neigh_xy);
  Vec z0(NZ);
  for (int i = 0; i < NX; ++i) z0[i] = x0[i];
  for (int i = 0; i < NU; ++i) z0[NX + i] = u_old[i];

  Solution sol = admm_solve(qp, z0, iters, rho, 1.6, eps);
  for (int k = 0; k <= N; ++k)
    for (int i = 0; i < NX; ++i) x_out[k * NX + i] = sol.z[k][i];
  for (int k = 0; k < N; ++k)
    for (int i = 0; i < NU; ++i) u_out[k * NU + i] = sol.z[k + 1][NX + i];
  if (resid_out) {
    resid_out[0] = sol.r_prim;
    resid_out[1] = sol.r_dual;
    resid_out[2] = static_cast<double>(sol.iterations);
  }
  return sol.feasible ? 1 : 0;
}

// Nonlinear SQP OCD sub-problem solve (planners/nl.py nl_solve twin).
// x_bar/u_bar are updated in place with the SQP iterates; master: n_nb ints.
int cmpc_nl_solve_dt(int N, double dt, int n_nb, int n_seg,
                     const double* seg, double track_len, int open_flag,
                     double* x_bar, double* u_bar,
                     const double* x0, const double* u_old,
                     const double* neigh_xy, const double* lambdas,
                     const int* master,
                     const double* gains, const double* limits,
                     const double* model,
                     int sqp_iters, double mix, int admm_iters,
                     double* resid_out) {
  Track trk = make_track_from_table(n_seg, seg, track_len, open_flag);
  NLGains g;
  std::memcpy(g.q.data(), gains, 9 * sizeof(double));
  g.qs_model = gains[9];
  g.qs_obs = gains[11];
  std::memcpy(g.r.data(), gains + 12, 2 * sizeof(double));
  std::memcpy(g.dr.data(), gains + 14, 2 * sizeof(double));
  Limits lim{limits[0], limits[1], limits[2], limits[3], limits[4],
             limits[5], limits[6], limits[7], limits[8]};
  ModelParams mp{model[0], model[1], model[2], model[3], model[4],
                 model[5], model[6]};
  Solution sol = nl_solve_native(trk, g, lim, mp, N, dt, x0, x_bar, u_bar,
                                 u_old, n_nb, neigh_xy, lambdas, master,
                                 sqp_iters, mix, admm_iters);
  if (resid_out) {
    resid_out[0] = sol.r_prim;
    resid_out[1] = sol.r_dual;
    resid_out[2] = static_cast<double>(sol.iterations);
  }
  return sol.feasible ? 1 : 0;
}

// MPCC racing solve (planners/mpcc.py mpcc_solve twin, raw variables —
// float64 needs no normalisation). x_bar/u_bar updated in place with the
// SQP iterates. gains[10]: q_progress q_contour q_heading q_vy q_wz
// r_delta r_drive dr_delta dr_drive w_soft; bounds[6]: delta_max drive_min
// drive_max trust_delta trust_drive vx_min; model[17]: m I lf lr Bf Cf Df
// Br Cr Dr Cm1 Cm2 Cr0 Cr2 p_long p_ell max_alpha.
int cmpc_mpcc_solve_dt(int N, double dt, int n_seg, const double* seg,
                       double track_len, int open_flag, double* x_bar,
                       double* u_bar, const double* x0, const double* u_old,
                       const double* gains, const double* bounds,
                       const double* model, int sqp_iters, double mix,
                       int admm_iters, double* resid_out) {
  Track trk = make_track_from_table(n_seg, seg, track_len, open_flag);
  MPCCGainsN g{gains[0], gains[1], gains[2], gains[3], gains[4],
               gains[5], gains[6], gains[7], gains[8], gains[9]};
  MPCCBoundsN b{bounds[0], bounds[1], bounds[2], bounds[3], bounds[4],
                bounds[5]};
  PacejkaParams p{model[0], model[1], model[2], model[3], model[4],
                  model[5], model[6], model[7], model[8], model[9],
                  model[10], model[11], model[12], model[13], model[14],
                  model[15], model[16]};
  Solution sol = mpcc_solve_native(trk, g, p, b, N, dt, x0, x_bar, u_bar,
                                   u_old, sqp_iters, mix, admm_iters);
  if (resid_out) {
    resid_out[0] = sol.r_prim;
    resid_out[1] = sol.r_dual;
    resid_out[2] = static_cast<double>(sol.iterations);
  }
  return sol.feasible ? 1 : 0;
}

// Closed-loop native race (runtime/racing.py run_mpcc_experiment twin /
// reference main.cpp:30-86). Returns completed steps.
int cmpc_mpcc_race(int N, double dt, int steps, int n_seg, const double* seg,
                   double track_len, int open_flag, const double* gains,
                   const double* bounds, const double* model, double v0,
                   int n_sqp, double mix, int admm_iters, double* x_hist,
                   double* u_hist, int* feasible_hist) {
  Track trk = make_track_from_table(n_seg, seg, track_len, open_flag);
  MPCCGainsN g{gains[0], gains[1], gains[2], gains[3], gains[4],
               gains[5], gains[6], gains[7], gains[8], gains[9]};
  MPCCBoundsN b{bounds[0], bounds[1], bounds[2], bounds[3], bounds[4],
                bounds[5]};
  PacejkaParams p{model[0], model[1], model[2], model[3], model[4],
                  model[5], model[6], model[7], model[8], model[9],
                  model[10], model[11], model[12], model[13], model[14],
                  model[15], model[16]};
  return mpcc_race_native(trk, g, p, b, N, dt, steps, v0, n_sqp, mix,
                          admm_iters, x_hist, u_hist, feasible_hist);
}

// RK4 plant step (validation utility).
void cmpc_step_rk4(int n_seg, const double* seg, double track_len,
                   int open_flag, double* x, const double* u, double dt,
                   const double* model) {
  Track trk = make_track_from_table(n_seg, seg, track_len, open_flag);
  ModelParams mp{model[0], model[1], model[2], model[3], model[4],
                 model[5], model[6]};
  step_rk4(trk, x, u, dt, mp);
}

// Executed-separation safety-filter betas (include/cmpc/safety.h; the
// float64 twin of runtime/simulate.py _sep_filter_beta — cross-
// validated in tests/test_native.py).
void cmpc_sep_filter(int n, const double* p0, const double* p1,
                     const double* prio, double floor_d, double* beta) {
  sep_filter_betas(n, p0, p1, prio, floor_d, beta);
}

}  // extern "C"
