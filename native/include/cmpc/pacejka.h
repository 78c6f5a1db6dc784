// Dynamic bicycle with Pacejka magic-formula tires — the float64 host twin
// of colaborativempc_tpu/dynamics/pacejka.py (reference provenance:
// MPCC-master/C++/Model/model.cpp:42-71, Constraints/constraints.cpp:57,117).
// State layout matches the framework: [vx, vy, wz, ey, epsi, theta, s, X, Y];
// input [delta, D] (drivetrain duty).
#pragma once

#include <cmath>

#include "cmpc/model.h"
#include "cmpc/solver.h"

namespace cmpc {

struct PacejkaParams {
  double m = 0.041, I = 27.8e-6, lf = 0.029, lr = 0.033;
  double Bf = 2.579, Cf = 1.2, Df = 0.192;
  double Br = 3.3852, Cr = 1.2691, Dr = 0.1737;
  double Cm1 = 0.287, Cm2 = 0.0545, Cr0 = 0.0518, Cr2 = 0.00035;
  double p_long = 0.9, p_ell = 0.95, max_alpha = 0.6;
};

inline void slip_angles(const double* x, const double* u,
                        const PacejkaParams& p, double* af, double* ar) {
  const double vx = std::max(x[0], 0.3);  // vxNonZero guard (types.h:62-83)
  *af = -std::atan2(x[1] + p.lf * x[2], vx) + u[0];
  *ar = -std::atan2(x[1] - p.lr * x[2], vx);
}

inline void tire_forces(const double* x, const double* u,
                        const PacejkaParams& p, double* F_fy, double* F_ry,
                        double* F_rx) {
  double af, ar;
  slip_angles(x, u, p, &af, &ar);
  *F_fy = p.Df * std::sin(p.Cf * std::atan(p.Bf * af));
  *F_ry = p.Dr * std::sin(p.Cr * std::atan(p.Br * ar));
  *F_rx = p.Cm1 * u[1] - p.Cm2 * u[1] * x[0] - p.Cr0 - p.Cr2 * x[0] * x[0];
}

inline void f_pacejka(const double* x, const double* u, double kappa,
                      const PacejkaParams& p, double* out) {
  const double vx = x[0], vy = x[1], wz = x[2];
  const double ey = x[3], epsi = x[4], theta = x[5];
  const double delta = u[0];
  double F_fy, F_ry, F_rx;
  tire_forces(x, u, p, &F_fy, &F_ry, &F_rx);
  const double se = std::sin(epsi), ce = std::cos(epsi);
  const double st = std::sin(theta), ct = std::cos(theta);
  const double den = 1.0 - ey * kappa;
  out[0] = (F_rx - F_fy * std::sin(delta) + p.m * vy * wz) / p.m;
  out[1] = (F_ry + F_fy * std::cos(delta) - p.m * vx * wz) / p.m;
  out[2] = (F_fy * p.lf * std::cos(delta) - F_ry * p.lr) / p.I;
  out[3] = se * vx + ce * vy;
  out[4] = (-ce * kappa / den) * vx + (se * kappa / den) * vy + wz;
  out[5] = wz;
  out[6] = (ce / den) * vx + (-se / den) * vy;
  out[7] = ct * vx - st * vy;
  out[8] = st * vx + ct * vy;
}

// feasible when <= 0 (constraints.cpp:57)
inline double friction_ellipse_residual(const double* x, const double* u,
                                        const PacejkaParams& p) {
  double F_fy, F_ry, F_rx;
  tire_forces(x, u, p, &F_fy, &F_ry, &F_rx);
  return (p.p_long * F_rx) * (p.p_long * F_rx) + F_ry * F_ry -
         (p.p_ell * p.Dr) * (p.p_ell * p.Dr);
}

// both <= 0 when feasible (constraints.cpp:117)
inline void slip_angle_residuals(const double* x, const double* u,
                                 const PacejkaParams& p, double* out) {
  double af, ar;
  slip_angles(x, u, p, &af, &ar);
  out[0] = af - p.max_alpha;
  out[1] = -p.max_alpha - af;
}

// RK4 plant sub-stepping (Integrator::simTimeStep, integrator.cpp:55-68)
inline void step_rk4_pacejka(const Track& trk, double* x, const double* u,
                             double dt, const PacejkaParams& p,
                             int substeps = 4) {
  const double h = dt / substeps;
  double k1[NX], k2[NX], k3[NX], k4[NX], tmp[NX];
  for (int s = 0; s < substeps; ++s) {
    f_pacejka(x, u, trk.curvature(x[6]), p, k1);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * h * k1[i];
    f_pacejka(tmp, u, trk.curvature(tmp[6]), p, k2);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * h * k2[i];
    f_pacejka(tmp, u, trk.curvature(tmp[6]), p, k3);
    for (int i = 0; i < NX; ++i) tmp[i] = x[i] + h * k3[i];
    f_pacejka(tmp, u, trk.curvature(tmp[6]), p, k4);
    for (int i = 0; i < NX; ++i)
      x[i] += h / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
  }
}

struct MPCCGainsN {
  double q_progress = 1.0, q_contour = 50.0, q_heading = 5.0;
  double q_vy = 0.1, q_wz = 0.1;
  double r_delta = 0.1, r_drive = 0.1;
  double dr_delta = 5.0, dr_drive = 5.0;
  double w_soft = 1e4;
};

struct MPCCBoundsN {
  double delta_max = 0.35, drive_min = -0.1, drive_max = 1.0;
  double trust_delta = 0.08, trust_drive = 0.3, vx_min = 0.05;
};

Solution mpcc_solve_native(const Track& trk, const MPCCGainsN& g,
                           const PacejkaParams& p, const MPCCBoundsN& b,
                           int N, double dt, const double* x0, double* x_bar,
                           double* u_bar, const double* u_old, int sqp_iters,
                           double mix, int admm_iters);

// Closed-loop race (mpc.cpp runMPC + main.cpp loop): fills x_hist
// (steps*NX) and u_hist (steps*NU); returns completed steps.
int mpcc_race_native(const Track& trk, const MPCCGainsN& g,
                     const PacejkaParams& p, const MPCCBoundsN& b, int N,
                     double dt, int steps, double v0, int n_sqp, double mix,
                     int admm_iters, double* x_hist, double* u_hist,
                     int* feasible_hist);

}  // namespace cmpc
