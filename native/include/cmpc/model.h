// 9-state mixed Frenet/Cartesian bicycle model + track geometry, native.
//
// Same equations as the JAX path (colaborativempc_tpu/dynamics/bicycle.py,
// geometry/frenet.py; reference provenance LPV_Planner.py:477-591,
// track_initialization.py). The track segment table is supplied by the
// caller (exported from the Python track database) — no duplicate DB.
#pragma once

#include <array>
#include <cmath>
#include <vector>

#include "cmpc/linalg.h"

namespace cmpc {

constexpr int NX = 9;
constexpr int NU = 2;
constexpr int NZ = NX + NU;  // augmented state [x; u_prev]
constexpr int NC = NU;       // stage control = du
constexpr double kLowVel = 0.2;

struct ModelParams {
  double lf = 0.125, lr = 0.125, m = 1.98, I = 0.09;
  double Cf = 70.0, Cr = 70.0, mu = 0.05;
};

struct Limits {
  double vx_ref = 3.0, min_dist = 0.25, max_vel = 5.5, min_vel = 0.0;
  double max_rs = 0.3, max_ls = 0.3, max_ac = 5.0, max_dc = 10.0, sm = 0.9;
};

struct Gains {
  std::array<double, NX> q{};
  std::array<double, 3> qs{};
  std::array<double, NU> r{};
  std::array<double, NU> dr{};
  double wq = 5.0;
};

struct Track {
  // per-segment start pose + arc-length table (lane 0)
  std::vector<double> x0, y0, psi0, s0, len, curv, hw;
  double length = 0.0;
  bool open = false;

  int segment(double s) const {
    // wrap (clamp negatives, single-lap subtraction for open tracks,
    // modulo for closed; geometry/frenet.py wrap_s)
    s = wrapped(s);
    int lo = 0, hi = static_cast<int>(s0.size()) - 1;
    while (lo < hi) {  // last segment with s0 <= s
      int mid = (lo + hi + 1) / 2;
      if (s0[mid] <= s) lo = mid; else hi = mid - 1;
    }
    return lo;
  }

  double wrapped(double s) const {
    if (s < 0) return 0.0;
    if (open) return s >= length ? s - length : s;
    return std::fmod(s, length);
  }

  double curvature(double s) const { return curv[segment(s)]; }
  double halfwidth(double s, double sm = 1.0) const {
    return hw[segment(s)] * sm;
  }

  void global_position(double s, double ey, double* X, double* Y,
                       double* theta) const {
    const double sw = wrapped(s);
    const int i = segment(s);
    const double ds = sw - s0[i];
    const double psi = psi0[i];
    const double k = curv[i];
    const double th = psi + k * ds;
    if (std::fabs(k) < 1e-8) {
      *X = x0[i] + ds * std::cos(psi) - ey * std::sin(psi);
      *Y = y0[i] + ds * std::sin(psi) + ey * std::cos(psi);
    } else {
      const double rho = 1.0 / k;
      *X = x0[i] + rho * (std::sin(th) - std::sin(psi)) - ey * std::sin(th);
      *Y = y0[i] + rho * (std::cos(psi) - std::cos(th)) + ey * std::cos(th);
    }
    *theta = th;
  }
};

// Continuous-time LPV matrices: f(x, u) == A(x) x + B(x) u exactly.
inline void lpv_matrices(const double* x, const double* u, double kappa,
                         const ModelParams& p, Mat* A, Mat* B) {
  const double vx = x[0], vy = x[1], ey = x[3], epsi = x[4], theta = x[5];
  const double delta = u[0];
  const bool low = vx < kLowVel;
  const double vxs = low ? 1.0 : vx;
  const double sd = std::sin(delta), cd = std::cos(delta);
  const double se = std::sin(epsi), ce = std::cos(epsi);
  const double st = std::sin(theta), ct = std::cos(theta);
  const double den = 1.0 - ey * kappa;
  auto gate = [low](double v) { return low ? 0.0 : v; };

  *A = Mat(NX, NX);
  *B = Mat(NX, NU);
  Mat& a = *A;
  Mat& b = *B;
  a(0, 0) = -p.mu;
  a(0, 1) = gate(sd * p.Cf / (p.m * vxs));
  a(0, 2) = gate(sd * p.Cf * p.lf / (p.m * vxs) + vy);
  a(1, 1) = gate(-(p.Cr + p.Cf * cd) / (p.m * vxs));
  a(1, 2) = gate(-(p.lf * p.Cf * cd - p.lr * p.Cr) / (p.m * vxs) - vx);
  a(2, 1) = gate(-(p.lf * p.Cf * cd - p.lr * p.Cr) / (p.I * vxs));
  a(2, 2) = gate(-(p.lf * p.lf * p.Cf * cd + p.lr * p.lr * p.Cr) /
                 (p.I * vxs));
  a(3, 0) = se;  a(3, 1) = ce;
  a(4, 0) = -ce * kappa / den;  a(4, 1) = se * kappa / den;  a(4, 2) = 1.0;
  a(5, 2) = 1.0;
  a(6, 0) = ce / den;  a(6, 1) = -se / den;
  a(7, 0) = ct;  a(7, 1) = -st;
  a(8, 0) = st;  a(8, 1) = ct;
  b(0, 0) = gate(-sd * p.Cf / p.m);  b(0, 1) = 1.0;
  b(1, 0) = cd * p.Cf / p.m;
  b(2, 0) = p.lf * p.Cf * cd / p.I;
}

inline void f_continuous(const double* x, const double* u, double kappa,
                         const ModelParams& p, double* out) {
  Mat A, B;
  lpv_matrices(x, u, kappa, p, &A, &B);
  for (int i = 0; i < NX; ++i) {
    double s = 0.0;
    for (int j = 0; j < NX; ++j) s += A(i, j) * x[j];
    for (int j = 0; j < NU; ++j) s += B(i, j) * u[j];
    out[i] = s;
  }
}

inline void step_rk4(const Track& trk, double* x, const double* u, double dt,
                     const ModelParams& p) {
  const double kappa = trk.curvature(x[6]);
  double k1[NX], k2[NX], k3[NX], k4[NX], tmp[NX];
  f_continuous(x, u, kappa, p, k1);
  for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * dt * k1[i];
  f_continuous(tmp, u, kappa, p, k2);
  for (int i = 0; i < NX; ++i) tmp[i] = x[i] + 0.5 * dt * k2[i];
  f_continuous(tmp, u, kappa, p, k3);
  for (int i = 0; i < NX; ++i) tmp[i] = x[i] + dt * k3[i];
  f_continuous(tmp, u, kappa, p, k4);
  for (int i = 0; i < NX; ++i)
    x[i] += dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
}

}  // namespace cmpc
