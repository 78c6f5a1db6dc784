// Nonlinear SQP planner with OCD coupling (native twin of planners/nl.py).
#pragma once

#include <array>

#include "cmpc/model.h"
#include "cmpc/solver.h"

namespace cmpc {

struct NLGains {
  std::array<double, NX> q{};
  double qs_model = 1e4, qs_obs = 1e4;
  std::array<double, NU> r{};
  std::array<double, NU> dr{};
};

StageQP build_nl_qp_native(const Track& trk, const NLGains& g,
                           const Limits& lim, const ModelParams& mp, int N,
                           double dt, const double* x_bar,
                           const double* u_bar, int n_nb,
                           const double* neigh_xy, const double* lambdas,
                           const int* master, double tr_d, double tr_a);

Solution nl_solve_native(const Track& trk, const NLGains& g,
                         const Limits& lim, const ModelParams& mp, int N,
                         double dt, const double* x0, double* x_bar,
                         double* u_bar, const double* u_old, int n_nb,
                         const double* neigh_xy, const double* lambdas,
                         const int* master, int sqp_iters, double mix,
                         int admm_iters);

}  // namespace cmpc
