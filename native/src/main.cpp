// Closed-loop native simulation binary (the framework's analogue of the
// reference's C++ MPCC entry point, MPCC-master/C++/main.cpp:30-86):
// loads a track table CSV exported by Python, runs the single/multi-agent
// collaborative MPC closed loop, reports mean/max solve times.
//
// Usage: cmpc_sim <track.csv> [n_agents=3] [N=20] [steps=100] [dt=0.02]
//        [admm_iters=600] [nl]
//
// Default mode drives the decentralised LPV loop (one exchange + one QP per
// agent per step, reference LPV_HP_N_main.py); the trailing "nl" token
// switches to the nonlinear SQP planners under the full OCD dual
// coordination loop (reference NL_EU_N_main.py:100-168 — projected dual
// ascent, trajectory-change convergence test, iteration caps), the native
// twin of runtime/ocd.py.
//
// track.csv rows: x0 y0 psi0 s0 len curv hw ; last line: "length <L> <open>"
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

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

static bool load_track(const char* path, Track* t) {
  std::ifstream in(path);
  if (!in) return false;
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::string first;
    ss >> first;
    if (first == "length") {
      int open = 0;
      ss >> t->length >> open;
      t->open = open != 0;
    } else if (!first.empty() && first[0] != '#') {
      double x0 = std::stod(first), y0, psi0, s0, len, curv, hw;
      ss >> y0 >> psi0 >> s0 >> len >> curv >> hw;
      t->x0.push_back(x0); t->y0.push_back(y0); t->psi0.push_back(psi0);
      t->s0.push_back(s0); t->len.push_back(len); t->curv.push_back(curv);
      t->hw.push_back(hw);
    }
  }
  return !t->x0.empty() && t->length > 0;
}

// Full OCD coordination closed loop on the nonlinear SQP planners — the
// native twin of runtime/ocd.py make_nl_ocd_step/run_nl_experiment
// (reference NL_EU_N_main.py:100-168). Returns the process exit code.
static int run_nl_ocd(const Track& trk, int n_agents, int N, int steps,
                      double dt, int admm_iters,
                      std::vector<std::vector<double>>& x_pred,
                      std::vector<std::vector<double>>& u_pred,
                      std::vector<std::vector<double>>& x0,
                      std::vector<std::vector<double>>& u_old) {
  NLGains g;
  g.q = {25.0, 0, 0, 200.0, 10.0, 0, 0, 0, 0};
  g.qs_model = 1e7;  // capped inside build_nl_qp_native
  g.qs_obs = 1e7;
  g.r = {15.0, 15.0};
  g.dr = {600.0, 200.0};
  Limits lim;
  ModelParams mp;
  const int n_nb = std::max(n_agents - 1, 0);
  // OCD knobs (reference config_NL.py / OCDConfig defaults)
  const double alpha = 0.25, atol = 0.01;
  const int it_conv = 2, min_it_ocd = 2, max_it_ocd = 30;

  // lam[i][j*N + k]: price master i (<j) charges pair (i, j) at stage k,
  // projected onto [0, inf) (OCDConfig.lambda_lo rationale)
  std::vector<std::vector<double>> lam(
      n_agents, std::vector<double>(static_cast<size_t>(n_agents) * N, 0.0));

  double total = 0.0, worst = 0.0;
  long total_ocd = 0;
  int n_solves = 0;
  bool all_ok = true;
  std::vector<std::vector<double>> x0_exec_nl(
      n_agents, std::vector<double>(NX, 0.0));
  for (int it = 0; it < steps; ++it) {
    std::vector<std::vector<double>> x_old = x_pred;
    int it_ocd = 0, conv_count = 0;
    bool finished = false;
    while (!(it_ocd > min_it_ocd && finished)) {
      // exchange: stage-aligned neighbour plans (stages 1..N)
      std::vector<std::vector<double>> prev = x_pred;
      for (int a = 0; a < n_agents; ++a) {
        std::vector<double> neigh(static_cast<size_t>(N) * n_nb * 2);
        std::vector<double> lam_a(static_cast<size_t>(n_nb) * N);
        std::vector<int> master(std::max(n_nb, 1), 0);
        int c = 0;
        for (int b = 0; b < n_agents; ++b) {
          if (b == a) continue;
          for (int k = 0; k < N; ++k) {
            neigh[(static_cast<size_t>(k) * n_nb + c) * 2] =
                prev[b][(k + 1) * NX + 7];
            neigh[(static_cast<size_t>(k) * n_nb + c) * 2 + 1] =
                prev[b][(k + 1) * NX + 8];
            lam_a[static_cast<size_t>(c) * N + k] =
                lam[std::min(a, b)][static_cast<size_t>(std::max(a, b)) * N
                                    + k];
          }
          master[c] = a < b ? 1 : 0;
          ++c;
        }
        const auto t0 = std::chrono::steady_clock::now();
        Solution sol = nl_solve_native(
            trk, g, lim, mp, N, dt, x0[a].data(), x_pred[a].data(),
            u_pred[a].data(), u_old[a].data(), n_nb,
            n_nb ? neigh.data() : nullptr, lam_a.data(), master.data(),
            /*sqp_iters=*/2, /*mix=*/0.7, admm_iters);
        const double ms = std::chrono::duration<double, std::milli>(
                              std::chrono::steady_clock::now() - t0)
                              .count();
        total += ms; worst = std::max(worst, ms); ++n_solves;
        all_ok = all_ok && sol.feasible;
      }

      // projected dual ascent on master pairs i < j
      // (NL_EU_N_main.py:130-139 + runtime/ocd.py _dual_step)
      for (int i = 0; i < n_agents; ++i)
        for (int j = i + 1; j < n_agents; ++j)
          for (int k = 0; k < N; ++k) {
            const double dx = x_pred[i][(k + 1) * NX + 7]
                              - x_pred[j][(k + 1) * NX + 7];
            const double dy = x_pred[i][(k + 1) * NX + 8]
                              - x_pred[j][(k + 1) * NX + 8];
            const double dist = std::sqrt(dx * dx + dy * dy + 1e-9);
            double& l = lam[i][static_cast<size_t>(j) * N + k];
            l = std::max(0.0, l + alpha * (lim.min_dist - dist));
          }

      // trajectory-change convergence test (NL_EU_N_main.py:141-157)
      double delta = 0.0;
      for (int a = 0; a < n_agents; ++a)
        for (size_t q = 0; q < x_pred[a].size(); ++q)
          delta = std::max(delta, std::fabs(x_pred[a][q] - prev[a][q]));
      conv_count = delta < atol ? conv_count + 1 : 0;
      finished = conv_count > it_conv || it_ocd >= max_it_ocd;
      ++it_ocd;
    }
    total_ocd += it_ocd;

    // track-limits wall, then the executed-separation safety filter on
    // the applied x0-shift (runtime/simulate.py ordering;
    // include/cmpc/safety.h)
    for (int a = 0; a < n_agents; ++a) {
      std::memcpy(x0_exec_nl[a].data(), &x_pred[a][NX],
                  NX * sizeof(double));
      lateral_wall_exec(trk, 2.0, x0[a].data(), x0_exec_nl[a].data(), dt);
    }
    if (n_agents > 1) {
      std::vector<double> p0(2 * n_agents), p1(2 * n_agents);
      std::vector<double> prio(n_agents), beta(n_agents);
      for (int a = 0; a < n_agents; ++a) {
        p0[2 * a] = x0[a][7];
        p0[2 * a + 1] = x0[a][8];
        p1[2 * a] = x0_exec_nl[a][7];
        p1[2 * a + 1] = x0_exec_nl[a][8];
        prio[a] = x0[a][6];
      }
      sep_filter_betas(n_agents, p0.data(), p1.data(), prio.data(),
                       0.7 * lim.min_dist, beta.data());
      for (int a = 0; a < n_agents; ++a)
        if (beta[a] < 1.0) {
          for (int i = 0; i < NX; ++i)
            x0_exec_nl[a][i] = x0[a][i]
                + beta[a] * (x0_exec_nl[a][i] - x0[a][i]);
          // truthful brake: realized speed ~ beta * planned speed
          // (runtime/simulate.py _apply_exec_beta)
          for (int i = 0; i < 3; ++i) x0_exec_nl[a][i] *= beta[a];
        }
    }

    // control-step shift (NL_EU_N_main.py:170-172)
    for (int a = 0; a < n_agents; ++a) {
      std::memcpy(x0[a].data(), x0_exec_nl[a].data(),
                  NX * sizeof(double));
      u_old[a][0] = u_pred[a][0];
      u_old[a][1] = u_pred[a][1];
      std::memmove(&x_pred[a][0], &x_pred[a][NX],
                   static_cast<size_t>(N) * NX * sizeof(double));
      std::memmove(&u_pred[a][0], &u_pred[a][NU],
                   static_cast<size_t>(N - 1) * NU * sizeof(double));
    }
  }

  double min_s = 1e9, min_dist = 1e9;
  for (int a = 0; a < n_agents; ++a) min_s = std::min(min_s, x0[a][6]);
  for (int i = 0; i < n_agents; ++i)
    for (int j = i + 1; j < n_agents; ++j) {
      const double dx = x0[i][7] - x0[j][7], dy = x0[i][8] - x0[j][8];
      min_dist = std::min(min_dist, std::sqrt(dx * dx + dy * dy));
    }
  std::printf(
      "steps=%d agents=%d N=%d feasible=%d min_final_s=%.2f "
      "final_min_dist=%.3f mean_ocd_it=%.2f\n",
      steps, n_agents, N, all_ok ? 1 : 0, min_s,
      n_agents > 1 ? min_dist : 0.0,
      static_cast<double>(total_ocd) / steps);
  std::printf("solve time: mean %.3f ms, max %.3f ms (%d solves)\n",
              total / n_solves, worst, n_solves);
  return all_ok ? 0 : 1;
}

// Single-agent MPCC racing closed loop (the reference's own native entry,
// MPCC-master/C++/main.cpp:30-86): cold/warm start driver + RK4 plant.
static int run_mpcc(const Track& trk, int N, int steps, double dt,
                    int admm_iters) {
  MPCCGainsN g;
  MPCCBoundsN b;
  PacejkaParams p;
  std::vector<double> x_hist(static_cast<size_t>(steps) * NX);
  std::vector<double> u_hist(static_cast<size_t>(steps) * NU);
  std::vector<int> feas(steps, 0);
  const auto t0 = std::chrono::steady_clock::now();
  const int t = mpcc_race_native(trk, g, p, b, N, dt, steps, 0.5, 3, 0.7,
                                 admm_iters, x_hist.data(), u_hist.data(),
                                 feas.data());
  const double ms = std::chrono::duration<double, std::milli>(
      std::chrono::steady_clock::now() - t0).count();
  int n_ok = 0;
  double vmax = 0.0, eymax = 0.0;
  for (int k = 0; k < t; ++k) {
    n_ok += feas[k];
    vmax = std::max(vmax, x_hist[static_cast<size_t>(k) * NX]);
    eymax = std::max(eymax, std::fabs(x_hist[static_cast<size_t>(k) * NX + 3]));
  }
  std::printf("mpcc: steps=%d s_final=%.2f vx_max=%.2f |ey|max=%.3f "
              "feasible=%d/%d\n",
              t, t ? x_hist[static_cast<size_t>(t - 1) * NX + 6] : 0.0, vmax,
              eymax, n_ok, t);
  std::printf("solve time: mean %.3f ms (%d steps)\n", ms / std::max(t, 1),
              t);
  return (t == steps && n_ok == t) ? 0 : 1;
}

int main(int argc, char** argv) {
  bool nl_mode = false;
  bool mpcc_mode = false;
  std::vector<const char*> pos;
  for (int i = 1; i < argc; ++i) {
    if (std::strcmp(argv[i], "nl") == 0) nl_mode = true;
    else if (std::strcmp(argv[i], "mpcc") == 0) mpcc_mode = true;
    else pos.push_back(argv[i]);
  }
  if (pos.empty()) {
    std::fprintf(stderr,
                 "usage: %s <track.csv> [n_agents] [N] [steps] [dt] "
                 "[admm_iters] [nl|mpcc]\n",
                 argv[0]);
    return 2;
  }
  Track trk;
  if (!load_track(pos[0], &trk)) {
    std::fprintf(stderr, "failed to load track %s\n", pos[0]);
    return 2;
  }
  const int n_agents = pos.size() > 1 ? std::atoi(pos[1]) : 3;
  const int N = pos.size() > 2 ? std::atoi(pos[2]) : 20;
  const int steps = pos.size() > 3 ? std::atoi(pos[3]) : 100;
  const double dt = pos.size() > 4 ? std::atof(pos[4]) : 0.02;
  const int admm_iters = pos.size() > 5 ? std::atoi(pos[5]) : 600;
  const int n_nb = n_agents - 1;

  if (mpcc_mode) return run_mpcc(trk, N, steps, dt, admm_iters);

  Gains g;
  g.q = {10.0, 0, 0, 25.0, 10.0, 0, 0, 0, 0};
  g.qs = {1e7, 1e7, 1e7};
  g.r = {0, 0};
  g.dr = {50.0, 50.0};
  g.wq = 5.0;
  Limits lim;
  ModelParams mp;

  // warm start: constant-accel rollout (utils/warmstart.py parity)
  const std::array<std::array<double, 4>, 4> init_ey_s = {{
      {0.0, 0.0, 0, 0}, {-0.25, 0.0, 0, 0}, {0.45, 0.0, 0, 0},
      {0.25, 0.25, 0, 0}}};
  std::vector<std::vector<double>> x_pred(
      n_agents, std::vector<double>((N + 1) * NX, 0.0));
  std::vector<std::vector<double>> u_pred(
      n_agents, std::vector<double>(N * NU, 0.0));
  std::vector<std::vector<double>> x0(n_agents, std::vector<double>(NX, 0.0));
  std::vector<std::vector<double>> u_old(n_agents,
                                         std::vector<double>(NU, 0.0));
  for (int a = 0; a < n_agents; ++a) {
    double vx = 1.3, s = 0.0;
    const double ey = init_ey_s[a % 4][0];
    for (int k = 0; k <= N; ++k) {
      double X, Y, Th;
      trk.global_position(s, ey, &X, &Y, &Th);
      double* row = &x_pred[a][k * NX];
      row[0] = vx; row[1] = -0.16; row[3] = ey; row[5] = Th;
      row[6] = s; row[7] = X; row[8] = Y;
      s += vx * dt;
      vx += 1.0 * dt;
    }
    std::memcpy(x0[a].data(), &x_pred[a][0], NX * sizeof(double));
  }

  if (nl_mode)
    return run_nl_ocd(trk, n_agents, N, steps, dt, admm_iters, x_pred,
                      u_pred, x0, u_old);

  double total = 0.0, worst = 0.0;
  int n_solves = 0;
  bool all_ok = true;
  for (int it = 0; it < steps; ++it) {
    const auto x0_prev = x0;   // standstill anchors for the safety filter
    // exchange: every agent reads everyone's previous (X, Y) plan
    // (N+1 stage rows: planes use 0..N-1, weights 1..N)
    std::vector<double> all_xy(static_cast<size_t>(N + 1) * n_agents * 2);
    for (int k = 0; k <= N; ++k)
      for (int a = 0; a < n_agents; ++a) {
        all_xy[(static_cast<size_t>(k) * n_agents + a) * 2] =
            x_pred[a][k * NX + 7];
        all_xy[(static_cast<size_t>(k) * n_agents + a) * 2 + 1] =
            x_pred[a][k * NX + 8];
      }
    for (int a = 0; a < n_agents; ++a) {
      std::vector<double> neigh(static_cast<size_t>(N + 1) * n_nb * 2);
      for (int k = 0; k <= N; ++k) {
        int c = 0;
        for (int b = 0; b < n_agents; ++b) {
          if (b == a) continue;
          neigh[(static_cast<size_t>(k) * n_nb + c) * 2] =
              all_xy[(static_cast<size_t>(k) * n_agents + b) * 2];
          neigh[(static_cast<size_t>(k) * n_nb + c) * 2 + 1] =
              all_xy[(static_cast<size_t>(k) * n_agents + b) * 2 + 1];
          ++c;
        }
      }
      StageQP qp = build_lpv_qp(trk, g, lim, mp, N, dt, x_pred[a].data(),
                                u_pred[a].data(), n_nb,
                                n_nb ? neigh.data() : nullptr);
      Vec z0(NZ);
      for (int i = 0; i < NX; ++i) z0[i] = x0[a][i];
      for (int i = 0; i < NU; ++i) z0[NX + i] = u_old[a][i];
      const auto t0 = std::chrono::steady_clock::now();
      Solution sol = admm_solve(qp, z0, admm_iters, 10.0, 1.6, 1e-5);
      const double ms =
          std::chrono::duration<double, std::milli>(
              std::chrono::steady_clock::now() - t0).count();
      total += ms; worst = std::max(worst, ms); ++n_solves;
      all_ok = all_ok && sol.feasible;
      for (int k = 0; k <= N; ++k)
        for (int i = 0; i < NX; ++i)
          x_pred[a][k * NX + i] = sol.z[k][i];
      for (int k = 0; k < N; ++k)
        for (int i = 0; i < NU; ++i)
          u_pred[a][k * NU + i] = sol.z[k + 1][NX + i];
      std::memcpy(x0[a].data(), &x_pred[a][NX], NX * sizeof(double));
      u_old[a][0] = u_pred[a][0];
      u_old[a][1] = u_pred[a][1];
    }

    // track-limits wall, then the executed-separation safety filter on
    // the applied x0-shift (runtime/simulate.py ordering;
    // include/cmpc/safety.h)
    for (int a = 0; a < n_agents; ++a)
      lateral_wall_exec(trk, 2.0, x0_prev[a].data(), x0[a].data(), dt);
    if (n_agents > 1) {
      std::vector<double> p0(2 * n_agents), p1(2 * n_agents);
      std::vector<double> prio(n_agents), beta(n_agents);
      for (int a = 0; a < n_agents; ++a) {
        p0[2 * a] = x0_prev[a][7];
        p0[2 * a + 1] = x0_prev[a][8];
        p1[2 * a] = x0[a][7];
        p1[2 * a + 1] = x0[a][8];
        prio[a] = x0_prev[a][6];
      }
      sep_filter_betas(n_agents, p0.data(), p1.data(), prio.data(),
                       0.7 * lim.min_dist, beta.data());
      for (int a = 0; a < n_agents; ++a)
        if (beta[a] < 1.0) {
          for (int i = 0; i < NX; ++i)
            x0[a][i] = x0_prev[a][i]
                + beta[a] * (x0[a][i] - x0_prev[a][i]);
          // truthful brake: realized speed ~ beta * planned speed
          for (int i = 0; i < 3; ++i) x0[a][i] *= beta[a];
        }
    }
  }

  double mean_s = 1e9;
  for (int a = 0; a < n_agents; ++a)
    mean_s = std::min(mean_s, x0[a][6]);
  std::printf("steps=%d agents=%d N=%d feasible=%d min_final_s=%.2f\n",
              steps, n_agents, N, all_ok ? 1 : 0, mean_s);
  std::printf("solve time: mean %.3f ms, max %.3f ms (%d solves)\n",
              total / n_solves, worst, n_solves);
  return all_ok ? 0 : 1;
}
