// Closed-loop native simulation binary (the framework's analogue of the
// reference's C++ MPCC entry point, MPCC-master/C++/main.cpp:30-86):
// loads a track table CSV exported by Python, runs the single/multi-agent
// LPV collaborative MPC closed loop, reports mean/max solve times.
//
// Usage: cmpc_sim <track.csv> [n_agents=3] [N=20] [steps=100] [dt=0.02]
//        [admm_iters=600]
//
// track.csv rows: x0 y0 psi0 s0 len curv hw ; last line: "length <L> <open>"
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "cmpc/model.h"
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

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s <track.csv> [n_agents] [N] [steps] [dt]\n",
                 argv[0]);
    return 2;
  }
  Track trk;
  if (!load_track(argv[1], &trk)) {
    std::fprintf(stderr, "failed to load track %s\n", argv[1]);
    return 2;
  }
  const int n_agents = argc > 2 ? std::atoi(argv[2]) : 3;
  const int N = argc > 3 ? std::atoi(argv[3]) : 20;
  const int steps = argc > 4 ? std::atoi(argv[4]) : 100;
  const double dt = argc > 5 ? std::atof(argv[5]) : 0.02;
  const int admm_iters = argc > 6 ? std::atoi(argv[6]) : 600;
  const int n_nb = n_agents - 1;

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

  double total = 0.0, worst = 0.0;
  int n_solves = 0;
  bool all_ok = true;
  for (int it = 0; it < steps; ++it) {
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
