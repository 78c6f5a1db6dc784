#!/usr/bin/env python
"""Behavioural parity comparison against the reference's recorded golden
runs (``/root/reference/planner/scripts/data/experiments_paper/``; these are
the de-facto regression baselines, SURVEY.md §4.2).

Closed-loop trajectories diverge chaotically between ANY two solvers, so
parity is measured on behaviour, not samplewise states:
  - short-horizon state deviation (first K steps, before divergence)
  - velocity profile statistics (mean/max vx)
  - lateral-error statistics (RMS ey)
  - progress rate (ds/dt) and completion
  - minimum executed inter-agent distance

    python scripts/compare_reference.py --ref \
        /root/reference/planner/scripts/data/experiments_paper/LPV3r_agent_laptop \
        [--cpu] [--steps 200] [--N 125]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from _common import setup_backend  # noqa: E402
setup_backend()

import numpy as np


def load_reference(path, n_agents=3):
    return np.stack([
        np.loadtxt(os.path.join(path, "csv", str(a), "states.dat"))
        for a in range(n_agents)], axis=1)  # (T, n_ag, 9)


def stats(states, dt, label):
    vx = states[:, :, 0]
    ey = states[:, :, 3]
    s = states[:, :, 6]
    xy = states[:, :, 7:9]
    n_ag = states.shape[1]
    dmin = np.inf
    for i in range(n_ag):
        for j in range(i + 1, n_ag):
            d = np.hypot(*(xy[:, i] - xy[:, j]).T)
            dmin = min(dmin, d.min())
    out = dict(
        mean_vx=float(vx[20:].mean()), max_vx=float(vx.max()),
        rms_ey=float(np.sqrt((ey ** 2).mean())),
        progress_rate=float((s[-1] - s[0]).mean() / (dt * (len(s) - 1))),
        min_pair_dist=float(dmin))
    print(f"{label:>10}: " + "  ".join(f"{k}={v:.3f}" for k, v in out.items()))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/planner/scripts/data/"
                    "experiments_paper/LPV3r_agent_laptop")
    ap.add_argument("--planner", choices=["lpv", "nl"], default="lpv")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--N", type=int, default=125)
    ap.add_argument("--dt", type=float, default=0.025)
    ap.add_argument("--short", type=int, default=40,
                    help="short-horizon deviation window")
    args = ap.parse_args()

    from colaborativempc_tpu.config import (
        ExperimentConfig, lpv_gains, nl_gains, SolverConfig, OCDConfig,
    )
    from colaborativempc_tpu.runtime import (
        run_lpv_experiment, run_nl_experiment,
    )

    ref = load_reference(args.ref)
    T = min(args.steps, len(ref))

    if args.planner == "lpv":
        cfg = ExperimentConfig(
            n_agents=3, N=args.N, dt=args.dt, max_it=T, map_type="Highway",
            gains=lpv_gains(), solver=SolverConfig(admm_iters=1000))
        res = run_lpv_experiment(cfg)
    else:
        cfg = ExperimentConfig(
            n_agents=3, N=args.N, dt=args.dt, max_it=T, map_type="Highway",
            gains=nl_gains(), ocd=OCDConfig(max_it_ocd=30),
            solver=SolverConfig(admm_iters=300, sqp_iters=2))
        res = run_nl_experiment(cfg)
        print(f"OCD iterations: mean {res.ocd_iterations.mean():.2f} "
              f"(reference NL_3agents_def OCD_it.dat mean: 4.00)")
    ours = res.states

    Tc = min(len(ours), T)
    print(f"comparing {Tc} control steps "
          f"(ref run has {len(ref)}, ours {len(ours)})")
    r = stats(ref[:Tc], args.dt, "reference")
    o = stats(ours[:Tc], args.dt, "ours")

    K = min(args.short, Tc)
    dev = np.abs(ours[:K] - ref[:K])
    print(f"\nshort-horizon (first {K} steps) max abs deviation per state:")
    names = ["vx", "vy", "wz", "ey", "epsi", "theta", "s", "X", "Y"]
    for i, nm in enumerate(names):
        print(f"  {nm:>5}: {dev[:, :, i].max():.4f}")

    print("\nbehavioural deltas (ours - reference):")
    for k in r:
        print(f"  {k}: {o[k] - r[k]:+.3f}")


if __name__ == "__main__":
    main()
