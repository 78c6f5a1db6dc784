#!/usr/bin/env python
"""Monte-Carlo scenario sweep: many perturbed fleets advance in lock-step
as one batched program (BASELINE.json config #5; on a pod the scenario axis
shards over hosts via parallel.fleet / parallel.multihost).

Reports the distribution of safety and performance metrics across
scenarios — the statistical robustness evidence the reference gathers by
re-running experiments serially.

    python scripts/monte_carlo.py [--scenarios 64] [--steps 60] [--cpu]
"""

import argparse
import os
import sys

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=64)
    ap.add_argument("--agents", type=int, default=3)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--map", default="Highway")
    ap.add_argument("--noise", type=float, default=0.05,
                    help="x0 perturbation scale")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from colaborativempc_tpu.config import (
        ExperimentConfig, lpv_gains, SolverConfig,
    )
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.runtime import init_lpv_fleet
    from colaborativempc_tpu.runtime.simulate import make_lpv_fleet_rollout
    from colaborativempc_tpu.parallel import batch_fleet_state

    cfg = ExperimentConfig(
        n_agents=args.agents, N=args.N, dt=0.02, map_type=args.map,
        gains=lpv_gains(), solver=SolverConfig(admm_iters=300))
    track = make_track(cfg.map_type)
    state = batch_fleet_state(init_lpv_fleet(track, cfg), args.scenarios)
    rng = np.random.default_rng(0)
    pert = rng.normal(size=state.x0.shape) * args.noise
    pert[:, :, 3:] = 0.0  # perturb only (vx, vy, wz): the pose states
    #                        (ey, epsi, theta, s, X, Y) are redundant
    #                        Frenet/Cartesian pairs that must stay consistent
    state = state._replace(x0=state.x0 + jnp.asarray(pert, state.x0.dtype))

    # all steps of all scenarios run as ONE scanned device program
    rollout = jax.jit(jax.vmap(make_lpv_fleet_rollout(track, cfg,
                                                      args.steps)))
    state, (_, _, m) = rollout(state)
    min_dist = np.asarray(m.min_dist_exec).min(axis=1)      # (scenarios,)
    feas = np.asarray(m.feasible).all(axis=(1, 2))

    prog = np.asarray(state.x0[:, :, 6]).mean(axis=1)
    print(f"{args.scenarios} scenarios x {args.agents} agents x "
          f"{args.steps} steps")
    print(f"feasible scenarios: {int(feas.sum())}/{args.scenarios}")
    print(f"min separation: p5={np.percentile(min_dist, 5):.3f} "
          f"median={np.median(min_dist):.3f} worst={min_dist.min():.3f}")
    print(f"progress [m]:   p5={np.percentile(prog, 5):.2f} "
          f"median={np.median(prog):.2f} best={prog.max():.2f}")


if __name__ == "__main__":
    main()
