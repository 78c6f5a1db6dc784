#!/usr/bin/env python
"""Monte-Carlo scenario sweep: many perturbed fleets advance in lock-step
as one batched program (BASELINE.json config #5; on a pod the scenario axis
shards over hosts via parallel.fleet / parallel.multihost).

Reports the distribution of safety and performance metrics across
scenarios — the statistical robustness evidence the reference gathers by
re-running experiments serially. ``--pipeline nl`` sweeps the full NL-OCD
coordination loop (per-lane convergence freezing keeps each scenario's
trajectory and OCD-iteration statistics identical to a standalone run) and
reports the per-scenario OCD-iteration distribution — the reference's
de-facto regression artifacts are per-agent OCD_it/time tables.

    python scripts/monte_carlo.py [--pipeline lpv|nl] [--scenarios 64]
"""

import argparse

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()

import numpy as np


def _perturb_x0(state_x0, noise, rng):
    pert = rng.normal(size=state_x0.shape) * noise
    pert[..., 3:] = 0.0  # perturb only (vx, vy, wz): the pose states
    #                      (ey, epsi, theta, s, X, Y) are redundant
    #                      Frenet/Cartesian pairs that must stay consistent
    return pert


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", choices=("lpv", "nl"), default="lpv")
    ap.add_argument("--scenarios", type=int, default=64)
    ap.add_argument("--agents", type=int, default=3)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--map", default="Highway")
    ap.add_argument("--noise", type=float, default=0.05,
                    help="x0 perturbation scale")
    ap.add_argument("--mesh", default=None, metavar="SxA",
                    help="run sharded over a (scen, agent) device mesh, "
                    "e.g. 2x4 — the whole sweep is ONE scanned SPMD "
                    "program (parallel.make_sharded_*_rollout); scenario "
                    "and agent counts must divide the mesh axes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from colaborativempc_tpu.config import (
        ExperimentConfig, lpv_gains, nl_gains, SolverConfig, OCDConfig,
    )
    from colaborativempc_tpu.geometry import make_track

    rng = np.random.default_rng(0)

    mesh = None
    if args.mesh is not None:
        from jax.sharding import Mesh
        s_ax, a_ax = (int(v) for v in args.mesh.lower().split("x"))
        if args.scenarios % s_ax or args.agents % a_ax:
            raise SystemExit(f"--mesh {args.mesh}: scenarios ({args.scenarios}) "
                             f"and agents ({args.agents}) must divide the axes")
        if len(jax.devices()) < s_ax * a_ax:
            raise SystemExit(f"--mesh {args.mesh} needs {s_ax * a_ax} devices, "
                             f"have {len(jax.devices())} (hint: --cpu gives 8 "
                             f"virtual host devices)")
        mesh = Mesh(np.array(jax.devices()[: s_ax * a_ax]).reshape(s_ax, a_ax),
                    ("scen", "agent"))

    if args.pipeline == "nl":
        from colaborativempc_tpu.runtime.ocd import (
            init_nl_fleet, make_nl_ocd_rollout,
        )
        cfg = ExperimentConfig(
            n_agents=args.agents, N=args.N, dt=0.02, map_type=args.map,
            gains=nl_gains(), ocd=OCDConfig(),
            solver=SolverConfig(admm_iters=200, sqp_iters=2))
        track = make_track(cfg.map_type)
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None], (args.scenarios,) + x.shape).copy(),
            init_nl_fleet(track, cfg))
        pert = _perturb_x0(np.asarray(state.x0), args.noise, rng)
        state = state._replace(x0=state.x0 + jnp.asarray(pert, state.x0.dtype))

        if mesh is not None:
            from colaborativempc_tpu.parallel import (
                make_sharded_nl_ocd_rollout, place_ocd_batch,
            )
            state = place_ocd_batch(state, mesh)
            rollout = make_sharded_nl_ocd_rollout(track, cfg, mesh,
                                                  args.steps)
            state, m = rollout(state)
            # sharded metrics carry a leading time axis
            min_dist = np.asarray(m.min_dist_exec).min(axis=0)
            feas = np.asarray(m.feasible).all(axis=(0, 2))
            its = np.asarray(m.ocd_iterations).T        # (scen, steps)
        else:
            rollout = jax.jit(jax.vmap(make_nl_ocd_rollout(track, cfg,
                                                           args.steps)))
            state, (_, _, m) = rollout(state)
            min_dist = np.asarray(m.min_dist_exec).min(axis=1)
            feas = np.asarray(m.feasible).all(axis=(1, 2))
            its = np.asarray(m.ocd_iterations)          # (scen, steps)
        prog = np.asarray(state.x0[:, :, 6]).mean(axis=1)
        print(f"NL-OCD: {args.scenarios} scenarios x {args.agents} agents "
              f"x {args.steps} steps")
        print(f"feasible scenarios: {int(feas.sum())}/{args.scenarios}")
        print(f"min separation: p5={np.percentile(min_dist, 5):.3f} "
              f"median={np.median(min_dist):.3f} worst={min_dist.min():.3f}")
        print(f"progress [m]:   p5={np.percentile(prog, 5):.2f} "
              f"median={np.median(prog):.2f} best={prog.max():.2f}")
        # per-scenario OCD statistics (reference OCD_it.dat per agent):
        per_scen = its.mean(axis=1)
        print(f"OCD iterations/step: per-scenario mean "
              f"p5={np.percentile(per_scen, 5):.2f} "
              f"median={np.median(per_scen):.2f} "
              f"p95={np.percentile(per_scen, 95):.2f} "
              f"max-step={int(its.max())}")
        return

    from colaborativempc_tpu.runtime import init_lpv_fleet
    from colaborativempc_tpu.runtime.simulate import make_lpv_fleet_rollout
    from colaborativempc_tpu.parallel import batch_fleet_state

    cfg = ExperimentConfig(
        n_agents=args.agents, N=args.N, dt=0.02, map_type=args.map,
        gains=lpv_gains(), solver=SolverConfig(admm_iters=300))
    track = make_track(cfg.map_type)
    state = batch_fleet_state(init_lpv_fleet(track, cfg), args.scenarios)
    pert = _perturb_x0(np.asarray(state.x0), args.noise, rng)
    state = state._replace(x0=state.x0 + jnp.asarray(pert, state.x0.dtype))

    # all steps of all scenarios run as ONE scanned device program
    if mesh is not None:
        from colaborativempc_tpu.parallel import (
            make_sharded_lpv_rollout, shard_fleet_state,
        )
        state = shard_fleet_state(state, mesh)
        rollout = make_sharded_lpv_rollout(track, cfg, mesh, args.steps)
        state, m = rollout(state)
        min_dist = np.asarray(m.min_dist_exec).min(axis=0)  # (scenarios,)
        feas = np.asarray(m.feasible).all(axis=(0, 2))
    else:
        rollout = jax.jit(jax.vmap(make_lpv_fleet_rollout(track, cfg,
                                                          args.steps)))
        state, (_, _, m) = rollout(state)
        min_dist = np.asarray(m.min_dist_exec).min(axis=1)  # (scenarios,)
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
