"""Benchmark: batched collaborative-MPC solves/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship collaborative LPV-MPC fleet step (3 agents, H=20,
Highway — the reference's NL experiment shape, config_NL.py:20-22) batched
over perturbed scenarios on a single chip. Each fleet step performs one full
MPC solve per agent (plane generation, LPV stage-QP assembly, Riccati+ADMM).

Baseline: the reference solves one agent-step in 0.11-0.13 s on an
i7-13700H (BASELINE.md, LPV3r_agent_laptop time.dat) => ~9.1 solves/s/core.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from colaborativempc_tpu.config import (
        ExperimentConfig, lpv_gains, SolverConfig, x0_database,
    )
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.runtime import init_lpv_fleet
    from colaborativempc_tpu.runtime.simulate import make_lpv_fleet_rollout
    from colaborativempc_tpu.parallel import batch_fleet_state

    B = 256         # scenario batch per chip (saturation knee, BENCH.md:
                    # 64->19.3k, 256->19.8k, 512->15.8k solves/s)
    N_AGENTS = 3
    H = 20
    STEPS = 20

    cfg = ExperimentConfig(
        n_agents=N_AGENTS, N=H, dt=0.02, map_type="Highway",
        gains=lpv_gains(), solver=SolverConfig(admm_iters=300))
    track = make_track(cfg.map_type)

    base = init_lpv_fleet(track, cfg)
    state = batch_fleet_state(base, B)
    # perturb scenarios so the batch is not degenerate
    rng = np.random.default_rng(0)
    dx = jnp.asarray(rng.normal(size=state.x0.shape) * 0.02, state.x0.dtype)
    state = state._replace(x0=state.x0 + dx)

    # the STEPS control steps run as ONE scanned device program (no host
    # dispatch between steps — simulate.make_lpv_fleet_rollout)
    rollout = jax.jit(jax.vmap(make_lpv_fleet_rollout(track, cfg, STEPS)))

    state, _ = jax.block_until_ready(rollout(state))   # compile + warm
    best = float("inf")
    for _ in range(5):          # best-of-5: the tunnelled backend shows
        t0 = time.time()        # +-10-25% run-to-run drift (BENCH.md);
        state, _ = rollout(state)   # the min tracks the compute floor
        jax.block_until_ready(state)
        best = min(best, (time.time() - t0) / STEPS)
    dt_step = best

    # per-step dispatch floor (tunnel RTT + launch) for drift context
    tiny = jax.jit(lambda x: x + 1.0)
    z = tiny(np.float32(0.0)).block_until_ready()
    floor = float("inf")
    for _ in range(10):
        t0 = time.time()
        z = tiny(z).block_until_ready()
        floor = min(floor, time.time() - t0)

    solves_per_sec = B * N_AGENTS / dt_step
    baseline = 9.1  # reference solves/s/core (0.11 s/agent-solve)
    print(json.dumps({
        "metric": f"batched collaborative MPC solves/s/chip (H={H}, "
                  f"{N_AGENTS} agents, {B} scenarios)",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / baseline, 1),
        "dispatch_floor_ms": round(floor * 1e3, 2),
        "protocol": "best-of-5 x 20-step scanned rollouts",
    }))


if __name__ == "__main__":
    main()
