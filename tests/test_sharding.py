"""Sharded multi-chip execution tests on the virtual 8-device CPU mesh.

The "fake backend" testing mode of SURVEY.md §4.4: the same collective code
paths that run over ICI on a pod run here over host devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from colaborativempc_tpu.config import ExperimentConfig, lpv_gains, SolverConfig
from colaborativempc_tpu.geometry import make_track
from colaborativempc_tpu.runtime import init_lpv_fleet, make_lpv_fleet_step
from colaborativempc_tpu.parallel import (
    make_sharded_lpv_step, batch_fleet_state, shard_fleet_state,
)


def _cfg(n_agents=4, N=8):
    return ExperimentConfig(
        n_agents=n_agents, N=N, dt=0.025, max_it=10, map_type="oval",
        gains=lpv_gains(), solver=SolverConfig(admm_iters=400))


def test_sharded_step_matches_single_device():
    cfg = _cfg()
    track = make_track(cfg.map_type)
    state = init_lpv_fleet(track, cfg)

    # reference: vmapped single-device step
    step_ref = make_lpv_fleet_step(track, cfg)
    ref_state, ref_metrics = step_ref(state)

    # sharded: 2 scenarios x 4 agents over 8 devices
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    bstate = batch_fleet_state(state, 2)
    bstate = shard_fleet_state(bstate, mesh)
    step_sh = make_sharded_lpv_step(track, cfg, mesh)
    new_state, metrics = step_sh(bstate)

    # both scenarios identical, and equal to the unsharded result
    for s in range(2):
        assert np.allclose(np.asarray(new_state.x_pred[s]),
                           np.asarray(ref_state.x_pred), atol=5e-4), s
    assert np.asarray(metrics.feasible).all()
    assert np.allclose(np.asarray(metrics.min_dist),
                       float(ref_metrics.min_dist), atol=1e-3)


def test_sharded_multi_step_stable():
    cfg = _cfg()
    track = make_track(cfg.map_type)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    state = shard_fleet_state(
        batch_fleet_state(init_lpv_fleet(track, cfg), 2), mesh)
    step = make_sharded_lpv_step(track, cfg, mesh)
    for _ in range(5):
        state, metrics = step(state)
    assert np.asarray(metrics.feasible).all()
    assert np.asarray(state.x0[:, :, 6] > 0.1).all()  # everyone progressed


def test_sharded_ocd_matches_single_device():
    """The sharded OCD coordination step must match the single-device one."""
    from colaborativempc_tpu.config import nl_gains, OCDConfig
    from colaborativempc_tpu.runtime.ocd import init_nl_fleet, make_nl_ocd_step
    from colaborativempc_tpu.parallel import (
        make_sharded_nl_ocd_step, shard_ocd_state,
    )

    cfg = ExperimentConfig(
        n_agents=4, N=8, dt=0.02, max_it=5, map_type="oval",
        gains=nl_gains(), ocd=OCDConfig(max_it_ocd=12),
        solver=SolverConfig(admm_iters=150, sqp_iters=2))
    track = make_track(cfg.map_type)
    state = init_nl_fleet(track, cfg)

    ref_step = make_nl_ocd_step(track, cfg)
    ref_state, ref_metrics = ref_step(state)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    bstate = shard_ocd_state(state, 2, mesh)
    sh_step = make_sharded_nl_ocd_step(track, cfg, mesh)
    new_state, metrics = sh_step(bstate)

    for s in range(2):
        err = np.abs(np.asarray(new_state.x_pred[s])
                     - np.asarray(ref_state.x_pred)).max()
        assert err < 2e-3, err
        lam_err = np.abs(np.asarray(new_state.lambdas[s])
                         - np.asarray(ref_state.lambdas)).max()
        assert lam_err < 1e-3, lam_err
    assert np.asarray(metrics.feasible).all()


def test_sharded_ocd_per_scenario_convergence():
    """A 2-scenario batch whose scenarios converge at different OCD depths
    must reproduce EACH scenario's single-fleet result and report per-
    scenario iteration counts — converged scenarios freeze instead of
    riding the slower scenario's while_loop (reference semantics converge
    per run, NL_EU_N_main.py:141-162)."""
    from colaborativempc_tpu.config import nl_gains, OCDConfig, x0_database
    from colaborativempc_tpu.runtime.ocd import init_nl_fleet, make_nl_ocd_step
    from colaborativempc_tpu.parallel import (
        make_sharded_nl_ocd_step, place_ocd_batch,
    )

    cfg = ExperimentConfig(
        n_agents=4, N=8, dt=0.02, max_it=5, map_type="oval",
        gains=nl_gains(), ocd=OCDConfig(max_it_ocd=25),
        solver=SolverConfig(admm_iters=150, sqp_iters=2))
    track = make_track(cfg.map_type)
    x0_a = np.asarray(x0_database(cfg.n_agents))
    x0_b = x0_a.copy()
    x0_b[:, 0] += 0.5           # a faster fleet: different coupling pressure
    state_a = init_nl_fleet(track, cfg, x0_a)
    state_b = init_nl_fleet(track, cfg, x0_b)

    ref_step = make_nl_ocd_step(track, cfg)
    refs = [ref_step(s) for s in (state_a, state_b)]

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    batched = jax.tree.map(lambda a, b: jnp.stack([a, b]), state_a, state_b)
    new_state, metrics = make_sharded_nl_ocd_step(track, cfg, mesh)(
        place_ocd_batch(batched, mesh))

    its = np.asarray(metrics.ocd_iterations)
    for s, (ref_state, ref_metrics) in enumerate(refs):
        err = np.abs(np.asarray(new_state.x_pred[s])
                     - np.asarray(ref_state.x_pred)).max()
        assert err < 2e-3, (s, err)
        lam_err = np.abs(np.asarray(new_state.lambdas[s])
                         - np.asarray(ref_state.lambdas)).max()
        assert lam_err < 1e-3, (s, lam_err)
        assert int(its[s]) == int(ref_metrics.ocd_iterations), (
            s, int(its[s]), int(ref_metrics.ocd_iterations))


def test_sharded_ocd_hp_opt_matches_single_device():
    """hp_opt over the mesh: the plane exchange (all_gather + scatter into
    the replicated pair tensor) must reproduce the single-device step."""
    from colaborativempc_tpu.config import nl_gains, OCDConfig
    from colaborativempc_tpu.runtime.ocd import init_nl_fleet, make_nl_ocd_step
    from colaborativempc_tpu.parallel import (
        make_sharded_nl_ocd_step, shard_ocd_state,
    )

    cfg = ExperimentConfig(
        n_agents=4, N=8, dt=0.02, max_it=5, map_type="oval",
        coupling="hp_opt",
        gains=nl_gains(), ocd=OCDConfig(max_it_ocd=10),
        solver=SolverConfig(admm_iters=150, sqp_iters=2))
    track = make_track(cfg.map_type)
    state = init_nl_fleet(track, cfg)

    ref_state, ref_metrics = make_nl_ocd_step(track, cfg)(state)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    bstate = shard_ocd_state(state, 2, mesh)
    new_state, metrics = make_sharded_nl_ocd_step(track, cfg, mesh)(bstate)

    for s in range(2):
        err = np.abs(np.asarray(new_state.x_pred[s])
                     - np.asarray(ref_state.x_pred)).max()
        assert err < 2e-3, err
        lam_err = np.abs(np.asarray(new_state.lambdas[s])
                         - np.asarray(ref_state.lambdas)).max()
        assert lam_err < 2e-3, lam_err
    assert np.asarray(metrics.feasible).all()


def test_two_process_multicontroller_lpv_step():
    """True multi-controller execution: two OS processes, 4 virtual CPU
    devices each, wired by jax.distributed (gloo collectives); a sharded
    LPV fleet step runs over the GLOBAL 2x4 mesh whose scenario axis
    crosses the process boundary — the testable stand-in for
    parallel/multihost.py's DCN path (SURVEY.md §5.8). Skips where
    cross-process CPU collectives are unavailable."""
    import socket
    import subprocess
    import sys
    import os

    import pytest

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "_multihost_worker.py"),
         str(pid), "2", str(port)],
        cwd=repo, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    codes = [p.returncode for p in procs]
    if any(c == 42 for c in codes):
        pytest.skip(f"jax.distributed unavailable here: {outs}")
    for c, out in zip(codes, outs):
        assert c == 0, out
        assert "OK pid=" in out, out


def test_sharded_dynamic_lane_matches_single_device():
    """Dynamic lane selection inside the sharded step (shard-local
    relocalisation, no collectives) must match the single-device step."""
    import dataclasses
    from colaborativempc_tpu.config import x0_database
    from colaborativempc_tpu.geometry import select_lane

    cfg = ExperimentConfig(
        n_agents=4, N=8, dt=0.025, max_it=10, map_type="Oval2",
        lane=0, dynamic_lane=True,
        gains=lpv_gains(), solver=SolverConfig(admm_iters=400))
    track = make_track(cfg.map_type)
    # start the fleet in LANE 1 while cfg.lane=0
    state = init_lpv_fleet(track, dataclasses.replace(cfg, lane=1),
                           np.asarray(x0_database(cfg.n_agents)))

    ref_state, ref_metrics = make_lpv_fleet_step(track, cfg)(state)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    bstate = shard_fleet_state(batch_fleet_state(state, 2), mesh)
    new_state, metrics = make_sharded_lpv_step(track, cfg, mesh)(bstate)

    for s in range(2):
        err = np.abs(np.asarray(new_state.x_pred[s])
                     - np.asarray(ref_state.x_pred)).max()
        assert err < 5e-4, (s, err)
    assert np.asarray(metrics.feasible).all()
    lane, _ = select_lane(track, new_state.x0[0, 0])
    assert int(lane) == 1


def test_sharded_lpv_rollout_matches_per_step():
    """The scanned sharded rollout (ONE device program for all control
    steps) equals the per-step sharded loop exactly — the round-2 verdict's
    multi-chip dispatch-cost item."""
    from colaborativempc_tpu.parallel import make_sharded_lpv_rollout

    cfg = _cfg()
    track = make_track(cfg.map_type)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    steps = 3

    s1 = shard_fleet_state(batch_fleet_state(init_lpv_fleet(track, cfg), 2),
                           mesh)
    step = make_sharded_lpv_step(track, cfg, mesh)
    per_step_metrics = []
    for _ in range(steps):
        s1, m = step(s1)
        per_step_metrics.append(m)

    s2 = shard_fleet_state(batch_fleet_state(init_lpv_fleet(track, cfg), 2),
                           mesh)
    s2, metrics = make_sharded_lpv_rollout(track, cfg, mesh, steps)(s2)

    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    assert metrics.feasible.shape[0] == steps
    np.testing.assert_allclose(
        np.asarray(metrics.min_dist[-1]),
        np.asarray(per_step_metrics[-1].min_dist), atol=1e-6)


def test_sharded_ocd_rollout_matches_per_step():
    """Scanned sharded NL-OCD rollout (full coordination while_loop inside
    each scanned step) equals the per-step sharded loop."""
    from colaborativempc_tpu.config import nl_gains, OCDConfig
    from colaborativempc_tpu.runtime.ocd import init_nl_fleet
    from colaborativempc_tpu.parallel import (
        make_sharded_nl_ocd_step, make_sharded_nl_ocd_rollout,
        shard_ocd_state,
    )

    cfg = ExperimentConfig(
        n_agents=4, N=8, dt=0.02, max_it=5, map_type="oval",
        gains=nl_gains(), ocd=OCDConfig(max_it_ocd=10),
        solver=SolverConfig(admm_iters=120, sqp_iters=1))
    track = make_track(cfg.map_type)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("scen", "agent"))
    steps = 2

    s1 = shard_ocd_state(init_nl_fleet(track, cfg), 2, mesh)
    step = make_sharded_nl_ocd_step(track, cfg, mesh)
    for _ in range(steps):
        s1, m1 = step(s1)

    s2 = shard_ocd_state(init_nl_fleet(track, cfg), 2, mesh)
    s2, metrics = make_sharded_nl_ocd_rollout(track, cfg, mesh, steps)(s2)

    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert metrics.ocd_iterations.shape[0] == steps
    np.testing.assert_array_equal(np.asarray(metrics.ocd_iterations[-1]),
                                  np.asarray(m1.ocd_iterations))
