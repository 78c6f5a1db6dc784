"""Nonlinear SQP planner + OCD coordination tests.

Validation targets from the reference NL experiments (NL_EU_N_main.py +
NL_3agents_def data): OCD converges in a few iterations per control step,
agents track the reference velocity, keep separation, and the converged
trajectories satisfy the NONLINEAR dynamics (not just the LPV surrogate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colaborativempc_tpu.config import (
    ExperimentConfig, nl_gains, SolverConfig, OCDConfig, ModelParams,
)
from colaborativempc_tpu.dynamics import f_continuous
from colaborativempc_tpu.geometry import make_track, curvature
from colaborativempc_tpu.runtime.ocd import (
    init_nl_fleet, make_nl_ocd_step, run_nl_experiment,
)


def nl_cfg(**kw):
    base = dict(n_agents=3, N=15, dt=0.02, max_it=60, map_type="Highway",
                gains=nl_gains(), ocd=OCDConfig(max_it_ocd=30),
                solver=SolverConfig(admm_iters=200, sqp_iters=2))
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def nl_run():
    cfg = nl_cfg()
    return cfg, run_nl_experiment(cfg)


def test_ocd_converges_quickly(nl_run):
    cfg, res = nl_run
    assert res.steps > 30
    assert res.feasible.all()
    # reference converges in ~4 OCD iterations per step (OCD_it.dat mean=4);
    # allow headroom but catch divergence
    assert float(res.ocd_iterations[5:].mean()) < 15
    assert int(res.ocd_iterations.max()) <= cfg.ocd.max_it_ocd + 1


def test_nl_agents_progress_and_separate(nl_run):
    cfg, res = nl_run
    s = res.states[:, :, 6]
    assert (s[-1] > 0.5).all()
    assert (np.diff(s, axis=0) > -1e-3).all()
    # OCD's dual prices are an integral controller: separation can sag
    # slightly below dth while lambda ramps, then recovers (the reference
    # behaves the same; its slack-warn threshold is 0.1). Executed
    # separation must stay within ~20% of dth and never collapse.
    assert res.min_dist_exec.min() > cfg.limits.min_dist * 0.8


def test_nl_velocity_tracking(nl_run):
    cfg, res = nl_run
    vx = res.states[:, :, 0]
    assert float(vx[-1].mean()) > vx[0].mean()   # accelerating toward ref
    assert float(vx.max()) < cfg.limits.max_vel + 0.1


def test_sqp_satisfies_nonlinear_dynamics():
    """At SQP convergence the prediction must satisfy the nonlinear model:
    x_{k+1} = x_k + dt f(x_k, u_k) to linearisation-error accuracy."""
    cfg = nl_cfg(solver=SolverConfig(admm_iters=300, sqp_iters=4))
    track = make_track(cfg.map_type)
    state = init_nl_fleet(track, cfg)
    step = make_nl_ocd_step(track, cfg)
    for _ in range(3):
        state, m = step(state)
    p = ModelParams()
    x = np.asarray(state.x_pred)
    u = np.asarray(state.u_pred)
    # x_pred in the carried state is the shifted trajectory; re-simulate
    # stage transitions with the nonlinear model
    worst = 0.0
    for a in range(cfg.n_agents):
        for k in range(cfg.N - 1):
            kap = float(curvature(track, x[a, k, 6]))
            f = np.asarray(f_continuous(jnp.asarray(x[a, k]),
                                        jnp.asarray(u[a, k]), kap, p))
            defect = x[a, k + 1] - (x[a, k] + cfg.dt * f)
            worst = max(worst, float(np.abs(defect).max()))
    assert worst < 1e-2, worst


def test_lambda_warm_start_round_trip():
    """Duals returned by one run seed the next (the reference's ini_lambdas
    pickle round trip, NL_EU_N_main.py:174-175 + misc.py:218-231)."""
    cfg = nl_cfg(max_it=5)
    res1 = run_nl_experiment(cfg)
    assert res1.lambdas.shape == (3, 3, cfg.N)
    res2 = run_nl_experiment(cfg, lambdas0=res1.lambdas)
    assert res2.feasible.all()
    # warm duals should not slow coordination down
    assert res2.ocd_iterations.mean() <= res1.ocd_iterations.mean() + 2


def test_hp_coupling_variant():
    """Hyperplane coupling (reference NL_Planner_Hp / NL_HP_N_main): agents
    coordinate via separating-plane rows; behaviour comparable to Euclidean
    coupling — separation kept, progress made."""
    cfg = nl_cfg(coupling="hp", max_it=40)
    res = run_nl_experiment(cfg)
    assert res.steps > 25
    assert res.feasible.all()
    assert res.min_dist_exec.min() > cfg.limits.min_dist * 0.8
    s = res.states[:, :, 6]
    assert (s[-1] > 0.4).all()
    assert float(res.ocd_iterations[5:].mean()) < 15


def test_nl_long_horizon():
    """The nonlinear path runs at the reference's LPV horizon class.

    The reference caps its NL/IPOPT planner at N=20 and documents
    divergence beyond ("solution degradation when attempting longer
    planning horizons", ECC2024:318; N=50 runs show 87 s outliers). The
    SQP+Riccati+ADMM path has no such cliff.
    """
    cfg = nl_cfg(N=80, max_it=4, ocd=OCDConfig(max_it_ocd=20),
                 solver=SolverConfig(admm_iters=500, sqp_iters=2))
    res = run_nl_experiment(cfg)
    assert res.steps == 4
    assert res.feasible.all()
    assert res.min_dist_exec.min() > 0.2


def test_rti_mode():
    """sqp_iters=1 is the real-time-iteration mode (the reference's
    max_iter: 1 IPOPT trick, NL_Planner_Hp.py:218) - degraded but usable."""
    cfg = nl_cfg(max_it=25,
                 solver=SolverConfig(admm_iters=200, sqp_iters=1))
    res = run_nl_experiment(cfg)
    assert res.steps == 25
    assert res.feasible.all()
    assert res.min_dist_exec.min() > 0.2
    assert (res.states[-1, :, 6] > 0.3).all()


def test_hp_opt_coupling_variant():
    """Hyperplanes as decision variables (the reference's full Hp master
    formulation, NL_Planner_Hp.py:89-98): the master refines its plane
    (angle/offset perturbations as stage controls, ||a||=1 exact by the
    angle parameterisation) jointly with its trajectory; slaves use the
    shipped plane as a parameter row."""
    cfg = nl_cfg(coupling="hp_opt", max_it=30)
    res = run_nl_experiment(cfg)
    assert res.steps == 30
    assert res.feasible.all()
    assert res.min_dist_exec.min() > cfg.limits.min_dist * 0.8
    s = res.states[:, :, 6]
    assert (s[-1] > 0.4).all()
    assert float(res.ocd_iterations[5:].mean()) < 15


def test_hp_opt_master_refines_plane():
    """Under an active price the master's solution moves the plane away
    from the geometric bisector (dtheta/db nonzero within trust bounds)."""
    from colaborativempc_tpu.config import SysLimits, ModelParams
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.planners.nl import (
        nl_solve, PLANE_TRUST_THETA, PLANE_TRUST_B,
    )
    from colaborativempc_tpu.utils import initialise_agents
    from colaborativempc_tpu.config import x0_database

    track = make_track("Highway")
    gains, lim, mp = nl_gains(), SysLimits(), ModelParams()
    N, dt = 10, 0.02
    x0s = jnp.asarray(x0_database(2), jnp.float32)
    agents_xy, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
    neigh = agents_xy[:, [1], :]                     # ego 0 master vs 1
    # canonical bisector planes (theta, b)
    diff = np.asarray(neigh[1:, 0]) - np.asarray(x_pred[0][1:, 7:9])
    dist = np.linalg.norm(diff, axis=-1)
    a = diff / dist[:, None]
    th = np.arctan2(a[:, 1], a[:, 0])
    b = -np.sum(a * 0.5 * (np.asarray(neigh[1:, 0])
                           + np.asarray(x_pred[0][1:, 7:9])), axis=-1)
    planes0 = jnp.asarray(np.stack([th, b], -1))[None]   # (1, N, 2)

    lam = jnp.full((1, N), 2.0)                      # active price
    sol = nl_solve(track, gains, lim, mp, N, dt, x_pred[0][0], x_pred[0],
                   u_pred[0], jnp.zeros(2), lam, neigh,
                   jnp.ones(1, jnp.float32), coupling="hp_opt",
                   sqp_iters=2, admm_iters=300, planes0=planes0)
    assert bool(sol.feasible)
    dpl = np.asarray(sol.planes) - np.asarray(planes0)
    assert np.abs(dpl[..., 0]).max() > 1e-4          # plane actually moved
    # cumulative move bounded by sqp_iters trust radii
    assert np.abs(dpl[..., 0]).max() <= 2 * PLANE_TRUST_THETA + 1e-5
    assert np.abs(dpl[..., 1]).max() <= 2 * PLANE_TRUST_B + 1e-5


def test_dual_projection():
    """Coupling prices are projected onto [lambda_lo, inf).

    The reference's unprojected duals drift unboundedly negative while
    agents run separated (lambdas += alpha*(dth - dist) with dist > dth,
    NL_EU_N_main.py:138-139) — a negative price is an ATTRACTION that was
    observed to jam and numerically diverge the NL_3agents_mh course. The
    default lambda_lo=0 is the textbook projected dual ascent."""
    cfg = nl_cfg(max_it=25)
    res = run_nl_experiment(cfg)
    assert res.lambdas.min() >= 0.0
    # raw reference semantics on request
    cfg_raw = nl_cfg(max_it=5, ocd=OCDConfig(max_it_ocd=30,
                                             lambda_lo=-np.inf))
    res_raw = run_nl_experiment(cfg_raw)
    assert res_raw.feasible.all()


def test_nonfinite_containment():
    """An agent whose sub-problem solve goes non-finite keeps its previous
    prediction and is flagged infeasible instead of poisoning the fleet."""
    from colaborativempc_tpu.runtime.ocd import _contain_nonfinite
    from colaborativempc_tpu.planners.nl import NLSolution

    n_ag, N = 3, 10
    x_prev = jnp.ones((n_ag, N + 1, 9))
    u_prev = jnp.ones((n_ag, N, 2))

    class St:  # only the fields _contain_nonfinite touches
        x_pred = x_prev
        u_pred = u_prev

    x_new = x_prev * 2.0
    x_new = x_new.at[1].set(jnp.nan)
    sol = NLSolution(
        x_pred=x_new, u_pred=u_prev * 2.0, du_pred=None, s_pred=None,
        feasible=jnp.ones((n_ag,), bool),
        w=jnp.zeros((n_ag, N, 6)), y=jnp.zeros((n_ag, N, 6)),
        rho_scale=jnp.full((n_ag,), 7.0),
        iterations=None, r_prim=None,
        planes=jnp.zeros((n_ag, 2, N, 2)))
    xp, up, w, y, rs, feas, ok = _contain_nonfinite(St, sol)
    assert bool(jnp.all(jnp.isfinite(xp)))
    np.testing.assert_allclose(np.asarray(xp[1]), np.asarray(x_prev[1]))
    np.testing.assert_allclose(np.asarray(xp[0]), np.asarray(x_new[0]))
    assert not bool(feas[1]) and bool(feas[0]) and bool(feas[2])
    assert float(rs[1]) == 1.0 and float(rs[0]) == 7.0


def test_adaptive_alpha_runs():
    """RPROP-style adaptive dual step (opt-in) stays feasible and separated."""
    cfg = nl_cfg(max_it=20, ocd=OCDConfig(max_it_ocd=30, adaptive_alpha=True))
    res = run_nl_experiment(cfg)
    assert res.steps == 20
    assert res.feasible.all()
    assert res.min_dist_exec.min() > 0.2


def test_instrumented_ocd_matches_fast_path():
    """verb_ocd runs the coordination loop host-driven (one dispatch per
    iteration, true per-iteration times — the reference's verb_OCD tier);
    it must reproduce the fast single-dispatch path's behaviour."""
    from colaborativempc_tpu.runtime.io import ExperimentIO

    cfg = nl_cfg(max_it=6)
    res_fast = run_nl_experiment(cfg)
    cfg_i = nl_cfg(max_it=6, verb_ocd=True)
    io = ExperimentIO(cfg_i, path="/tmp/cmpc_instr_test")
    res_inst = run_nl_experiment(cfg_i, io=io)

    assert res_inst.steps == res_fast.steps
    assert res_inst.feasible.all()
    np.testing.assert_array_equal(res_inst.ocd_iterations,
                                  res_fast.ocd_iterations)
    # same jitted iteration program => same trajectory (tolerance for
    # fusion differences between the standalone and while_loop compiles)
    np.testing.assert_allclose(res_inst.states, res_fast.states, atol=1e-4)
    # true per-iteration rows recorded, one list per control step
    assert len(io.ocd_iter_times) == res_inst.steps
    assert all(len(r) == n for r, n in
               zip(io.ocd_iter_times, res_inst.ocd_iterations))
    io.save_to_csv()
    import os
    tab = np.loadtxt(os.path.join(io.path, "csv", "0", "time_OCD.dat"))
    assert tab.shape[0] == res_inst.steps

    # fast path: no per-iteration wall times exist (one device dispatch per
    # control step), so time_OCD.dat must NOT be fabricated — the derived
    # per-iteration mean is emitted under its own explicit name instead
    io_f = ExperimentIO(cfg, path="/tmp/cmpc_fast_test")
    run_nl_experiment(cfg, io=io_f)
    io_f.save_to_csv()
    d = os.path.join(io_f.path, "csv", "0")
    assert not os.path.exists(os.path.join(d, "time_OCD.dat"))
    mean = np.loadtxt(os.path.join(d, "time_OCD_mean.dat"))
    assert mean.shape[0] == res_fast.steps


def test_single_agent_nl():
    """n_agents=1 NL experiment (regression: the warm-start row count must
    match the QP's placeholder-neighbour row)."""
    cfg = nl_cfg(n_agents=1, max_it=20)
    res = run_nl_experiment(cfg)
    assert res.steps == 20
    assert res.feasible.all()
    assert res.states[-1, 0, 6] > 0.3


def test_nl_rollout_matches_step_loop():
    """The scanned on-device NL-OCD rollout equals the host-driven loop
    over make_nl_ocd_step (same coordination while_loop inside lax.scan)."""
    from colaborativempc_tpu.runtime.ocd import make_nl_ocd_rollout

    cfg = nl_cfg(n_agents=2, N=10)
    track = make_track(cfg.map_type)
    steps = 4

    state = init_nl_fleet(track, cfg)
    step = make_nl_ocd_step(track, cfg)
    st = state
    x0_ref, it_ref = [], []
    for _ in range(steps):
        st, m = step(st)
        x0_ref.append(np.asarray(st.x0))
        it_ref.append(int(m.ocd_iterations))

    st2, (x0_h, u_h, metrics) = make_nl_ocd_rollout(track, cfg, steps)(
        state)
    assert np.allclose(np.asarray(x0_h), np.asarray(x0_ref), atol=1e-5)
    assert np.array_equal(np.asarray(metrics.ocd_iterations),
                          np.asarray(it_ref))
    assert np.allclose(np.asarray(st2.x0), x0_ref[-1], atol=1e-5)


def test_vmapped_ocd_matches_per_lane():
    """Batched (vmapped) OCD must reproduce each lane's standalone result:
    a converged lane FREEZES (per-run convergence, reference
    NL_EU_N_main.py:141-162) instead of its duals/plans drifting while the
    vmapped while_loop keeps running for a slower lane."""
    from colaborativempc_tpu.config import x0_database

    cfg = nl_cfg(n_agents=3, N=10)
    track = make_track(cfg.map_type)
    x0_a = np.asarray(x0_database(cfg.n_agents))
    x0_b = x0_a.copy()
    x0_b[:, 0] += 0.5          # faster fleet: different coupling pressure
    state_a = init_nl_fleet(track, cfg, x0_a)
    state_b = init_nl_fleet(track, cfg, x0_b)

    step = make_nl_ocd_step(track, cfg)
    refs = []
    for st in (state_a, state_b):
        its = []
        for _ in range(2):
            st, m = step(st)
            its.append(int(m.ocd_iterations))
        refs.append((st, its))

    bst = jax.tree.map(lambda a, b: jnp.stack([a, b]), state_a, state_b)
    vstep = jax.jit(jax.vmap(step))
    b_its = []
    for _ in range(2):
        bst, bm = vstep(bst)
        b_its.append(np.asarray(bm.ocd_iterations))

    for lane, (st_ref, its_ref) in enumerate(refs):
        err = np.abs(np.asarray(bst.x_pred[lane])
                     - np.asarray(st_ref.x_pred)).max()
        assert err < 1e-5, (lane, err)
        lam_err = np.abs(np.asarray(bst.lambdas[lane])
                         - np.asarray(st_ref.lambdas)).max()
        assert lam_err < 1e-5, (lane, lam_err)
        assert [int(b[lane]) for b in b_its] == its_ref, lane


def test_nl_battery_sweep():
    """The vmapped NL-OCD battery (reference experiment_battery.py:15-38
    sweeps the NL pipeline) advances every gain config in lock-step; each
    lane's trajectory and OCD depth equal a standalone run of that config."""
    from colaborativempc_tpu.runtime.battery import gain_grid, run_nl_battery
    from colaborativempc_tpu.runtime.ocd import make_nl_ocd_rollout

    cfg = nl_cfg(n_agents=2, N=10)
    grid = gain_grid(nl_gains(), q_vx=[-0.2, -0.6],
                     q_ey=[300.0, 600.0], wq=[0.0, 0.2])
    assert len(grid) == 8
    steps = 5
    res = run_nl_battery(cfg, grid, steps=steps)

    assert res.states.shape == (steps, 8, cfg.n_agents, 9)
    assert res.ocd_iterations.shape == (steps, 8)
    assert res.feasible.all()
    assert (res.progress > 0.1).all()

    # lane 3 must equal a standalone rollout with that exact gain config
    k = 3
    cfg_k = nl_cfg(n_agents=2, N=10, gains=grid[k])
    track = make_track(cfg.map_type)
    _, (x0_h, _, m) = make_nl_ocd_rollout(track, cfg_k, steps)(
        init_nl_fleet(track, cfg_k))
    assert np.allclose(res.states[:, k], np.asarray(x0_h), atol=1e-5)
    assert np.array_equal(res.ocd_iterations[:, k],
                          np.asarray(m.ocd_iterations))


def test_nl_dynamic_lane():
    """NL-OCD with per-step dynamic lane selection: an agent started in
    Oval2's lane 1 (cfg.lane=0) is planned against lane-1 tables
    (reference set_lane/checkLane, track_initialization.py:302,418-436)."""
    import dataclasses
    from colaborativempc_tpu.config import x0_database
    from colaborativempc_tpu.geometry import select_lane
    from colaborativempc_tpu.runtime.ocd import make_nl_ocd_step

    cfg = nl_cfg(n_agents=1, N=10, map_type="Oval2", lane=0,
                 dynamic_lane=True)
    track = make_track(cfg.map_type)
    state = init_nl_fleet(track, dataclasses.replace(cfg, lane=1),
                          np.asarray(x0_database(1)))
    step = make_nl_ocd_step(track, cfg)
    for _ in range(4):
        state, metrics = step(state)
        assert np.asarray(metrics.feasible).all()
    lane, xloc = select_lane(track, state.x0[0])
    assert int(lane) == 1
    assert float(state.x0[0, 6]) > 0.05   # progressed along lane 1


def test_gauss_seidel_sweep():
    """ocd.sweep="gauss_seidel": agents solve in id order against the
    freshest neighbour plans (the deterministic counterpart of the
    reference ROS mode's asynchronous solve-when-neighbours-updated,
    OCD_ROS_main.py:178-241). Must converge to the same closed-loop
    behaviour as the Jacobi sweep, in no more coordination iterations."""
    cfg_j = nl_cfg(max_it=25)
    cfg_g = nl_cfg(max_it=25,
                   ocd=OCDConfig(max_it_ocd=30, sweep="gauss_seidel"))
    res_j = run_nl_experiment(cfg_j)
    res_g = run_nl_experiment(cfg_g)

    assert res_g.steps == 25
    assert res_g.feasible.all()
    assert res_g.min_dist_exec.min() > cfg_g.limits.min_dist * 0.8
    # both sweeps drive the fleet to the same coordinated fixed point
    assert np.abs(res_g.states - res_j.states).max() < 0.1
    # fresher neighbour data must not slow coordination down
    assert (res_g.ocd_iterations[3:].mean()
            <= res_j.ocd_iterations[3:].mean() + 0.5)


def test_gauss_seidel_hp_opt():
    """The Gauss-Seidel sweep composes with the hp_opt coupling (planes as
    decision variables flow through the sequential agent scan)."""
    cfg = nl_cfg(max_it=10, coupling="hp_opt",
                 ocd=OCDConfig(max_it_ocd=25, sweep="gauss_seidel"))
    res = run_nl_experiment(cfg)
    assert res.steps == 10
    assert res.feasible.all()
    assert res.min_dist_exec.min() > cfg.limits.min_dist * 0.8


def test_nl_hold_on_infeasible_containment():
    """The NL-OCD closed loop must not execute an above-tolerance plan:
    with hold_on_infeasible (default) a failed agent follows its previous
    plan one more stage (duals keep their updated values); with the flag
    off the unconverged iterate is executed (raw reference semantics,
    NL_EU_N_main.py:113-115)."""
    track = make_track("Highway")
    # a 2-iteration ADMM budget from a cold start cannot reach eps=1e-6
    base = dict(n_agents=2, N=10, dt=0.02, map_type="Highway",
                gains=nl_gains(), ocd=OCDConfig(max_it_ocd=4),
                solver=SolverConfig(admm_iters=2, eps=1e-6, epoch_len=2,
                                    sqp_iters=1))
    cfg_hold = ExperimentConfig(**base)
    cfg_raw = ExperimentConfig(**base, hold_on_infeasible=False)

    st0 = init_nl_fleet(track, cfg_hold)
    st_h, m_h = make_nl_ocd_step(track, cfg_hold)(st0)
    st_r, m_r = make_nl_ocd_step(track, cfg_raw)(st0)

    assert not bool(np.asarray(m_h.feasible).any())
    # held: the NEW x_pred is the initial plan shifted TWICE (once by the
    # hold, once by the control-step shift), x0 = initial plan stage 2
    x0_init = np.asarray(st0.x_pred)
    assert np.allclose(np.asarray(st_h.x0), x0_init[:, 2], atol=1e-6)
    # ADMM warm state kept at its pre-failure values (zeros from init)
    assert np.allclose(np.asarray(st_h.w), np.asarray(st0.w))
    assert np.asarray(st_h.hold_count).tolist() == [1, 1]
    # duals keep their UPDATED values (coordination knowledge persists)
    assert not np.allclose(np.asarray(st_h.lambdas),
                           np.asarray(st0.lambdas))
    # raw: the unconverged iterate was executed (differs from the hold)
    assert not np.allclose(np.asarray(st_r.x0), x0_init[:, 2], atol=1e-6)
    assert np.asarray(st_r.hold_count).tolist() == [0, 0]


def test_nl_hold_identity_on_feasible():
    """On feasible runs holding (and the escalation ladder) is the exact
    identity: hold_on_infeasible True vs False produce identical closed
    loops."""
    track = make_track("Highway")
    base = dict(n_agents=2, N=10, dt=0.02, map_type="Highway",
                gains=nl_gains(), ocd=OCDConfig(max_it_ocd=10),
                solver=SolverConfig(admm_iters=200, sqp_iters=2))
    step_a = make_nl_ocd_step(track, ExperimentConfig(**base))
    step_b = make_nl_ocd_step(
        track, ExperimentConfig(**base, hold_on_infeasible=False))
    st_a = st_b = init_nl_fleet(track, ExperimentConfig(**base))
    for _ in range(3):
        st_a, ma = step_a(st_a)
        st_b, mb = step_b(st_b)
        assert bool(np.asarray(ma.feasible).all())
        assert np.allclose(np.asarray(st_a.x_pred), np.asarray(st_b.x_pred))
        assert np.allclose(np.asarray(st_a.lambdas),
                           np.asarray(st_b.lambdas))
