"""Native (C++) stack cross-validation against the JAX path.

The native library is an independent float64 implementation of the same
algorithm — agreement between the two is strong evidence both are right
(the strategy the reference applies by keeping a C++ MPCC twin of its
Python planners in-tree).
"""

import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from colaborativempc_tpu import native
from colaborativempc_tpu.config import (
    lpv_gains, ModelParams, SysLimits, x0_database,
)
from colaborativempc_tpu.geometry import make_track
from colaborativempc_tpu.planners.lpv import lpv_solve
from colaborativempc_tpu.utils import initialise_agents
from colaborativempc_tpu.utils.rollout import rollout_rk4

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_matches_jax_single_agent():
    track = make_track("oval")
    gains, lim, mp = lpv_gains(), SysLimits(), ModelParams()
    N, dt = 15, 0.025
    x0s = jnp.asarray(x0_database(1), jnp.float32)
    _, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
    x0 = x_pred[0][0]

    sol = lpv_solve(track, gains, lim, mp, N, dt, x0, x_pred[0], u_pred[0],
                    jnp.zeros(2), None, admm_iters=600, eps=1e-6)
    ok, x_nat, u_nat, resid = native.lpv_solve_native(
        track, gains, lim, mp, N, dt, np.asarray(x0),
        np.asarray(x_pred[0]), np.asarray(u_pred[0]), np.zeros(2))

    assert ok and bool(sol.feasible)
    assert np.allclose(x_nat, np.asarray(sol.x_pred), atol=3e-3), (
        np.abs(x_nat - np.asarray(sol.x_pred)).max())
    assert np.allclose(u_nat, np.asarray(sol.u_pred), atol=3e-3)


def test_native_matches_jax_multi_agent():
    track = make_track("Highway")
    gains, lim, mp = lpv_gains(), SysLimits(), ModelParams()
    N, dt = 12, 0.025
    x0s = jnp.asarray(x0_database(3), jnp.float32)
    agents_xy, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
    neigh = np.asarray(agents_xy[:, [1, 2], :], np.float64)

    sol = lpv_solve(track, gains, lim, mp, N, dt, x_pred[0][0], x_pred[0],
                    u_pred[0], jnp.zeros(2), jnp.asarray(neigh),
                    admm_iters=600, eps=1e-6)
    ok, x_nat, u_nat, _ = native.lpv_solve_native(
        track, gains, lim, mp, N, dt, np.asarray(x_pred[0][0]),
        np.asarray(x_pred[0]), np.asarray(u_pred[0]), np.zeros(2),
        neighbours_xy=neigh)

    assert ok and bool(sol.feasible)
    err = np.abs(x_nat - np.asarray(sol.x_pred)).max()
    assert err < 5e-3, err


def test_native_rk4_matches_jax():
    track = make_track("oval")
    mp = ModelParams()
    x0s = jnp.asarray(x0_database(1), jnp.float32)
    _, x_pred, _ = initialise_agents(track, x0s, 10, 0.02)
    x = np.asarray(x_pred[0][0], np.float64).copy()
    u = np.asarray([0.05, 1.0])

    lib = native.load()
    seg, length, open_flag = native.track_table(track)
    for _ in range(20):
        lib.cmpc_step_rk4(seg.shape[0], native._cptr(seg), length, open_flag,
                          native._cptr(x), native._cptr(u), 0.02,
                          native._cptr(np.asarray(
                              [mp.lf, mp.lr, mp.m, mp.I, mp.Cf, mp.Cr,
                               mp.mu])))
    xj = np.asarray(rollout_rk4(track, x_pred[0][0],
                                jnp.tile(jnp.asarray(u, jnp.float32),
                                         (20, 1)), 0.02))[-1]
    assert np.allclose(x, xj, atol=2e-3), np.abs(x - xj).max()


def test_native_sim_binary(tmp_path):
    """The closed-loop sim binary runs a 3-agent experiment and reports
    solve times (the reference MPCC main.cpp contract)."""
    track = make_track("Highway")
    csv = str(tmp_path / "highway.csv")
    native.export_track_csv(track, csv)
    binary = native.build().replace("libcmpc.so", "cmpc_sim")
    out = subprocess.run([binary, csv, "3", "15", "30", "0.025"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "feasible=1" in out.stdout
    assert "solve time" in out.stdout


def test_native_sim_binary_nl_ocd(tmp_path):
    """The sim binary's "nl" mode drives the full OCD dual-coordination
    loop on the nonlinear SQP planners (native twin of runtime/ocd.py;
    reference NL_EU_N_main.py closed loop)."""
    track = make_track("Highway")
    csv = str(tmp_path / "highway.csv")
    native.export_track_csv(track, csv)
    binary = native.build().replace("libcmpc.so", "cmpc_sim")
    out = subprocess.run([binary, csv, "3", "15", "25", "0.02", "400", "nl"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "feasible=1" in out.stdout
    assert "mean_ocd_it=" in out.stdout
    # separation must be held at the end of the run
    dist = float(out.stdout.split("final_min_dist=")[1].split()[0])
    assert dist > 0.2, out.stdout
    # coordination depth in the reference's regime (OCD_it mean ~4-7)
    ocd = float(out.stdout.split("mean_ocd_it=")[1].split()[0])
    assert ocd < 15, out.stdout


def test_native_nl_matches_jax():
    """Native NL-SQP sub-problem vs the JAX path on identical inputs
    (Euclidean coupling, mixed master/slave roles)."""
    from colaborativempc_tpu.config import nl_gains
    from colaborativempc_tpu.planners.nl import nl_solve

    track = make_track("Highway")
    gains, lim, mp = nl_gains(), SysLimits(), ModelParams()
    N, dt = 12, 0.02
    x0s = jnp.asarray(x0_database(3), jnp.float32)
    agents_xy, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
    # ego = agent 1: master towards 2, slave towards 0
    neigh_full = np.asarray(agents_xy[:, [0, 2], :], np.float64)
    master = np.array([0, 1], np.int32)
    lam = np.full((2, N), 0.3)

    sol = nl_solve(track, gains, lim, mp, N, dt, x_pred[1][0], x_pred[1],
                   u_pred[1], jnp.zeros(2), jnp.asarray(lam),
                   jnp.asarray(neigh_full),
                   jnp.asarray(master, jnp.float32),
                   sqp_iters=2, sqp_mix=0.7, admm_iters=400, eps=1e-6)
    ok, x_nat, u_nat, resid = native.nl_solve_native(
        track, gains, lim, mp, N, dt, np.asarray(x_pred[1][0]),
        np.asarray(x_pred[1]), np.asarray(u_pred[1]), np.zeros(2),
        lam, neigh_full[1:], master, sqp_iters=2, mix=0.7, admm_iters=400)

    assert ok and bool(sol.feasible)
    err = np.abs(x_nat - np.asarray(sol.x_pred)).max()
    assert err < 1e-2, err
    err_u = np.abs(u_nat - np.asarray(sol.u_pred)).max()
    assert err_u < 1e-2, err_u


def test_native_races_fitted_track():
    """The native twin consumes spline-fitted (measured-centerline) tracks
    transparently: `track_table` exports the same lane-major segment table
    whether the Track came from the analytic database or from
    geometry/spline.py fit_centerline — cross-validated against the JAX
    solve on the fitted geometry."""
    from colaborativempc_tpu.geometry.spline import fit_centerline

    # sample a noisy oval centerline like a recorded drive
    ref = make_track("oval")
    s = np.linspace(0.0, float(ref.track_length[0]) - 1e-3, 160)
    from colaborativempc_tpu.geometry import frenet_to_cartesian
    xs, ys, _ = frenet_to_cartesian(ref, jnp.asarray(s), jnp.zeros(len(s)))
    rng = np.random.default_rng(7)
    xs = np.asarray(xs) + rng.normal(size=len(s)) * 0.003
    ys = np.asarray(ys) + rng.normal(size=len(s)) * 0.003
    track = fit_centerline(xs, ys, halfwidth=0.5, closed=True,
                           n_segments=400)

    gains, lim, mp = lpv_gains(), SysLimits(), ModelParams()
    N, dt = 12, 0.025
    x0s = jnp.asarray(x0_database(1), jnp.float32)
    _, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
    x0 = x_pred[0][0]

    sol = lpv_solve(track, gains, lim, mp, N, dt, x0, x_pred[0], u_pred[0],
                    jnp.zeros(2), None, admm_iters=600, eps=1e-6)
    ok, x_nat, u_nat, _ = native.lpv_solve_native(
        track, gains, lim, mp, N, dt, np.asarray(x0),
        np.asarray(x_pred[0]), np.asarray(u_pred[0]), np.zeros(2))

    assert ok and bool(sol.feasible)
    err = np.abs(x_nat - np.asarray(sol.x_pred)).max()
    assert err < 5e-3, err


def test_native_mpcc_solve_matches_jax():
    """Native MPCC racing solve (FD-linearised Pacejka, float64) vs the JAX
    mpcc_solve (autodiff, float32) on identical inputs."""
    from colaborativempc_tpu.dynamics import PacejkaParams
    from colaborativempc_tpu.planners.mpcc import (
        MPCCGains, MPCCBounds, mpcc_solve,
    )
    track = make_track("oval_mt")
    g, b, p = MPCCGains(), MPCCBounds(), PacejkaParams()
    N, dt = 16, 0.05
    x = jnp.zeros(9, jnp.float32).at[0].set(0.6)
    x_bar = jnp.stack([x] * (N + 1))
    x_bar = x_bar.at[:, 6].set(
        jnp.arange(N + 1, dtype=jnp.float32) * 0.6 * dt)
    u_bar = jnp.zeros((N, 2), jnp.float32).at[:, 1].set(0.25)
    u_old = jnp.zeros(2, jnp.float32)

    sol = mpcc_solve(track, g, p, N, dt, x, x_bar, u_bar, u_old,
                     sqp_iters=3, sqp_mix=0.7, admm_iters=300, bounds=b,
                     norm=None)
    ok, x_nat, u_nat, resid = native.mpcc_solve_native(
        track, g, b, p, N, dt, np.asarray(x), np.asarray(x_bar),
        np.asarray(u_bar), np.asarray(u_old), sqp_iters=3, mix=0.7,
        admm_iters=300)
    assert ok and bool(sol.feasible)
    err_x = np.abs(np.asarray(sol.x_pred) - x_nat).max()
    err_u = np.abs(np.asarray(sol.u_pred) - u_nat).max()
    assert err_x <= 5e-3, err_x
    assert err_u <= 5e-3, err_u


def test_native_mpcc_race_matches_jax_driver():
    """Full closed-loop native race (cold start + warm shift + failure
    bookkeeping + RK4 plant) tracks the JAX run_mpcc_experiment: same
    progress within 2%, both feasible throughout."""
    from colaborativempc_tpu.planners.mpcc import MPCCConfig
    from colaborativempc_tpu.runtime.racing import run_mpcc_experiment
    from colaborativempc_tpu.dynamics import PacejkaParams
    from colaborativempc_tpu.planners.mpcc import MPCCGains, MPCCBounds

    track = make_track("oval_mt")
    N, dt, steps = 16, 0.05, 50
    cfg = MPCCConfig(N=N, dt=dt, n_sim=steps, map_type="oval_mt",
                     initial_velocity=0.5, verb=0)
    res = run_mpcc_experiment(cfg, track=track)

    t, xs, us, feas = native.mpcc_race_native(
        track, MPCCGains(), MPCCBounds(), PacejkaParams(), N=N, dt=dt,
        steps=steps, v0=0.5, n_sqp=cfg.n_sqp, mix=cfg.sqp_mixing,
        admm_iters=300)
    assert t == steps
    assert feas.all() and res.feasible.all()
    s_jax = float(res.states[-1, 6])
    s_nat = float(xs[-1, 6])
    assert abs(s_jax - s_nat) < 0.02 * max(s_jax, 1.0), (s_jax, s_nat)
    # corridor respected on both sides
    assert np.abs(xs[:, 3]).max() < 0.25


def test_native_mpcc_sim_binary(tmp_path):
    """cmpc_sim's mpcc mode (the reference main.cpp's own entry) races."""
    track = make_track("oval_mt")
    csv = str(tmp_path / "track.csv")
    native.export_track_csv(track, csv)
    out = subprocess.run(
        [native._NATIVE_DIR + "/build/cmpc_sim", csv, "1", "12", "30",
         "0.05", "300", "mpcc"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "mpcc: steps=30" in out.stdout
    assert "feasible=30/30" in out.stdout


def test_native_sep_filter_matches_jax():
    """The native safety-filter betas (include/cmpc/safety.h) equal the
    JAX filter (runtime/simulate.py _sep_filter_beta) on random fleets,
    and both honour the non-worsening floor guarantee."""
    import jax.numpy as jnp
    from colaborativempc_tpu.native import available, sep_filter_native
    from colaborativempc_tpu.runtime.simulate import _sep_filter_beta
    if not available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    floor = 0.175
    for _ in range(100):
        n = int(rng.integers(2, 6))
        p0 = rng.uniform(-2.0, 2.0, (n, 2))
        p1 = p0 + rng.uniform(-0.2, 0.2, (n, 2))
        prio = rng.uniform(0.0, 30.0, n)
        b_nat = sep_filter_native(p0, p1, prio, floor)
        b_jax = np.asarray(_sep_filter_beta(
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            floor, prio=jnp.asarray(prio, jnp.float32)))
        assert np.allclose(b_nat, b_jax, atol=2e-3), (b_nat, b_jax)
        p = p0 + b_nat[:, None] * (p1 - p0)
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1) \
            + np.eye(n) * 1e9
        d0 = np.linalg.norm(p0[:, None] - p0[None, :], axis=-1) \
            + np.eye(n) * 1e9
        assert (d >= np.minimum(floor, d0) - 1e-6).all()
