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
