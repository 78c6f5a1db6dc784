"""MPCC racing planner tests: Pacejka physics + progress maximisation.

Native reference analogue: MPCC-master/C++ closed-loop sim (main.cpp) and
its model/constraint unit tests (Tests/).
"""

import numpy as np
import jax
import jax.numpy as jnp

from colaborativempc_tpu.dynamics import (
    PacejkaParams, f_continuous_pacejka, tire_forces,
    friction_ellipse_residual, slip_angle_residuals, linearize_pacejka,
)
from colaborativempc_tpu.geometry import make_track, curvature
from colaborativempc_tpu.planners import MPCCGains, mpcc_solve

P = PacejkaParams()


def test_pacejka_forces_sane():
    x = jnp.asarray([1.0, 0.05, 0.1, 0, 0, 0, 0, 0, 0], jnp.float32)
    u = jnp.asarray([0.1, 0.5], jnp.float32)
    F_fy, F_ry, F_rx = tire_forces(x, u, P)
    # lateral forces bounded by the magic-formula peaks
    assert abs(float(F_fy)) <= P.Df + 1e-6
    assert abs(float(F_ry)) <= P.Dr + 1e-6
    # drivetrain pushes forward at positive duty
    assert float(F_rx) > 0


def test_pacejka_jacobian_matches_fd():
    """Autodiff linearisation vs finite differences (the reference
    hand-derives these, Tests/model_integrator_test.cpp)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=9) * 0.1 +
                    np.array([1.0, 0, 0, 0, 0, 0, 0, 0, 0]), jnp.float32)
    u = jnp.asarray([0.05, 0.4], jnp.float32)
    dt, kap = 0.02, 0.3
    Ad, Bd, rd = linearize_pacejka(x, u, kap, P, dt)
    eps = 1e-4
    for i in range(9):
        dx = np.zeros(9, np.float32); dx[i] = eps
        fp = x + dx + dt * f_continuous_pacejka(x + dx, u, kap, P)
        fm = x - dx + dt * f_continuous_pacejka(x - dx, u, kap, P)
        fd = np.asarray(fp - fm) / (2 * eps)
        assert np.allclose(np.asarray(Ad)[:, i], fd, atol=5e-2), i


def test_mpcc_closed_loop_races():
    """Closed loop: the racing planner accelerates, makes progress, stays
    inside the track band and respects the tire limits."""
    track = make_track("oval_mt")
    gains = MPCCGains()
    N, dt = 20, 0.05
    # initial state: slow roll at track start
    x = jnp.zeros(9, jnp.float32).at[0].set(0.5)
    # warm start: coast forward
    x_bar = jnp.stack([x + jnp.zeros(9)] * (N + 1))
    s_ramp = jnp.arange(N + 1, dtype=jnp.float32) * 0.5 * dt
    x_bar = x_bar.at[:, 6].set(s_ramp)
    u_bar = jnp.zeros((N, 2), jnp.float32).at[:, 1].set(0.2)
    u_old = jnp.zeros(2, jnp.float32)

    solve = jax.jit(lambda x0, xb, ub, uo: mpcc_solve(
        track, gains, P, N, dt, x0, xb, ub, uo))

    ss, eys, fes = [], [], []
    for _ in range(30):
        sol = solve(x, x_bar, u_bar, u_old)
        x = sol.x_pred[1]
        u_old = sol.u_pred[0]
        x_bar = jnp.concatenate([sol.x_pred[1:], sol.x_pred[-1:]])
        u_bar = jnp.concatenate([sol.u_pred[1:], sol.u_pred[-1:]])
        ss.append(float(x[6])); eys.append(float(x[3]))
        fes.append(float(friction_ellipse_residual(x, u_old, P)))
    assert ss[-1] > 0.8, ss[-1]            # raced forward
    assert (np.diff(ss) > -1e-3).all()     # monotone progress
    assert max(abs(e) for e in eys) < 0.5  # inside the track
    assert max(fes) < 0.005                # friction ellipse respected
