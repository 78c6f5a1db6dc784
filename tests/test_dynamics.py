"""Dynamics tests: LPV embedding exactness, Jacobian consistency, integrators.

Mirrors the native reference's finite-difference model tests
(MPCC-master/C++/Tests/model_integrator_test.cpp) in spirit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colaborativempc_tpu.config import ModelParams
from colaborativempc_tpu.dynamics import (
    NX, NU, f_continuous, lpv_matrices, lpv_discrete_horizon,
    step_euler, step_rk4,
)

P = ModelParams()


def _rand_state(rng, vx_lo=0.5, vx_hi=4.0):
    x = rng.normal(size=NX) * 0.3
    x[0] = rng.uniform(vx_lo, vx_hi)
    x[3] = rng.uniform(-0.3, 0.3)  # keep 1 - ey*kappa well conditioned
    return x


def test_lpv_embedding_exact():
    """A(x) x + B(x) u must equal f(x, u) — the LPV form is exact."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        x = jnp.asarray(_rand_state(rng))
        u = jnp.asarray(rng.uniform(-0.3, 0.3, size=NU))
        k = rng.uniform(-0.5, 0.5)
        A, B = lpv_matrices(x, u, k, P)
        f = f_continuous(x, u, k, P)
        assert np.allclose(np.asarray(A @ x + B @ u), np.asarray(f), atol=1e-5)


def test_autodiff_jacobian_structure():
    """Autodiff Jacobian of f matches finite differences (SQP path soundness)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(_rand_state(rng))
    u = jnp.asarray(rng.uniform(-0.3, 0.3, size=NU))
    k = 0.2
    Jx = jax.jacfwd(lambda xx: f_continuous(xx, u, k, P))(x)
    eps = 1e-4
    for i in range(NX):
        dx = np.zeros(NX); dx[i] = eps
        fd = (np.asarray(f_continuous(x + dx, u, k, P))
              - np.asarray(f_continuous(x - dx, u, k, P))) / (2 * eps)
        assert np.allclose(np.asarray(Jx)[:, i], fd, atol=1e-2), i


def test_low_velocity_switch():
    rng = np.random.default_rng(2)
    x = _rand_state(rng)
    x[0] = 0.1  # below LOW_VEL_THRESH
    u = jnp.asarray([0.2, 0.5])
    A, B = lpv_matrices(jnp.asarray(x), u, 0.1, P)
    A = np.asarray(A); B = np.asarray(B)
    # tire terms zeroed
    assert A[0, 1] == 0 and A[0, 2] == 0
    assert A[1, 1] == 0 and A[1, 2] == 0
    assert A[2, 1] == 0 and A[2, 2] == 0
    assert B[0, 0] == 0
    # accel and kinematic terms remain
    assert B[0, 1] == 1.0
    assert not np.isnan(A).any()


def test_horizon_batching_matches_single():
    rng = np.random.default_rng(3)
    N = 7
    xs = jnp.asarray(np.stack([_rand_state(rng) for _ in range(N)]))
    us = jnp.asarray(rng.uniform(-0.3, 0.3, size=(N, NU)))
    ks = jnp.asarray(rng.uniform(-0.3, 0.3, size=N))
    Ad, Bd = lpv_discrete_horizon(xs, us, ks, 0.02, P)
    assert Ad.shape == (N, NX, NX) and Bd.shape == (N, NX, NU)
    A0, B0 = lpv_matrices(xs[0], us[0], ks[0], P)
    assert np.allclose(np.asarray(Ad[0]),
                       np.eye(NX) + 0.02 * np.asarray(A0), atol=1e-6)
    assert np.allclose(np.asarray(Bd[0]), 0.02 * np.asarray(B0), atol=1e-6)


def test_rk4_beats_euler():
    """RK4 at dt must be closer than Euler to a fine-stepped reference."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(_rand_state(rng, vx_lo=1.5))
    u = jnp.asarray([0.1, 1.0])
    k, dt = 0.3, 0.02
    x_fine = x
    for _ in range(100):
        x_fine = step_rk4(x_fine, u, k, dt / 100, P)
    e_euler = np.linalg.norm(np.asarray(step_euler(x, u, k, dt, P) - x_fine))
    e_rk4 = np.linalg.norm(np.asarray(step_rk4(x, u, k, dt, P) - x_fine))
    assert e_rk4 < e_euler
    assert e_rk4 < 1e-3
