"""Fleet initialisation and warm-start trajectory generation.

Reference: ``planner/lib/plan_lib/utilities/misc.py:155-210``
(``initialise_agents`` / ``predicted_vectors_generation``): a constant-
acceleration straight-ahead rollout in Frenet coordinates used to seed the
first MPC solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from colaborativempc_tpu.geometry import Track, frenet_to_cartesian


def warmstart_trajectory(track: Track, x0: jnp.ndarray, N: int, dt,
                         accel: float = 1.0, accel_rate: float = 0.0,
                         lane: int = 0):
    """Generate (N+1, 9) state and (N, 2) input warm-start trajectories.

    Holds vy, wz, ey, epsi at their initial values, integrates vx with a
    constant acceleration ramp and s with the running vx, then fills
    (X, Y, theta) from the track geometry — matching the reference's
    start-up predictor (misc.py:168-210, including its quirk of evaluating
    the pose at the previous stage's s).
    """
    vx0 = x0[0]
    ks = jnp.arange(N)
    acc = accel + accel_rate * ks
    vx = jnp.concatenate([vx0[None], vx0 + dt * jnp.cumsum(acc)])
    # s_{k+1} = s_k + vx_k dt. Unlike the reference (which zeroes S[0],
    # misc.py:175, discarding x0's s entry) we respect x0[6] so staggered
    # platoon starts (x0_database beyond 4 agents) stay separated.
    s = x0[6] + jnp.concatenate([jnp.zeros(1, vx.dtype),
                                 dt * jnp.cumsum(vx[:-1])])
    ey = jnp.full(N + 1, x0[3], vx.dtype)
    # reference evaluates stage k+1's pose at s_k (misc.py:206)
    s_pose = jnp.concatenate([s[:1], s[:-1]])
    X, Y, Theta = frenet_to_cartesian(track, s_pose, ey, lane)

    states = jnp.stack([
        vx,
        jnp.full(N + 1, x0[1], vx.dtype),
        jnp.full(N + 1, x0[2], vx.dtype),
        ey,
        jnp.full(N + 1, x0[4], vx.dtype),
        Theta,
        s,
        X,
        Y,
    ], axis=-1)
    inputs = jnp.zeros((N, 2), vx.dtype)
    return states, inputs


def initialise_agents(track: Track, x0s: jnp.ndarray, N: int, dt,
                      accel_rate: float = 0.0, lane: int = 0):
    """Warm-start every agent (reference misc.py:155-165).

    Args:
      x0s: (n_agents, 9) initial states.
    Returns:
      agents_xy: (N+1, n_agents, 2) — the (X, Y) exchange tensor,
      x_pred: (n_agents, N+1, 9), u_pred: (n_agents, N, 2).
    """
    x_pred, u_pred = jax.vmap(
        lambda x0: warmstart_trajectory(track, x0, N, dt,
                                        accel_rate=accel_rate,
                                        lane=lane))(x0s)
    agents_xy = jnp.swapaxes(x_pred[:, :, 7:9], 0, 1)
    return agents_xy, x_pred, u_pred
