"""Open-loop model rollouts for validation and replay.

The reference validates its LPV discretisation by replaying recorded input
sequences through ``LPV_Model.sim`` (``distributedPlanner/LPV_val.py:77-94``,
driven by ``scripts/eval_LPV_model.py``). Because the LPV embedding is exact
(A(x) x + B(x) u == f(x, u)), that rollout is identical to explicit-Euler
integration of the nonlinear model — here one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colaborativempc_tpu.config.params import ModelParams
from colaborativempc_tpu.dynamics.bicycle import step_euler, step_rk4
from colaborativempc_tpu.geometry import Track, curvature


def rollout_euler(track: Track, x0: jnp.ndarray, us: jnp.ndarray, dt,
                  model: ModelParams = ModelParams()):
    """Euler rollout with per-step curvature lookup (LPV_Model.sim parity).

    Args:
      x0: (9,) initial state; us: (T, 2) inputs.
    Returns: (T+1, 9) trajectory.
    """
    def body(x, u):
        k = curvature(track, x[6])
        x_next = step_euler(x, u, k, dt, model)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_rk4(track: Track, x0: jnp.ndarray, us: jnp.ndarray, dt,
                model: ModelParams = ModelParams(), substeps: int = 1):
    """RK4 plant rollout (native reference analogue
    MPCC-master/C++/Model/integrator.cpp:55-68 simTimeStep)."""
    def body(x, u):
        def sub(x, _):
            k = curvature(track, x[6])
            return step_rk4(x, u, k, dt / substeps, model), None
        x_next, _ = jax.lax.scan(sub, x, None, length=substeps)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)
