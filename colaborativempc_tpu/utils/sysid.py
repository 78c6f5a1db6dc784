"""Small analysis utilities from the reference's misc toolbox.

- ``regression``: ridge least-squares estimation of linear dynamics from
  recorded data (reference ``utilities/misc.py:51-74``), used for system
  identification of (A, B) from trajectories.
- ``gbellmf``: generalised bell membership function
  (``utilities/misc.py:129-141``).
"""

from __future__ import annotations

import jax.numpy as jnp


def regression(x: jnp.ndarray, u: jnp.ndarray, lamb: float):
    """Estimate x_{k+1} ~ A x_k + B u_k by ridge regression.

    Args:
      x: (T, n) states; u: (T, m) inputs; lamb: ridge coefficient.
    Returns: (A, B, error) where error stacks per-column (max, min)
    residuals — same contract as the reference.
    """
    Y = x[2:, :]
    X = jnp.hstack([x[1:-1, :], u[1:-1, :]])
    n = x.shape[1]
    Q = jnp.linalg.inv(X.T @ X + lamb * jnp.eye(X.shape[1]))
    W = Q @ (X.T @ Y)
    A = W.T[:, :n]
    B = W.T[:, n:]
    E = X @ W - Y
    return A, B, jnp.stack([E.max(axis=0), E.min(axis=0)])


def gbellmf(x, a, b, c):
    """Generalised bell membership 1 / (1 + ((x-c)/a)^(2b))."""
    t = ((x - c) / a) ** 2
    return jnp.where((t == 0) & (b == 0), 0.5,
                     jnp.where((t == 0) & (b < 0), 0.0,
                               1.0 / (1.0 + t ** b)))
