"""Inequality-constrained stage QP via ADMM with Riccati inner solves.

The on-device replacement for OSQP (reference ``LPV_Planner.py:192-249``):
an operator-splitting QP solver whose linear-system step exploits the MPC
banded structure through the Riccati factorisation in ops/lqr.py instead of a
sparse LDL^T. Everything is jittable with static shapes, runs a fixed maximum
iteration count (``lax.while_loop`` with residual-based early exit), and
vmaps over agents/scenario batches — the batch dimension is what fills the
TPU's vector lanes.

Problem:

    min   sum_k stage_cost(z_k, c_k)        (LQRCost quadratics)
    s.t.  z_{k+1} = F_k z_k + G_k c_k + d_k,   z_0 fixed
          lo_k <= D_k z_k + E_k c_k <= hi_k    (per-stage, stage-local)

Splitting:  v = Dz + Ec,  min J(z,c) + I_[lo,hi](w)  s.t. v = w.

Per iteration (scaled dual y, over-relaxation alpha):
    (z, c) <- argmin J + rho/2 || Dz + Ec - w + y ||^2      (Riccati solve)
    v      <- Dz + Ec;   vhat <- alpha v + (1-alpha) w
    w      <- clip(vhat + y, lo, hi)
    y      <- y + vhat - w

Because the quadratic augmentation rho (D'D, E'E, D'E) is constant, the
Riccati factorisation is computed once per solve; each ADMM iteration costs
only the affine backward/forward passes — the same factor-once/iterate-cheap
economics as OSQP's KKT approach, but scan-structured for XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from colaborativempc_tpu.ops.lqr import (
    LQRCost, LQRDynamics, LQRFactors, lqr_factorize, lqr_affine_solve,
)


class StageQP(NamedTuple):
    """A stage-structured QP: LQR data + per-stage inequality rows."""
    dyn: LQRDynamics
    cost: LQRCost
    D: jnp.ndarray    # (N, m, nz)
    E: jnp.ndarray    # (N, m, nc)
    lo: jnp.ndarray   # (N, m)
    hi: jnp.ndarray   # (N, m)


class ADMMState(NamedTuple):
    z: jnp.ndarray          # (N+1, nz)
    c: jnp.ndarray          # (N, nc)
    w: jnp.ndarray          # (N, m) projected constraint values
    y: jnp.ndarray          # (N, m) scaled duals
    it: jnp.ndarray         # iterations executed
    r_prim: jnp.ndarray     # max |v - w|
    r_dual: jnp.ndarray     # rho * max |w - w_prev|


class ADMMSolution(NamedTuple):
    z: jnp.ndarray
    c: jnp.ndarray
    w: jnp.ndarray
    y: jnp.ndarray
    iterations: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    feasible: jnp.ndarray   # primal residual below tolerance at exit


def _active_rows(qp: StageQP) -> jnp.ndarray:
    """Mask of rows with at least one finite bound; fully unbounded rows are
    excluded from the splitting so they add no proximal damping."""
    return (jnp.isfinite(qp.lo) | jnp.isfinite(qp.hi)).astype(qp.D.dtype)


def build_admm_cost(qp: StageQP, rho: float) -> LQRCost:
    """Quadratic cost augmented with the constant rho-penalty terms."""
    mask = _active_rows(qp)
    D = qp.D * mask[..., None]
    E = qp.E * mask[..., None]
    DtD = jnp.einsum("kmi,kmj->kij", D, D)
    EtE = jnp.einsum("kmi,kmj->kij", E, E)
    DtE = jnp.einsum("kmi,kmj->kij", D, E)
    Q = qp.cost.Q.at[:-1].add(rho * DtD)
    R = qp.cost.R + rho * EtE
    S = qp.cost.S + rho * DtE
    return LQRCost(Q=Q, q=qp.cost.q, R=R, r=qp.cost.r, S=S)


def admm_solve(qp: StageQP, z0: jnp.ndarray,
               w0: Optional[jnp.ndarray] = None,
               y0: Optional[jnp.ndarray] = None,
               iters: int = 60, rho: float = 10.0, alpha: float = 1.6,
               eps: float = 1e-4, reg: float = 1e-8,
               fac: Optional[LQRFactors] = None,
               aug_cost: Optional[LQRCost] = None) -> ADMMSolution:
    """Solve the stage QP. ``w0``/``y0`` warm-start the splitting variables
    (pass the previous MPC step's values, shifted — the analogue of OSQP
    ``warm_start``, reference LPV_Planner.py:237-238).

    ``fac``/``aug_cost`` allow reusing the factorisation when the caller
    solves the same quadratic repeatedly (e.g. SQP inner loops with unchanged
    linearisation).
    """
    N, m = qp.lo.shape

    if aug_cost is None:
        aug_cost = build_admm_cost(qp, rho)
    if fac is None:
        fac = lqr_factorize(qp.dyn, aug_cost, reg)

    if w0 is None:
        w0 = jnp.clip(jnp.zeros((N, m), z0.dtype), qp.lo, qp.hi)
    if y0 is None:
        y0 = jnp.zeros((N, m), z0.dtype)

    mask = _active_rows(qp)
    Dm = qp.D * mask[..., None]
    Em = qp.E * mask[..., None]

    def constraint_eval(z, c):
        return (jnp.einsum("kmi,ki->km", Dm, z[:-1])
                + jnp.einsum("kmi,ki->km", Em, c))

    def iteration(state: ADMMState) -> ADMMState:
        # z-step: linear terms from the penalty rho/2 ||v - w + y||^2
        t = state.y - state.w                       # (N, m)
        q_pen = rho * jnp.einsum("kmi,km->ki", Dm, t)
        r_pen = rho * jnp.einsum("kmi,km->ki", Em, t)
        q = aug_cost.q.at[:-1].add(q_pen)
        r = aug_cost.r + r_pen
        z, c = lqr_affine_solve(qp.dyn, fac, q, r, z0)

        v = constraint_eval(z, c)
        vhat = alpha * v + (1.0 - alpha) * state.w
        w = jnp.clip(vhat + state.y, qp.lo, qp.hi)
        y = state.y + vhat - w

        r_prim = jnp.max(jnp.abs(v - w))
        r_dual = rho * jnp.max(jnp.abs(w - state.w))
        return ADMMState(z=z, c=c, w=w, y=y, it=state.it + 1,
                         r_prim=r_prim, r_dual=r_dual)

    def cond(state: ADMMState):
        not_conv = (state.r_prim > eps) | (state.r_dual > eps)
        return (state.it < iters) & (not_conv | (state.it < 2))

    nz = qp.dyn.F.shape[-1]
    nc = qp.dyn.G.shape[-1]
    big = jnp.asarray(jnp.inf, z0.dtype)
    init = ADMMState(
        z=jnp.zeros((N + 1, nz), z0.dtype), c=jnp.zeros((N, nc), z0.dtype),
        w=w0, y=y0, it=jnp.asarray(0), r_prim=big, r_dual=big)

    out = jax.lax.while_loop(cond, iteration, init)
    return ADMMSolution(z=out.z, c=out.c, w=out.w, y=out.y,
                        iterations=out.it, r_prim=out.r_prim,
                        r_dual=out.r_dual,
                        feasible=out.r_prim < 10 * eps)
