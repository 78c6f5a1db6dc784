"""MPCC-style racing planner: progress maximisation + Pacejka physics.

The capability twin of the reference's native contouring controller
(``Matlab-tests/MPCC-master/C++``): a single-agent racing MPC that maximises
track progress subject to contouring accuracy, tire friction-ellipse and
slip-angle limits — built on this framework's Frenet formulation and
Riccati+ADMM engine instead of HPIPM.

Formulation notes vs the reference:
- The reference tracks a Cartesian path via contouring/lag errors computed
  against an arc-length spline with a virtual progress state (cost.cpp
  getContouringCost). In the Frenet formulation the contouring error IS the
  lateral error ey and progress IS the state s — exact, no Taylor
  approximation of the projection needed — so the cost reduces to a linear
  progress reward on s plus quadratic penalties on (ey, epsi) and input
  rates (the reference's q_c, q_l, q_beta analogues).
- Friction-ellipse and slip-angle constraints (constraints.cpp:57,117) are
  linearised per SQP iteration with autodiff and enter as soft rows.
- The SQP loop with solution mixing mirrors mpc.cpp:219-259.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from colaborativempc_tpu.dynamics.bicycle import NX, NU
from colaborativempc_tpu.dynamics.pacejka import (
    PacejkaParams, f_continuous_pacejka, linearize_pacejka,
    friction_ellipse_residual, slip_angle_residuals,
)
from colaborativempc_tpu.geometry import Track, curvature, halfwidth
from colaborativempc_tpu.ops import (
    LQRCost, LQRDynamics, StageQP, admm_solve,
)
from colaborativempc_tpu.planners.lpv import NZ, NC, _augment_dynamics

INF = jnp.inf


class MPCCGains(NamedTuple):
    """Racing cost weights (MPCC-master Params/cost.json analogues)."""
    q_progress: float = 1.0    # linear reward on s advance
    q_contour: float = 50.0    # ey^2
    q_heading: float = 5.0     # epsi^2
    q_vy: float = 0.1
    q_wz: float = 0.1
    r_delta: float = 0.1       # u^2
    r_drive: float = 0.1
    dr_delta: float = 5.0      # du^2
    dr_drive: float = 5.0
    w_soft: float = 1e4        # soft-constraint weight (track/tire rows)


class MPCCSolution(NamedTuple):
    x_pred: jnp.ndarray
    u_pred: jnp.ndarray
    feasible: jnp.ndarray
    r_prim: jnp.ndarray
    iterations: jnp.ndarray


def build_mpcc_qp(track: Track, gains: MPCCGains, p: PacejkaParams,
                  N: int, dt, x_bar: jnp.ndarray, u_bar: jnp.ndarray,
                  u_box=(0.35, 1.0), u_trust=(0.08, 0.3)) -> StageQP:
    """Assemble the racing stage QP around (x_bar, u_bar).

    u = [delta, D]; u_box = (|delta|max, |D|max) with D in [-0.1, Dmax]
    (reverse-drive excluded as in the reference bounds.json).
    """
    dtype = x_bar.dtype
    kappas = curvature(track, x_bar[:N, 6])
    Ad, Bd, rd = jax.vmap(
        lambda x, u, k: linearize_pacejka(x, u, k, p, dt))(
        x_bar[:N], u_bar, kappas)
    dyn = _augment_dynamics(Ad, Bd)
    dyn = dyn._replace(d=dyn.d.at[:, :NX].set(rd))

    # ---- cost ------------------------------------------------------------
    qdiag = jnp.zeros(NZ, dtype)
    qdiag = qdiag.at[1].set(2.0 * gains.q_vy)
    qdiag = qdiag.at[2].set(2.0 * gains.q_wz)
    qdiag = qdiag.at[3].set(2.0 * gains.q_contour)
    qdiag = qdiag.at[4].set(2.0 * gains.q_heading)
    qdiag = qdiag.at[NX + 0].set(2.0 * gains.r_delta)
    qdiag = qdiag.at[NX + 1].set(2.0 * gains.r_drive)
    Q = jnp.zeros((N + 1, NZ, NZ), dtype)
    Q = Q.at[1:].set(jnp.diag(qdiag))
    q = jnp.zeros((N + 1, NZ), dtype)
    q = q.at[1:, 6].set(-2.0 * gains.q_progress)   # maximise progress
    R = jnp.broadcast_to(
        jnp.diag(jnp.asarray([2.0 * gains.dr_delta, 2.0 * gains.dr_drive],
                             dtype)), (N, NC, NC))
    cost = LQRCost(Q=Q, q=q, R=R, r=jnp.zeros((N, NC), dtype),
                   S=jnp.zeros((N, NZ, NC), dtype))

    # ---- constraints -----------------------------------------------------
    m = 7
    D = jnp.zeros((N, m, NZ), dtype)
    E = jnp.zeros((N, m, NC), dtype)
    lo = jnp.full((N, m), -INF, dtype)
    hi = jnp.full((N, m), INF, dtype)
    soft_lo = jnp.full((N, m), INF, dtype)
    soft_hi = jnp.full((N, m), INF, dtype)

    F_, G_ = dyn.F, dyn.G
    d_ = dyn.d  # rows composed through the dynamics see x_{k+1} - d_k

    def next_state_rows(j):
        return F_[:, j, :], G_[:, j, :], d_[:, j]

    # track corridor on ey_{k+1}, soft both sides (constraints.cpp:30)
    ey_ub = halfwidth(track, x_bar[:N, 6], sm=0.95).astype(dtype)
    Dey, Eey, dey = next_state_rows(3)
    D = D.at[:, 0, :].set(Dey); E = E.at[:, 0, :].set(Eey)
    lo = lo.at[:, 0].set(-ey_ub - dey); hi = hi.at[:, 0].set(ey_ub - dey)
    soft_lo = soft_lo.at[:, 0].set(gains.w_soft)
    soft_hi = soft_hi.at[:, 0].set(gains.w_soft)

    # input boxes with SQP trust region
    lo_d = jnp.maximum(-u_box[0], u_bar[:, 0] - u_trust[0])
    hi_d = jnp.minimum(u_box[0], u_bar[:, 0] + u_trust[0])
    lo_D = jnp.maximum(-0.1, u_bar[:, 1] - u_trust[1])
    hi_D = jnp.minimum(u_box[1], u_bar[:, 1] + u_trust[1])
    D = D.at[:, 1, NX + 0].set(1.0); E = E.at[:, 1, 0].set(1.0)
    lo = lo.at[:, 1].set(lo_d.astype(dtype))
    hi = hi.at[:, 1].set(hi_d.astype(dtype))
    D = D.at[:, 2, NX + 1].set(1.0); E = E.at[:, 2, 1].set(1.0)
    lo = lo.at[:, 2].set(lo_D.astype(dtype))
    hi = hi.at[:, 2].set(hi_D.astype(dtype))

    # tire rows, linearised at (x_bar_k, u_bar_k): value + g.(x - x_bar)
    # + gu.(u - u_bar) <= 0  ->  g.x + gu.u <= g.x_bar + gu.u_bar - value
    def tire_rows(x, u):
        def fe(xx, uu):
            return friction_ellipse_residual(xx, uu, p)

        def sa(xx, uu):
            return slip_angle_residuals(xx, uu, p)

        vals = jnp.concatenate([fe(x, u)[None], sa(x, u)])
        gx = jnp.concatenate([jax.jacfwd(fe, 0)(x, u)[None],
                              jax.jacfwd(sa, 0)(x, u)])
        gu = jnp.concatenate([jax.jacfwd(fe, 1)(x, u)[None],
                              jax.jacfwd(sa, 1)(x, u)])
        return vals, gx, gu

    vals, gx, gu = jax.vmap(tire_rows)(x_bar[:N], u_bar)  # (N,3),(N,3,9),(N,3,2)
    bound = (-vals
             + jnp.einsum("kri,ki->kr", gx, x_bar[:N])
             + jnp.einsum("kri,ki->kr", gu, u_bar))
    for rr in range(3):
        row = 4 + rr - 1  # rows 3, 4, 5
        D = D.at[:, row, :NX].set(gx[:, rr, :].astype(dtype))
        D = D.at[:, row, NX:].set(gu[:, rr, :].astype(dtype))
        E = E.at[:, row, :].set(gu[:, rr, :].astype(dtype))
        hi = hi.at[:, row].set(bound[:, rr].astype(dtype))
        soft_hi = soft_hi.at[:, row].set(gains.w_soft)

    # vx >= 0 (keep the car moving forward), soft
    Dv, Ev, dv = next_state_rows(0)
    D = D.at[:, 6, :].set(Dv); E = E.at[:, 6, :].set(Ev)
    lo = lo.at[:, 6].set(0.05 - dv)
    soft_lo = soft_lo.at[:, 6].set(gains.w_soft)

    return StageQP(dyn=dyn, cost=cost, D=D, E=E, lo=lo, hi=hi,
                   soft_lo=soft_lo, soft_hi=soft_hi)


def mpcc_solve(track: Track, gains: MPCCGains, p: PacejkaParams,
               N: int, dt, x0: jnp.ndarray, x_bar: jnp.ndarray,
               u_bar: jnp.ndarray, u_old: jnp.ndarray,
               sqp_iters: int = 3, sqp_mix: float = 0.7,
               admm_iters: int = 200, rho: float = 10.0) -> MPCCSolution:
    """SQP racing solve (the reference's runMPC loop, mpc.cpp:219-259)."""
    dtype = x_bar.dtype
    z0 = jnp.concatenate([x0, u_old]).astype(dtype)

    def sqp_iter(carry, _):
        x_lin, u_lin, w, y, rs = carry
        qp = build_mpcc_qp(track, gains, p, N, dt, x_lin, u_lin)
        sol = admm_solve(qp, z0, w0=w, y0=y, rho_scale0=rs,
                         iters=admm_iters, rho=rho)
        x_new = sol.z[:, :NX]
        u_new = sol.z[1:, NX:]
        x_mix = sqp_mix * x_new + (1.0 - sqp_mix) * x_lin
        u_mix = sqp_mix * u_new + (1.0 - sqp_mix) * u_lin
        return (x_mix, u_mix, sol.w, sol.y, sol.rho_scale), sol

    w0 = jnp.zeros((N, 7), dtype)
    y0 = jnp.zeros_like(w0)
    (x_fin, u_fin, _, _, _), sols = jax.lax.scan(
        sqp_iter, (x_bar, u_bar, w0, y0, jnp.ones((7,), dtype)),
        None, length=sqp_iters)
    last = jax.tree.map(lambda a: a[-1], sols)
    return MPCCSolution(x_pred=x_fin, u_pred=u_fin,
                        feasible=last.feasible, r_prim=last.r_prim,
                        iterations=jnp.sum(sols.iterations))
