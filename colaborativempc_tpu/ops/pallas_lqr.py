"""Pallas TPU kernel for the batched LQR affine pass.

The ADMM inner iteration is dominated by the affine backward/forward
Riccati sweeps (ops/lqr.py lqr_affine_solve). Under vmap+lax.scan, XLA
executes the N-stage loop as ~N sequential micro-steps whose per-step work
(11x11 matvecs) is far too small to hide loop overhead — measured ~4 us per
stage at batch 64 on v5e, i.e. the solver is loop-latency-bound, not
FLOP- or HBM-bound.

This kernel restructures the computation for the VPU:
- the BATCH dimension is laid out on the 128-wide lane axis, so every
  scalar recurrence op processes a full batch block per cycle;
- all stage data for one batch block lives in VMEM for the whole sweep
  (fits comfortably for the bicycle-model sizes at N <= ~48; fall back to
  the XLA scan beyond);
- the sequential chain runs as an in-kernel fori_loop over stages with the
  costate carried in registers.

The contraction uses an explicit broadcast-multiply-reduce over the 11-dim
state axis (sublane tiles), which Mosaic lowers to a handful of VPU FMAs
per stage.

API: batched counterpart of ``lqr_affine_solve`` — arrays carry a leading
batch axis; Quu^{-1} is passed explicitly (nc is tiny, so the dense inverse
is exact and cheap) instead of Cholesky factors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _affine_kernel(F, G, d, K, Quu_inv, Qxu, m, q, r, z0,
                   z_out, c_out, kff_scr):
    """One batch block. Shapes (per block, B = LANES on the last axis):
    F (N,nz,nz,B), G (N,nz,nc,B), d (N,nz,B), K (N,nc,nz,B),
    Quu_inv (N,nc,nc,B), Qxu (N,nz,nc,B), m (N,nz,B), q (N+1,nz,B),
    r (N,nc,B), z0 (nz,B); z_out (N+1,nz,B), c_out (N,nc,B).
    """
    N = F.shape[0]

    def mv(A, x):           # (i,j,B),(j,B) -> (i,B): sum_j A[i,j]x[j]
        return jnp.sum(A * x[None, :, :], axis=1)

    def mv_T(A, x):         # (j,i,B),(j,B) -> (i,B): sum_j A[j,i]x[j]
        return jnp.sum(A * x[:, None, :], axis=0)

    # backward costate sweep: p_k = q_k + F'(p+ + m) + Qxu kff
    def bwd(i, p):
        k = N - 1 - i
        t = p + m[k]
        Qu = r[k] + mv_T(G[k], t)
        kff = -mv(Quu_inv[k], Qu)
        kff_scr[k] = kff
        return q[k] + mv_T(F[k], t) + mv(Qxu[k], kff)

    jax.lax.fori_loop(0, N, bwd, q[N], unroll=False)

    # forward closed-loop rollout
    z_out[0] = z0[:]

    def fwd(k, z):
        c = mv(K[k], z) + kff_scr[k]
        c_out[k] = c
        z_next = mv(F[k], z) + mv(G[k], c) + d[k]
        z_out[k + 1] = z_next
        return z_next

    jax.lax.fori_loop(0, N, fwd, z0[:], unroll=False)


def _to_lanes(a, B):
    """(B, ...) -> (..., B) with B padded to LANES."""
    pad = (-B) % LANES
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return jnp.moveaxis(a, 0, -1)


def _admm_epoch_kernel(F, G, d, K, Quu_inv, Qxu, fm, q, r,
                       D, E, lo, hi, rv, fac_lo, fac_hi, z0, w0, y0,
                       z_out, c_out, w_out, y_out, rp_out, rd_out,
                       kff_scr, *, epoch_len: int, alpha: float):
    """A full ADMM epoch (``epoch_len`` iterations) for one batch block,
    entirely in VMEM. Iteration semantics are EXACTLY ``ops/admm.py``'s
    epoch body (same splitting, over-relaxation, soft-row prox shrinkage and
    per-row-class residuals); the fixed per-epoch data comes from
    ``admm_epoch_inputs``. Shapes as in ``_affine_kernel`` plus the
    constraint block: D (N,mr,nz,B), E (N,mr,nc,B), lo/hi/rv/fac_lo/fac_hi/
    w/y (N,mr,B); rp/rd out (mr,B).
    """
    N = F.shape[0]

    def mv(A, x):           # (i,j,B),(j,B) -> (i,B)
        return jnp.sum(A * x[None, :, :], axis=1)

    def mv_T(A, x):         # (j,i,B),(j,B) -> (i,B)
        return jnp.sum(A * x[:, None, :], axis=0)

    Dv, Ev = D[:], E[:]
    lov, hiv = lo[:], hi[:]
    rvv = rv[:]
    flo, fhi = fac_lo[:], fac_hi[:]
    mask = (rvv > 0).astype(Dv.dtype)
    z0v = z0[:]
    qN = q[N]

    def admm_iter(_, carry):
        w, y = carry
        t = rvv * (y - w)                                   # (N,mr,B)
        q_pen = jnp.sum(Dv * t[:, :, None, :], axis=1)      # (N,nz,B)
        r_pen = jnp.sum(Ev * t[:, :, None, :], axis=1)      # (N,nc,B)

        def bwd(i, p):
            k = N - 1 - i
            tt = p + fm[k]
            Qu = r[k] + r_pen[k] + mv_T(G[k], tt)
            kff = -mv(Quu_inv[k], Qu)
            kff_scr[k] = kff
            return q[k] + q_pen[k] + mv_T(F[k], tt) + mv(Qxu[k], kff)

        jax.lax.fori_loop(0, N, bwd, qN, unroll=False)

        z_out[0] = z0v

        def fwd(k, z):
            c = mv(K[k], z) + kff_scr[k]
            c_out[k] = c
            z_next = mv(F[k], z) + mv(G[k], c) + d[k]
            z_out[k + 1] = z_next
            return z_next

        jax.lax.fori_loop(0, N, fwd, z0v, unroll=False)

        zs = z_out[:]                                       # (N+1,nz,B)
        cs = c_out[:]
        v = (jnp.sum(Dv * zs[:N][:, None, :, :], axis=2)
             + jnp.sum(Ev * cs[:, None, :, :], axis=2))     # (N,mr,B)
        vhat = alpha * v + (1.0 - alpha) * w
        wbar = vhat + y
        w_new = jnp.where(wbar > hiv, hiv + fhi * (wbar - hiv), wbar)
        w_new = jnp.where(wbar < lov, lov + flo * (wbar - lov), w_new)
        y_new = y + vhat - w_new
        rp_out[:] = jnp.max(jnp.abs(mask * (v - w_new)), axis=0)
        rd_out[:] = jnp.max(jnp.abs(mask * (w_new - w)), axis=0)
        return (w_new, y_new)

    w, y = jax.lax.fori_loop(0, epoch_len, admm_iter, (w0[:], y0[:]),
                             unroll=False)
    w_out[:] = w
    y_out[:] = y


@partial(jax.jit, static_argnames=("epoch_len", "alpha", "interpret"))
def admm_epoch_batched(data, z0, w0, y0, *, epoch_len: int = 25,
                       alpha: float = 1.6, interpret: bool = False):
    """Run a full ADMM epoch for a BATCH of stage QPs on TPU via Pallas —
    the whole epoch (factor-reuse affine solves + prox + dual updates)
    stays VMEM-resident per batch block, eliminating the per-iteration
    HBM round-trips and loop-dispatch latency of the XLA scan.

    Args:
      data: ``ops/admm.py ADMMEpochData`` with a leading batch axis B on
        every field (stack/vmap of ``admm_epoch_inputs`` outputs).
      z0 (B,nz), w0/y0 (B,N,mr): initial state / splitting warm starts.
    Returns:
      z (B,N+1,nz), c (B,N,nc), w (B,N,mr), y (B,N,mr),
      r_prim (B,mr), r_dual (B,mr)  — the last iteration's per-row-class
      residuals, as in ``admm_solve``.
    """
    F = data.F
    B = F.shape[0]
    N, nz = F.shape[1], F.shape[2]
    nc = data.G.shape[3]
    mr = data.lo.shape[2]
    nb = -(-B // LANES)

    fields = [data.F, data.G, data.d, data.K, data.Quu_inv, data.Qxu,
              data.m, data.q, data.r, data.D, data.E, data.lo, data.hi,
              data.rv, data.fac_lo, data.fac_hi, z0, w0, y0]
    args = [_to_lanes(a, B) for a in fields]

    grid = (nb,)

    def spec(shape):
        ndim = len(shape)
        blk = shape[:-1] + (LANES,)
        return pl.BlockSpec(
            blk, lambda i, nd=ndim: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM)

    in_specs = [spec(a.shape) for a in args]
    out_shapes = [
        jax.ShapeDtypeStruct((N + 1, nz, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((N, nc, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((N, mr, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((N, mr, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((mr, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((mr, nb * LANES), F.dtype),
    ]
    out_specs = [spec(s.shape) for s in out_shapes]

    z, c, w, y, rp, rd = pl.pallas_call(
        partial(_admm_epoch_kernel, epoch_len=epoch_len, alpha=alpha),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((N, nc, LANES), F.dtype)],
        interpret=interpret,
    )(*args)

    unb = lambda a: jnp.moveaxis(a, -1, 0)[:B]  # noqa: E731
    return unb(z), unb(c), unb(w), unb(y), unb(rp), unb(rd)


@partial(jax.jit, static_argnames=("interpret",))
def lqr_affine_solve_batched(F, G, d, K, Quu_inv, Qxu, m, q, r, z0,
                             interpret: bool = False):
    """Batched affine LQR solve on TPU via Pallas.

    Args (leading batch axis B):
      F (B,N,nz,nz), G (B,N,nz,nc), d (B,N,nz), K (B,N,nc,nz),
      Quu_inv (B,N,nc,nc), Qxu (B,N,nz,nc), m (B,N,nz),
      q (B,N+1,nz), r (B,N,nc), z0 (B,nz).
    Returns: z (B,N+1,nz), c (B,N,nc).
    """
    B = F.shape[0]
    N, nz = F.shape[1], F.shape[2]
    nc = G.shape[3]
    nb = -(-B // LANES)

    args = [_to_lanes(a, B) for a in (F, G, d, K, Quu_inv, Qxu, m, q, r, z0)]

    grid = (nb,)

    def spec(shape):
        # block over the lane (batch) axis only
        ndim = len(shape)
        blk = shape[:-1] + (LANES,)
        return pl.BlockSpec(
            blk, lambda i, nd=ndim: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM)

    in_specs = [spec(a.shape) for a in args]
    out_shape = [
        jax.ShapeDtypeStruct((N + 1, nz, nb * LANES), F.dtype),
        jax.ShapeDtypeStruct((N, nc, nb * LANES), F.dtype),
    ]
    out_specs = [spec((N + 1, nz, nb * LANES)),
                 spec((N, nc, nb * LANES))]

    z, c = pl.pallas_call(
        _affine_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, nc, LANES), F.dtype)],
        interpret=interpret,
    )(*args)

    z = jnp.moveaxis(z, -1, 0)[:B]
    c = jnp.moveaxis(c, -1, 0)[:B]
    return z, c
