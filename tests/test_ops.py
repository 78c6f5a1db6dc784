"""QP engine tests: Riccati LQR vs dense KKT, ADMM vs SLSQP.

The analytic ground-truth strategy mirrors the reference's native solver
tests (MPCC-master/C++/Tests): small random problems checked against an
independent dense solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from colaborativempc_tpu.ops import (
    LQRCost, LQRDynamics, StageQP, lqr_solve, admm_solve,
)


def random_problem(rng, N=8, nz=4, nc=2, with_cross=True):
    F = rng.normal(size=(N, nz, nz)) * 0.3 + np.eye(nz) * 0.9
    G = rng.normal(size=(N, nz, nc)) * 0.5
    d = rng.normal(size=(N, nz)) * 0.1

    def spd(n, scale):
        A = rng.normal(size=(n, n))
        return A @ A.T * scale + np.eye(n)

    Q = np.stack([spd(nz, 0.1) for _ in range(N + 1)])
    R = np.stack([spd(nc, 0.1) for _ in range(N)])
    S = (rng.normal(size=(N, nz, nc)) * 0.05) if with_cross else np.zeros((N, nz, nc))
    q = rng.normal(size=(N + 1, nz)) * 0.5
    r = rng.normal(size=(N, nc)) * 0.5
    z0 = rng.normal(size=nz)
    return F, G, d, Q, R, S, q, r, z0


def dense_solve(F, G, d, Q, R, S, q, r, z0):
    """Independent dense KKT solve of the equality-constrained LQR QP."""
    N, nz, nc = F.shape[0], F.shape[1], G.shape[2]
    nv = N * nz + N * nc  # z_1..z_N then c_0..c_{N-1}

    def zi(k):  # z_k for k>=1
        return slice((k - 1) * nz, k * nz)

    def ci(k):
        return slice(N * nz + k * nc, N * nz + (k + 1) * nc)

    H = np.zeros((nv, nv))
    g = np.zeros(nv)
    for k in range(1, N + 1):
        H[zi(k), zi(k)] += Q[k]
        g[zi(k)] += q[k]
    for k in range(N):
        H[ci(k), ci(k)] += R[k]
        g[ci(k)] += r[k]
        if k >= 1:
            H[zi(k), ci(k)] += S[k]
            H[ci(k), zi(k)] += S[k].T
        else:
            g[ci(0)] += S[0].T @ z0

    A = np.zeros((N * nz, nv))
    b = np.zeros(N * nz)
    for k in range(N):
        rows = slice(k * nz, (k + 1) * nz)
        A[rows, zi(k + 1)] = np.eye(nz)
        A[rows, ci(k)] = -G[k]
        if k >= 1:
            A[rows, zi(k)] = -F[k]
            b[rows] = d[k]
        else:
            b[rows] = F[0] @ z0 + d[0]

    KKT = np.block([[H, A.T], [A, np.zeros((N * nz, N * nz))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    zs = sol[: N * nz].reshape(N, nz)
    cs = sol[N * nz: nv].reshape(N, nc)
    return np.vstack([z0, zs]), cs


def test_lqr_matches_dense_kkt():
    rng = np.random.default_rng(0)
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng)
    z_ref, c_ref = dense_solve(F, G, d, Q, R, S, q, r, z0)

    with jax.enable_x64():
        dyn = LQRDynamics(*[jnp.asarray(a, jnp.float64) for a in (F, G, d)])
        cost = LQRCost(*[jnp.asarray(a, jnp.float64) for a in (Q, q, R, r, S)])
        z, c = lqr_solve(dyn, cost, jnp.asarray(z0, jnp.float64))
        z, c = np.asarray(z), np.asarray(c)
    assert np.allclose(z, z_ref, atol=1e-8)
    assert np.allclose(c, c_ref, atol=1e-8)


def test_lqr_float32_accuracy():
    rng = np.random.default_rng(1)
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=20)
    z_ref, c_ref = dense_solve(F, G, d, Q, R, S, q, r, z0)
    dyn = LQRDynamics(*[jnp.asarray(a, jnp.float32) for a in (F, G, d)])
    cost = LQRCost(*[jnp.asarray(a, jnp.float32) for a in (Q, q, R, r, S)])
    z, c = lqr_solve(dyn, cost, jnp.asarray(z0, jnp.float32))
    assert np.allclose(np.asarray(z), z_ref, atol=2e-3)
    assert np.allclose(np.asarray(c), c_ref, atol=2e-3)


def _constrained_problem(rng, N=6, nz=3, nc=2, m=3):
    """Random stage QP with guaranteed-feasible bounds (a band around a
    random rolled-out trajectory), some of which cut into the solution."""
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=N, nz=nz, nc=nc)
    D = rng.normal(size=(N, m, nz)) * 0.5
    E = rng.normal(size=(N, m, nc)) * 0.5
    ctil = rng.normal(size=(N, nc)) * 0.3
    zs = [z0]
    for k in range(N):
        zs.append(F[k] @ zs[-1] + G[k] @ ctil[k] + d[k])
    zs = np.array(zs)
    vt = (np.einsum("kmi,ki->km", D, zs[:-1])
          + np.einsum("kmi,ki->km", E, ctil))
    lo = vt - rng.uniform(0.05, 0.5, size=(N, m))
    hi = vt + rng.uniform(0.05, 0.5, size=(N, m))
    return F, G, d, Q, R, S, q, r, z0, D, E, lo, hi


def _reference_qp_solve(F, G, d, Q, R, S, q, r, z0, D, E, lo, hi):
    """Independent reference solve: eliminate states by rollout (the problem
    is then a dense QP in the stacked controls), extract exact quadratic
    matrices by basis evaluation, solve with scipy trust-constr."""
    N, nz, nc = F.shape[0], F.shape[1], G.shape[2]
    nv = N * nc

    def rollout(cvec):
        cs = cvec.reshape(N, nc)
        zs = [z0]
        for k in range(N):
            zs.append(F[k] @ zs[-1] + G[k] @ cs[k] + d[k])
        return np.array(zs), cs

    def objective(cvec):
        zs, cs = rollout(cvec)
        val = 0.0
        for k in range(1, N + 1):
            val += 0.5 * zs[k] @ Q[k] @ zs[k] + q[k] @ zs[k]
        for k in range(N):
            val += 0.5 * cs[k] @ R[k] @ cs[k] + r[k] @ cs[k]
            val += zs[k] @ S[k] @ cs[k]
        return val

    def cons_vals(cvec):
        zs, cs = rollout(cvec)
        return (np.einsum("kmi,ki->km", D, zs[:-1])
                + np.einsum("kmi,ki->km", E, cs)).ravel()

    # exact quadratic extraction (objective is quadratic, constraints affine)
    f0 = objective(np.zeros(nv))
    eye = np.eye(nv)
    fs = np.array([objective(eye[i]) for i in range(nv)])
    fsm = np.array([objective(-eye[i]) for i in range(nv)])
    g = (fs - fsm) / 2.0
    H = np.empty((nv, nv))
    for i in range(nv):
        for j in range(nv):
            H[i, j] = (objective(eye[i] + eye[j]) - fs[i] - fs[j] + f0)
    v0 = cons_vals(np.zeros(nv))
    Ac = np.column_stack([cons_vals(eye[i]) - v0 for i in range(nv)])

    res = scipy.optimize.minimize(
        lambda c: 0.5 * c @ H @ c + g @ c,
        np.zeros(nv), jac=lambda c: H @ c + g,
        method="trust-constr",
        constraints=[scipy.optimize.LinearConstraint(
            Ac, lo.ravel() - v0, hi.ravel() - v0)],
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 3000})
    zs, cs = rollout(res.x)
    return zs, cs, res.fun + f0


def test_admm_matches_slsqp():
    rng = np.random.default_rng(2)
    F, G, d, Q, R, S, q, r, z0, D, E, lo, hi = _constrained_problem(rng)
    z_ref, c_ref, f_ref = _reference_qp_solve(F, G, d, Q, R, S, q, r, z0, D, E, lo, hi)

    with jax.enable_x64():
        qp = StageQP(
            dyn=LQRDynamics(*[jnp.asarray(a, jnp.float64) for a in (F, G, d)]),
            cost=LQRCost(*[jnp.asarray(a, jnp.float64) for a in (Q, q, R, r, S)]),
            D=jnp.asarray(D, jnp.float64), E=jnp.asarray(E, jnp.float64),
            lo=jnp.asarray(lo, jnp.float64), hi=jnp.asarray(hi, jnp.float64))
        sol = admm_solve(qp, jnp.asarray(z0, jnp.float64),
                         iters=2000, rho=5.0, eps=1e-9)
        r_prim = float(sol.r_prim)
        z_sol, c_sol = np.asarray(sol.z), np.asarray(sol.c)
    assert r_prim < 1e-7
    assert np.allclose(z_sol, z_ref, atol=1e-4)
    assert np.allclose(c_sol, c_ref, atol=1e-4)


def test_admm_unconstrained_equals_lqr():
    """With infinite bounds ADMM must reproduce the pure LQR solution."""
    rng = np.random.default_rng(3)
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=6, nz=3, nc=2)
    m = 2
    D = rng.normal(size=(6, m, 3))
    E = rng.normal(size=(6, m, 2))
    lo = np.full((6, m), -np.inf)
    hi = np.full((6, m), np.inf)
    dyn = LQRDynamics(*[jnp.asarray(a, jnp.float32) for a in (F, G, d)])
    cost = LQRCost(*[jnp.asarray(a, jnp.float32) for a in (Q, q, R, r, S)])
    z_lqr, c_lqr = lqr_solve(dyn, cost, jnp.asarray(z0, jnp.float32))
    qp = StageQP(dyn=dyn, cost=cost,
                 D=jnp.asarray(D, jnp.float32), E=jnp.asarray(E, jnp.float32),
                 lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32))
    sol = admm_solve(qp, jnp.asarray(z0, jnp.float32), iters=200, eps=1e-6)
    assert np.allclose(np.asarray(sol.z), np.asarray(z_lqr), atol=1e-3)


def test_admm_active_constraints_respected():
    """Tight box on the first control must be respected at the solution."""
    rng = np.random.default_rng(4)
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=5, nz=3, nc=2)
    r = r - 2.0  # push controls positive
    N, nc = 5, 2
    D = np.zeros((N, nc, 3))
    E = np.stack([np.eye(nc)] * N)
    lo = np.full((N, nc), -0.05)
    hi = np.full((N, nc), 0.05)
    qp = StageQP(
        dyn=LQRDynamics(*[jnp.asarray(a, jnp.float32) for a in (F, G, d)]),
        cost=LQRCost(*[jnp.asarray(a, jnp.float32) for a in (Q, q, R, r, S)]),
        D=jnp.asarray(D, jnp.float32), E=jnp.asarray(E, jnp.float32),
        lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32))
    sol = admm_solve(qp, jnp.asarray(z0, jnp.float32), iters=300, eps=1e-6)
    c = np.asarray(sol.c)
    assert (c <= 0.05 + 1e-3).all() and (c >= -0.05 - 1e-3).all()
    # the cost push means the upper bound is active somewhere
    assert (c > 0.045).any()


def test_admm_vmap_batch():
    """Batched solves via vmap agree with individual solves."""
    rng = np.random.default_rng(5)
    probs = [_constrained_problem(rng, N=5) for _ in range(3)]

    def to_qp(p):
        F, G, d, Q, R, S, q, r, z0, D, E, lo, hi = p
        return StageQP(
            dyn=LQRDynamics(*[jnp.asarray(a, jnp.float32) for a in (F, G, d)]),
            cost=LQRCost(*[jnp.asarray(a, jnp.float32) for a in (Q, q, R, r, S)]),
            D=jnp.asarray(D, jnp.float32), E=jnp.asarray(E, jnp.float32),
            lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32))

    qps = [to_qp(p) for p in probs]
    z0s = [jnp.asarray(p[8], jnp.float32) for p in probs]
    batched_qp = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    batched_z0 = jnp.stack(z0s)

    # epoch_len pinned: one of the random problems does not converge within
    # the budget, and an unconverged iterate depends on the epoch schedule
    # (the N-dependent default is tuned for MPC-structured problems)
    solve = jax.vmap(lambda qp, z0: admm_solve(qp, z0, iters=300, eps=1e-6,
                                               epoch_len=25))
    bsol = solve(batched_qp, batched_z0)
    for i, (qp, z0) in enumerate(zip(qps, z0s)):
        sol = admm_solve(qp, z0, iters=300, eps=1e-6, epoch_len=25)
        assert np.allclose(np.asarray(bsol.z[i]), np.asarray(sol.z), atol=2e-3)


def test_assoc_affine_matches_sequential():
    """The parallel-in-horizon associative-scan solve must equal the
    sequential Riccati affine solve."""
    from colaborativempc_tpu.ops.lqr import (
        lqr_factorize, lqr_affine_solve, lqr_affine_solve_assoc,
    )
    rng = np.random.default_rng(7)
    F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=40, nz=6, nc=3)
    dyn = LQRDynamics(*[jnp.asarray(a, jnp.float32) for a in (F, G, d)])
    cost = LQRCost(*[jnp.asarray(a, jnp.float32) for a in (Q, q, R, r, S)])
    fac = lqr_factorize(dyn, cost)
    z1, c1 = lqr_affine_solve(dyn, fac, cost.q, cost.r,
                              jnp.asarray(z0, jnp.float32))
    z2, c2 = lqr_affine_solve_assoc(dyn, fac, cost.q, cost.r,
                                    jnp.asarray(z0, jnp.float32))
    assert np.allclose(np.asarray(z1), np.asarray(z2), atol=2e-3), (
        np.abs(np.asarray(z1) - np.asarray(z2)).max())
    assert np.allclose(np.asarray(c1), np.asarray(c2), atol=2e-3)


def test_blocked_affine_scan_matches_sequential():
    """The blocked-hybrid associative scan (composites bounded to `block`
    stages, state carried sequentially across blocks) is exact for every
    block size, including non-divisors of N and block >= N (full span),
    in both scan directions."""
    from colaborativempc_tpu.ops.lqr import _affine_scan
    rng = np.random.default_rng(11)
    N, n = 57, 7
    M = jnp.asarray(0.4 * rng.standard_normal((N, n, n)))
    b = jnp.asarray(rng.standard_normal((N, n)))
    x0 = jnp.asarray(rng.standard_normal(n))

    def seq(M, b, x0, reverse):
        Ms = np.asarray(M)[::-1] if reverse else np.asarray(M)
        bs = np.asarray(b)[::-1] if reverse else np.asarray(b)
        xs = [np.asarray(x0)]
        for k in range(N):
            xs.append(Ms[k] @ xs[-1] + bs[k])
        out = np.stack(xs)
        return out[::-1] if reverse else out

    for reverse in (False, True):
        ref = seq(M, b, x0, reverse)
        for block in (None, 8, 13, 57, 100):
            got = np.asarray(_affine_scan(M, b, x0, reverse=reverse,
                                          block=block))
            assert np.allclose(got, ref, atol=1e-5), (reverse, block)


def test_pallas_affine_kernel_interpret():
    """The Pallas batched affine kernel matches the sequential solve.

    Runs in interpreter mode: real-TPU Pallas execution is not available
    through this environment's tunneled backend (plain pallas_call hangs),
    so the kernel is validated functionally here and benchmarked on real
    hardware separately.
    """
    from colaborativempc_tpu.ops.lqr import lqr_factorize, lqr_affine_solve
    from colaborativempc_tpu.ops.pallas_lqr import lqr_affine_solve_batched

    rng = np.random.default_rng(11)
    B, N = 4, 10
    refs, packs = [], []
    for _ in range(B):
        F, G, d, Q, R, S, q, r, z0 = random_problem(rng, N=N, nz=11, nc=2)
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        dyn = LQRDynamics(f32(F), f32(G), f32(d))
        cost = LQRCost(f32(Q), f32(q), f32(R), f32(r), f32(S))
        fac = lqr_factorize(dyn, cost)
        z, c = lqr_affine_solve(dyn, fac, cost.q, cost.r, f32(z0))
        refs.append((np.asarray(z), np.asarray(c)))
        L = np.asarray(fac.Quu_chol)
        Quu_inv = np.stack([np.linalg.inv(L[k] @ L[k].T) for k in range(N)])
        packs.append((F, G, d, np.asarray(fac.K), Quu_inv,
                      np.asarray(fac.Qxu), np.asarray(fac.m), q, r, z0))

    batched = [jnp.asarray(np.stack([p[i] for p in packs]), jnp.float32)
               for i in range(10)]
    z, c = lqr_affine_solve_batched(*batched, interpret=True)
    for i in range(B):
        assert np.allclose(np.asarray(z[i]), refs[i][0], atol=5e-5)
        assert np.allclose(np.asarray(c[i]), refs[i][1], atol=5e-5)


def test_pallas_admm_epoch_kernel_interpret():
    """The Pallas in-VMEM full-ADMM-epoch kernel reproduces ops/admm.py's
    epoch exactly: same splitting iteration, over-relaxation, soft-row prox
    shrinkage, and per-row-class residuals. Interpreter mode (see
    test_pallas_affine_kernel_interpret for why); hardware benchmarking is
    a direct-attached-TPU follow-up (ROADMAP.md).
    """
    from colaborativempc_tpu.ops.admm import admm_epoch_inputs
    from colaborativempc_tpu.ops.pallas_lqr import admm_epoch_batched

    rng = np.random.default_rng(23)
    B, N, nz, nc, m = 4, 10, 5, 2, 3
    EL, RHO, ALPHA = 25, 10.0, 1.6
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

    qps, z0s, w0s, y0s, refs = [], [], [], [], []
    for _ in range(B):
        F, G, d, Q, R, S, q, r, z0, D, E, lo, hi = _constrained_problem(
            rng, N=N, nz=nz, nc=nc, m=m)
        # row 0 soft on both sides (the framework's slacked-constraint
        # form), rows 1.. hard
        soft = np.full((N, m), np.inf)
        soft[:, 0] = 50.0
        qp = StageQP(
            dyn=LQRDynamics(f32(F), f32(G), f32(d)),
            cost=LQRCost(f32(Q), f32(q), f32(R), f32(r), f32(S)),
            D=f32(D), E=f32(E), lo=f32(lo), hi=f32(hi),
            soft_lo=f32(soft), soft_hi=f32(soft))
        w0 = np.clip(rng.normal(size=(N, m)) * 0.1, lo, hi)
        y0 = rng.normal(size=(N, m)) * 0.05
        # eps=1e30: every class is "quiet" after epoch 1, so admm_solve
        # keeps rho, skips the dual rescale, and exits — its outputs are
        # the pure one-epoch result the kernel must match
        sol = admm_solve(qp, f32(z0), w0=f32(w0), y0=f32(y0),
                         iters=EL, rho=RHO, alpha=ALPHA, eps=1e30,
                         epoch_len=EL)
        qps.append(qp)
        z0s.append(z0)
        w0s.append(w0)
        y0s.append(y0)
        refs.append(sol)

    qp_b = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    data = jax.vmap(lambda qp: admm_epoch_inputs(qp, rho=RHO))(qp_b)
    z, c, w, y, rp, rd = admm_epoch_batched(
        data, f32(np.stack(z0s)), f32(np.stack(w0s)), f32(np.stack(y0s)),
        epoch_len=EL, alpha=ALPHA, interpret=True)

    for i, sol in enumerate(refs):
        assert np.allclose(np.asarray(z[i]), np.asarray(sol.z), atol=1e-3)
        assert np.allclose(np.asarray(c[i]), np.asarray(sol.c), atol=1e-3)
        assert np.allclose(np.asarray(w[i]), np.asarray(sol.w), atol=1e-3)
        assert np.allclose(np.asarray(y[i]), np.asarray(sol.y), atol=1e-3)
        assert np.isclose(float(jnp.max(rp[i])), float(sol.r_prim),
                          atol=1e-4)
        assert np.isclose(float(jnp.max(rd[i])), float(sol.r_dual),
                          atol=1e-4)


def test_admm_solve_pallas_dispatch_matches_xla():
    """``admm_solve(..., use_pallas=True)`` — the product-path dispatch to
    the in-VMEM Pallas epoch kernel — reproduces the XLA scan path across
    MULTIPLE refactorisation epochs (adaptive-rho rescales between kernel
    calls) and respects the constraints. Interpreter mode (see
    test_pallas_affine_kernel_interpret for why)."""
    rng = np.random.default_rng(31)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    N, nz, nc, m = 8, 5, 2, 3
    F, G, d, Q, R, S, q, r, z0, D, E, lo, hi = _constrained_problem(
        rng, N=N, nz=nz, nc=nc, m=m)
    soft = np.full((N, m), np.inf)
    soft[:, 0] = 50.0
    qp = StageQP(
        dyn=LQRDynamics(f32(F), f32(G), f32(d)),
        cost=LQRCost(f32(Q), f32(q), f32(R), f32(r), f32(S)),
        D=f32(D), E=f32(E), lo=f32(lo), hi=f32(hi),
        soft_lo=f32(soft), soft_hi=f32(soft))

    kw = dict(iters=150, rho=5.0, eps=1e-6, epoch_len=25)
    ref = admm_solve(qp, f32(z0), **kw)
    pal = admm_solve(qp, f32(z0), use_pallas=True, pallas_interpret=True,
                     **kw)
    assert np.allclose(np.asarray(pal.z), np.asarray(ref.z), atol=1e-4)
    assert np.allclose(np.asarray(pal.c), np.asarray(ref.c), atol=1e-4)
    # rho_scale / epoch count are solver-internal: near-zero residuals make
    # the adaptive-rho ratio float-noise-sensitive, so the two (equally
    # converged) paths may take different epoch trajectories — what must
    # agree is the solution and the convergence certificate
    assert float(pal.r_prim) < 1e-6 and float(ref.r_prim) < 1e-6
    assert bool(pal.feasible)


def test_admm_solve_pallas_vmem_guard():
    """Shapes past the VMEM bound must silently fall back to the XLA path
    (same results, no Pallas lowering attempted)."""
    from colaborativempc_tpu.ops.admm import (
        pallas_epoch_supported, pallas_vmem_bytes, PALLAS_VMEM_BOUND,
    )
    # bicycle-model stage QP sizes (nz=11, nc=2, m~10) fit at N<=48
    assert pallas_epoch_supported(20, 11, 2, 10)
    assert pallas_epoch_supported(48, 11, 2, 10)
    # a huge horizon/state blows VMEM and must be rejected
    assert not pallas_epoch_supported(2000, 64, 8, 64)
    assert pallas_vmem_bytes(2000, 64, 8, 64) > PALLAS_VMEM_BOUND

    rng = np.random.default_rng(33)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    F, G, d, Q, R, S, q, r, z0, D, E, lo, hi = _constrained_problem(
        rng, N=5, nz=3, nc=2, m=2)
    qp = StageQP(
        dyn=LQRDynamics(f32(F), f32(G), f32(d)),
        cost=LQRCost(f32(Q), f32(q), f32(R), f32(r), f32(S)),
        D=f32(D), E=f32(E), lo=f32(lo), hi=f32(hi))
    import colaborativempc_tpu.ops.admm as admm_mod
    old = admm_mod.PALLAS_VMEM_BOUND
    try:
        admm_mod.PALLAS_VMEM_BOUND = 0  # force the guard to reject
        # ...but admm_solve reads the module global through the helper at
        # trace time, so use_pallas degrades to the XLA path
        pal = admm_solve(qp, f32(z0), use_pallas=True,
                         pallas_interpret=True, iters=100, eps=1e-6)
    finally:
        admm_mod.PALLAS_VMEM_BOUND = old
    ref = admm_solve(qp, f32(z0), iters=100, eps=1e-6)
    assert np.allclose(np.asarray(pal.z), np.asarray(ref.z), atol=1e-5)


def test_lpv_fleet_step_with_pallas_dispatch():
    """The SolverConfig.use_pallas product path survives the fleet step's
    agent vmap (pallas_call's batching rule) and matches the XLA path.
    Interpreter mode (see test_pallas_affine_kernel_interpret for why)."""
    from colaborativempc_tpu.config import (
        ExperimentConfig, lpv_gains, SolverConfig,
    )
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.runtime import init_lpv_fleet
    from colaborativempc_tpu.runtime.simulate import make_lpv_fleet_step

    track = make_track("oval")
    state = None
    outs = {}
    for tag, solver in (
        ("pallas", SolverConfig(admm_iters=100, use_pallas=True,
                                pallas_interpret=True)),
        ("xla", SolverConfig(admm_iters=100)),
    ):
        cfg = ExperimentConfig(n_agents=2, N=10, dt=0.025, map_type="oval",
                               gains=lpv_gains(), solver=solver)
        if state is None:
            state = init_lpv_fleet(track, cfg)
        outs[tag], m = make_lpv_fleet_step(track, cfg)(state)
        assert np.asarray(m.feasible).all(), tag
    err = np.abs(np.asarray(outs["pallas"].x_pred)
                 - np.asarray(outs["xla"].x_pred)).max()
    assert err < 1e-3, err
