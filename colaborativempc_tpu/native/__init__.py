"""ctypes bindings to the native (C++) MPC stack in ``native/``.

The native library is the float64 host twin of the on-device engine — same
stage-QP layout, same Riccati+ADMM algorithm (native/src/). It plays the
role the in-tree C++ MPCC plays for the reference (a native single-agent
controller, MPCC-master/C++), and doubles as an independent cross-validation
oracle for the JAX path.

Build: ``cmake -B native/build -G Ninja native && ninja -C native/build``
(tests do this automatically when the toolchain is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libcmpc.so")

_lib = None


def build(force: bool = False) -> str:
    """Build the native library if needed; returns the .so path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["cmake", "-B", "build", "-G", "Ninja", "."],
                       cwd=_NATIVE_DIR, check=True, capture_output=True)
        subprocess.run(["ninja", "-C", "build"], cwd=_NATIVE_DIR,
                       check=True, capture_output=True)
    return _LIB_PATH


def available() -> bool:
    try:
        load()
        return True
    except Exception:  # noqa: BLE001
        return False


def load():
    global _lib
    if _lib is None:
        path = build()
        _lib = ctypes.CDLL(path)
        dp = ctypes.POINTER(ctypes.c_double)
        _lib.cmpc_lpv_solve_dt.restype = ctypes.c_int
        _lib.cmpc_lpv_solve_dt.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            dp, ctypes.c_double, ctypes.c_int,
            dp, dp, dp, dp, dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            dp, dp, dp,
        ]
        ip = ctypes.POINTER(ctypes.c_int)
        _lib.cmpc_nl_solve_dt.restype = ctypes.c_int
        _lib.cmpc_nl_solve_dt.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            dp, ctypes.c_double, ctypes.c_int,
            dp, dp, dp, dp, dp, dp, ip, dp, dp, dp,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, dp,
        ]
        _lib.cmpc_mpcc_solve_dt.restype = ctypes.c_int
        _lib.cmpc_mpcc_solve_dt.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_int,
            dp, ctypes.c_double, ctypes.c_int,
            dp, dp, dp, dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, dp,
        ]
        _lib.cmpc_mpcc_race.restype = ctypes.c_int
        _lib.cmpc_mpcc_race.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            dp, ctypes.c_double, ctypes.c_int,
            dp, dp, dp,
            ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            dp, dp, ip,
        ]
        _lib.cmpc_step_rk4.restype = None
        _lib.cmpc_step_rk4.argtypes = [
            ctypes.c_int, dp, ctypes.c_double, ctypes.c_int,
            dp, dp, ctypes.c_double, dp,
        ]
        _lib.cmpc_sep_filter.restype = None
        _lib.cmpc_sep_filter.argtypes = [
            ctypes.c_int, dp, dp, dp, ctypes.c_double, dp,
        ]
    return _lib


def track_table(track, lane: int = 0) -> tuple[np.ndarray, float, int]:
    """Flatten a geometry.Track into the (n_seg, 7) native table."""
    seg = np.stack([
        np.asarray(track.x0[lane], np.float64),
        np.asarray(track.y0[lane], np.float64),
        np.asarray(track.psi0[lane], np.float64),
        np.nan_to_num(np.asarray(track.s0[lane], np.float64), posinf=1e12),
        np.asarray(track.length[lane], np.float64),
        np.asarray(track.curv[lane], np.float64),
        np.asarray(track.halfwidth[lane], np.float64),
    ], axis=-1)
    return (np.ascontiguousarray(seg), float(track.track_length[lane]),
            int(bool(track.open_flag)))


def export_track_csv(track, path: str, lane: int = 0):
    """Write the native sim binary's track CSV."""
    seg, length, open_flag = track_table(track, lane)
    with open(path, "w") as f:
        f.write("# x0 y0 psi0 s0 len curv hw\n")
        for row in seg:
            f.write(" ".join(f"{v:.12g}" for v in row) + "\n")
        f.write(f"length {length:.12g} {open_flag}\n")


def _cptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nl_solve_native(track, gains, limits, model, N: int, dt: float,
                    x0, x_bar, u_bar, u_old, lambdas, neigh_xy, master,
                    sqp_iters: int = 2, mix: float = 0.7,
                    admm_iters: int = 300):
    """Native counterpart of planners.nl.nl_solve (coupling='eu').

    lambdas: (n_nb, N); neigh_xy: (N, n_nb, 2) stage-aligned (stages 1..N);
    master: (n_nb,) ints. Returns (feasible, x_pred, u_pred, residuals)."""
    lib = load()
    seg, length, open_flag = track_table(track)
    n_nb = int(neigh_xy.shape[1])
    x_bar = np.ascontiguousarray(np.asarray(x_bar, np.float64)).copy()
    u_bar = np.ascontiguousarray(np.asarray(u_bar, np.float64)).copy()
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    u_old = np.ascontiguousarray(np.asarray(u_old, np.float64))
    neigh = np.ascontiguousarray(np.asarray(neigh_xy, np.float64))
    lam = np.ascontiguousarray(np.asarray(lambdas, np.float64))
    mast = np.ascontiguousarray(np.asarray(master, np.int32))

    g = np.concatenate([
        np.asarray(gains.q, np.float64), np.asarray(gains.qs, np.float64),
        np.asarray(gains.r, np.float64), np.asarray(gains.dr, np.float64),
        [float(gains.wq)]])
    lim = np.asarray([limits.vx_ref, limits.min_dist, limits.max_vel,
                      limits.min_vel, limits.max_rs, limits.max_ls,
                      limits.max_ac, limits.max_dc, limits.sm], np.float64)
    mp = np.asarray([model.lf, model.lr, model.m, model.I, model.Cf,
                     model.Cr, model.mu], np.float64)
    resid = np.zeros(3)
    ok = lib.cmpc_nl_solve_dt(
        N, dt, n_nb, seg.shape[0], _cptr(seg), length, open_flag,
        _cptr(x_bar), _cptr(u_bar), _cptr(x0), _cptr(u_old), _cptr(neigh),
        _cptr(lam), mast.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _cptr(g), _cptr(lim), _cptr(mp),
        sqp_iters, mix, admm_iters, _cptr(resid))
    return bool(ok), x_bar, u_bar, resid


def lpv_solve_native(track, gains, limits, model, N: int, dt: float,
                     x0, x_lin, u_lin, u_old,
                     neighbours_xy: Optional[np.ndarray] = None,
                     iters: int = 600, rho: float = 10.0,
                     eps: float = 1e-6):
    """Native counterpart of planners.lpv.lpv_solve (float64).

    Returns (feasible, x_pred (N+1, 9), u_pred (N, 2), residuals[3])."""
    lib = load()
    seg, length, open_flag = track_table(track)
    n_nb = 0 if neighbours_xy is None else int(neighbours_xy.shape[1])
    # native expects N+1 stage rows (planes from 0..N-1, weights from 1..N)
    neigh = (np.zeros((N + 1, 1, 2)) if neighbours_xy is None
             else np.ascontiguousarray(
                 np.asarray(neighbours_xy, np.float64)[:N + 1]))

    g = np.concatenate([
        np.asarray(gains.q, np.float64), np.asarray(gains.qs, np.float64),
        np.asarray(gains.r, np.float64), np.asarray(gains.dr, np.float64),
        [float(gains.wq)]])
    lim = np.asarray([limits.vx_ref, limits.min_dist, limits.max_vel,
                      limits.min_vel, limits.max_rs, limits.max_ls,
                      limits.max_ac, limits.max_dc, limits.sm], np.float64)
    mp = np.asarray([model.lf, model.lr, model.m, model.I, model.Cf,
                     model.Cr, model.mu], np.float64)

    x_lin = np.ascontiguousarray(np.asarray(x_lin, np.float64))
    u_lin = np.ascontiguousarray(np.asarray(u_lin, np.float64))
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    u_old = np.ascontiguousarray(np.asarray(u_old, np.float64))
    x_out = np.zeros((N + 1, 9))
    u_out = np.zeros((N, 2))
    resid = np.zeros(3)

    ok = lib.cmpc_lpv_solve_dt(
        N, dt, n_nb, seg.shape[0], _cptr(seg), length, open_flag,
        _cptr(x_lin), _cptr(u_lin), _cptr(x0), _cptr(u_old), _cptr(neigh),
        _cptr(g), _cptr(lim), _cptr(mp), iters, rho, eps,
        _cptr(x_out), _cptr(u_out), _cptr(resid))
    return bool(ok), x_out, u_out, resid


def _mpcc_packs(gains, bounds, model):
    g = np.asarray([gains.q_progress, gains.q_contour, gains.q_heading,
                    gains.q_vy, gains.q_wz, gains.r_delta, gains.r_drive,
                    gains.dr_delta, gains.dr_drive, gains.w_soft],
                   np.float64)
    b = np.asarray([bounds.delta_max, bounds.drive_min, bounds.drive_max,
                    bounds.trust_delta, bounds.trust_drive, bounds.vx_min],
                   np.float64)
    mp = np.asarray([model.m, model.I, model.lf, model.lr, model.Bf,
                     model.Cf, model.Df, model.Br, model.Cr, model.Dr,
                     model.Cm1, model.Cm2, model.Cr0, model.Cr2,
                     model.p_long, model.p_ell, model.max_alpha], np.float64)
    return g, b, mp


def mpcc_solve_native(track, gains, bounds, model, N: int, dt: float,
                      x0, x_bar, u_bar, u_old,
                      sqp_iters: int = 3, mix: float = 0.7,
                      admm_iters: int = 300):
    """Native counterpart of planners.mpcc.mpcc_solve (float64, raw
    variables — no normalisation needed). Returns (feasible, x_pred,
    u_pred, residuals[3])."""
    lib = load()
    seg, length, open_flag = track_table(track)
    x_bar = np.ascontiguousarray(np.asarray(x_bar, np.float64)).copy()
    u_bar = np.ascontiguousarray(np.asarray(u_bar, np.float64)).copy()
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    u_old = np.ascontiguousarray(np.asarray(u_old, np.float64))
    g, b, mp = _mpcc_packs(gains, bounds, model)
    resid = np.zeros(3)
    ok = lib.cmpc_mpcc_solve_dt(
        N, dt, seg.shape[0], _cptr(seg), length, open_flag,
        _cptr(x_bar), _cptr(u_bar), _cptr(x0), _cptr(u_old),
        _cptr(g), _cptr(b), _cptr(mp), sqp_iters, mix, admm_iters,
        _cptr(resid))
    return bool(ok), x_bar, u_bar, resid


def mpcc_race_native(track, gains, bounds, model, N: int, dt: float,
                     steps: int, v0: float = 0.5, n_sqp: int = 3,
                     mix: float = 0.7, admm_iters: int = 300):
    """Native closed-loop race (runtime/racing.py run_mpcc_experiment twin;
    reference main.cpp:30-86). Returns (steps_done, states (T, 9),
    inputs (T, 2), feasible (T,))."""
    import ctypes as _ct
    lib = load()
    seg, length, open_flag = track_table(track)
    g, b, mp = _mpcc_packs(gains, bounds, model)
    x_hist = np.zeros((steps, 9))
    u_hist = np.zeros((steps, 2))
    feas = np.zeros(steps, np.int32)
    t = lib.cmpc_mpcc_race(
        N, dt, steps, seg.shape[0], _cptr(seg), length, open_flag,
        _cptr(g), _cptr(b), _cptr(mp), v0, n_sqp, mix, admm_iters,
        _cptr(x_hist), _cptr(u_hist),
        feas.ctypes.data_as(_ct.POINTER(_ct.c_int)))
    return int(t), x_hist[:t], u_hist[:t], feas[:t].astype(bool)


def sep_filter_native(p0, p1, prio, floor: float) -> np.ndarray:
    """Executed-separation safety-filter betas (native/include/cmpc/
    safety.h) — float64 twin of runtime/simulate.py _sep_filter_beta.
    ``p0``/``p1``: (n, 2) current/candidate positions; ``prio``: (n,)
    arc progress. Returns (n,) advance fractions."""
    lib = load()
    p0 = np.ascontiguousarray(p0, np.float64)
    p1 = np.ascontiguousarray(p1, np.float64)
    prio = np.ascontiguousarray(prio, np.float64)
    beta = np.zeros(p0.shape[0])
    lib.cmpc_sep_filter(p0.shape[0], _cptr(p0), _cptr(p1), _cptr(prio),
                        float(floor), _cptr(beta))
    return beta
