"""float64 island tests: the ``dtype="float64"`` knob actually produces f64.

The reference's solvers run full double precision (OSQP/IPOPT,
``LPV_Planner.py:222-239``); this framework is float32-first with scoped
x64 islands (utils/precision.py). These tests pin (a) no silent truncation,
(b) end-to-end f64 experiments, (c) the long-horizon residual improvement
f64 buys over f32 on the same problem.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from colaborativempc_tpu.config import ExperimentConfig, lpv_gains, nl_gains
from colaborativempc_tpu.config.params import SolverConfig, OCDConfig
from colaborativempc_tpu.geometry import make_track, track_from_json
from colaborativempc_tpu.utils.precision import x64_island, dtype_island
from colaborativempc_tpu.runtime import run_lpv_experiment, run_nl_experiment

REF_TRACK = ("/root/reference/Matlab-tests/MPCC-master/C++/Params/"
             "track.json")


def test_island_scoped_and_restores():
    assert not jax.config.jax_enable_x64
    with x64_island():
        assert jax.config.jax_enable_x64
        with x64_island():               # re-entrant
            assert jax.config.jax_enable_x64
        assert jax.config.jax_enable_x64
    assert not jax.config.jax_enable_x64
    with dtype_island("float32"):
        assert not jax.config.jax_enable_x64


def test_f64_tracks_no_truncation():
    """make_track / track_from_json with dtype=float64 emit real f64 tables
    with zero truncation warnings (the round-2 dead-knob finding)."""
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        t1 = make_track("Highway", dtype=jnp.float64)
        t2 = track_from_json(REF_TRACK, dtype=jnp.float64)
    trunc = [w for w in wlist if "truncated" in str(w.message)]
    assert not trunc, [str(w.message) for w in trunc]
    assert t1.x0.dtype == jnp.float64
    assert t1.curv.dtype == jnp.float64
    assert t2.x0.dtype == jnp.float64
    assert t2.halfwidth.dtype == jnp.float64
    # and the f32 default is untouched
    assert make_track("Highway").x0.dtype == jnp.float32


def test_f64_lpv_experiment_end_to_end():
    """cfg.dtype='float64' runs the whole closed loop in double precision
    and the f32 path still produces f32 afterwards (island restored)."""
    cfg64 = ExperimentConfig(
        n_agents=2, N=12, dt=0.025, max_it=4, map_type="oval",
        gains=lpv_gains(), dtype="float64",
        solver=SolverConfig(admm_iters=120))
    res = run_lpv_experiment(cfg64)
    assert res.states.dtype == np.float64
    assert np.all(np.isfinite(res.states))
    assert res.feasible.all()
    assert not jax.config.jax_enable_x64          # island exited
    cfg32 = ExperimentConfig(
        n_agents=2, N=12, dt=0.025, max_it=2, map_type="oval",
        gains=lpv_gains(), solver=SolverConfig(admm_iters=120))
    res32 = run_lpv_experiment(cfg32)
    assert res32.states.dtype == np.float32
    # same trajectory to f32 accuracy over the short run
    np.testing.assert_allclose(res32.states[:2], res.states[:2], atol=5e-3)


def test_f64_nl_experiment_smoke():
    cfg = ExperimentConfig(
        n_agents=2, N=10, dt=0.025, max_it=2, map_type="oval",
        gains=nl_gains(), dtype="float64", coupling="eu",
        ocd=OCDConfig(max_it_ocd=6),
        solver=SolverConfig(admm_iters=80, sqp_iters=1))
    res = run_nl_experiment(cfg)
    assert res.states.dtype == np.float64
    assert np.all(np.isfinite(res.states))
    assert not jax.config.jax_enable_x64


def test_f64_long_horizon_residual_improvement():
    """At N=125 with a fixed iteration budget and no early exit, the f64
    ADMM reaches residuals at least as tight as f32 on the SAME problem —
    the precision the knob is for."""
    from colaborativempc_tpu.config.params import SysLimits, ModelParams
    from colaborativempc_tpu.planners.lpv import lpv_solve
    from colaborativempc_tpu.utils.warmstart import initialise_agents
    from colaborativempc_tpu.config import x0_database

    N, dt = 125, 0.025

    def solve(dtype):
        with dtype_island(dtype):
            track = make_track("Highway", dtype=dtype)
            x0s = jnp.asarray(x0_database(1), dtype)
            _, x_pred, u_pred = initialise_agents(track, x0s, N, dt)
            sol = lpv_solve(
                track, lpv_gains(), SysLimits(), ModelParams(), N, dt,
                x_pred[0, 0], x_pred[0], u_pred[0],
                jnp.zeros(2, dtype), None,
                admm_iters=240, eps=0.0)        # eps=0: no early exit
            return (np.asarray(sol.x_pred),
                    float(sol.r_prim), bool(sol.feasible))

    x32, r32, f32_ok = solve(jnp.float32)
    x64, r64, f64_ok = solve(jnp.float64)
    assert x64.dtype == np.float64
    assert f32_ok and f64_ok
    assert r64 <= r32 * 1.5, (r64, r32)   # never meaningfully worse
    assert r64 < 1e-4, r64                # and genuinely tight
    np.testing.assert_allclose(x32, x64.astype(np.float32), atol=1e-2)
