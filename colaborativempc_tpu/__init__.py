"""TPU-native collaborative MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
system ``MarcFacerias/ColaborativeMPC-`` (a Python/ROS1 distributed
multi-agent MPC trajectory planner for scaled autonomous cars):

- 9-state mixed Frenet/Cartesian bicycle model, LPV and fully nonlinear
  formulations (reference: planner/lib/plan_lib/distributedPlanner/LPV_Planner.py,
  nonLinDistribPlanner/base_nl.py)
- per-agent horizon MPC with tracking cost, road/actuator limits and slacks,
  solved on-device with a stage-structured Riccati+ADMM QP engine instead of
  OSQP/IPOPT (reference: LPV_Planner.py:192-249, NL_Planner_Eu.py:172-183)
- two collision-avoidance couplings: geometric separating hyperplanes and
  Euclidean distance (reference: planes/compute_plane.py, NL_Planner_Eu.py)
- OCD (Optimality Condition Decomposition) dual coordination across agents,
  run inside jit with collectives instead of ROS pub/sub
  (reference: planner/scripts/NL_EU_N_main.py:100-168, ROS/src/.../OCD_ROS_main.py)
- track database + Frenet-frame geometry (reference:
  mapManager/track_initialization.py)
- experiment harness, metrics writers and plotting with the reference's
  on-disk schema (reference: config/base_class.py, IOmodule/, plotter/)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles over a tunnelled TPU are
# expensive (minutes for the nested coordination loops); caching makes every
# subsequent process start warm.
import os as _os
import jax as _jax
_cache_dir = _os.environ.get("CMPC_JAX_CACHE",
                             _os.path.expanduser("~/.cache/cmpc_jax"))
try:
    # per-platform subdir: CPU executables cached from a TPU-backed process
    # carry different codegen feature flags and reload with SIGILL warnings.
    # Prefer the configured value (scripts set it before importing us).
    _plat = (_jax.config.jax_platforms
             or _os.environ.get("JAX_PLATFORMS", "default") or "default")
    _cache_dir = _os.path.join(_cache_dir, _plat.replace(",", "_"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is best-effort
    pass

from colaborativempc_tpu.geometry import Track, make_track, TRACK_NAMES
