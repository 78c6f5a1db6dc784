#!/usr/bin/env python
"""Validate the model discretisation against a recorded input sequence
(reference ``planner/scripts/eval_LPV_model.py``): replays u.pkl through the
Euler/LPV rollout and reports the divergence from the recorded states.

    python scripts/eval_lpv_model.py data/LPV3r --agent 0 --map Highway
"""

import argparse
import os
import sys

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--agent", type=int, default=0)
    ap.add_argument("--map", default="Highway")
    ap.add_argument("--dt", type=float, default=0.025)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax.numpy as jnp
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.runtime.io import load_experiment
    from colaborativempc_tpu.utils.rollout import rollout_euler

    s_hist, u_hist = load_experiment(args.path, args.agent)
    recorded = np.stack([s[0] for s in s_hist])          # executed states
    us = np.stack([u[0] for u in u_hist])                # applied inputs
    T = min(args.steps, len(us))

    track = make_track(args.map)
    sim = np.asarray(rollout_euler(track, jnp.asarray(recorded[0]),
                                   jnp.asarray(us[:T]), args.dt))
    err = np.abs(sim[1:T + 1] - recorded[1:T + 1])
    print(f"open-loop rollout vs recorded over {T} steps:")
    for i, nm in enumerate(["vx", "vy", "wz", "ey", "epsi", "theta",
                            "s", "X", "Y"]):
        print(f"  {nm:>5}: max err {err[:, i].max():.4f}")


if __name__ == "__main__":
    main()
