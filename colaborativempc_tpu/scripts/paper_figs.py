#!/usr/bin/env python
"""Paper-style comparison figures from recorded experiments (reference
``planner/scripts/exp_gen_figs.py`` + ``paper_gen_figs.py``): overlays all
agents of one experiment, and an LPV-vs-NL comparison when two experiment
directories are given.

    python scripts/paper_figs.py data/LPV3r [data/NL_3agents_eu] \
        --map Highway [--cpu]
"""

import argparse
import os
import sys

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()

import numpy as np


def executed_states(path):
    from colaborativempc_tpu.runtime.io import load_experiment
    n_agents = 0
    while os.path.isdir(os.path.join(path, "pck", str(n_agents))):
        n_agents += 1
    return np.stack([np.stack([s[0] for s in load_experiment(path, a)[0]])
                     for a in range(n_agents)], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--map", default="Highway")
    ap.add_argument("--out", default="drawings")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from colaborativempc_tpu.geometry import make_track
    from colaborativempc_tpu.runtime.plotting import plot_track

    track = make_track(args.map)
    ax = plot_track(track)
    styles = ["-", "--", ":"]
    for p_i, path in enumerate(args.paths):
        st = executed_states(path)
        label = os.path.basename(os.path.normpath(path))
        for a in range(st.shape[1]):
            ax.plot(st[:, a, 7], st[:, a, 8], styles[p_i % 3], lw=1.3,
                    label=f"{label} agent {a}" if a == 0 else None)
    ax.legend(fontsize=8)
    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "comparison.png")
    plt.savefig(out, dpi=140, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
