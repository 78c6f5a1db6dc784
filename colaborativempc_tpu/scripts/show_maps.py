#!/usr/bin/env python
"""Render named tracks to PNG (reference ``planner/scripts/show_maps.py``).

    python scripts/show_maps.py [track ...] [--out drawings]
"""

import argparse
import os
import sys

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracks", nargs="*", default=None)
    ap.add_argument("--out", default="drawings")
    args = ap.parse_args()

    import matplotlib.pyplot as plt
    from colaborativempc_tpu.geometry import TRACK_NAMES, make_track
    from colaborativempc_tpu.runtime.plotting import plot_track

    names = args.tracks or list(TRACK_NAMES)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        ax = plot_track(make_track(name))
        ax.set_title(name)
        out = os.path.join(args.out, f"{name}.png")
        plt.savefig(out, dpi=130, bbox_inches="tight")
        plt.close()
        print("wrote", out)


if __name__ == "__main__":
    main()
