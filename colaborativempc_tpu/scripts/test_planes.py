#!/usr/bin/env python
"""Visual separating-hyperplane check (reference
``planner/scripts/test_planes.py``): generates point pairs, computes planes,
saves figures with signed distances instead of interactive eyeballing.

    python scripts/test_planes.py [--out drawings]
"""

import argparse
import os
import sys

from colaborativempc_tpu.scripts._common import setup_backend
setup_backend()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="drawings")
    args = ap.parse_args()

    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from colaborativempc_tpu.geometry import (
        compute_hyperplanes, plane_signed_distance,
    )

    rng = np.random.default_rng(0)
    ego = jnp.asarray(rng.uniform(-2, 2, size=(6, 2)))
    neigh = jnp.asarray(np.asarray(ego)[:, None, :]
                        + rng.uniform(0.5, 2.0, size=(6, 1, 2)))
    planes = compute_hyperplanes(ego, neigh, keep_sign=True)

    fig, ax = plt.subplots(figsize=(7, 7))
    xs = np.linspace(-4, 4, 2)
    for h in range(6):
        a, b = np.asarray(planes[h, 0, :2]), float(planes[h, 0, 2])
        ax.plot(float(ego[h, 0]), float(ego[h, 1]), "bo")
        ax.plot(float(neigh[h, 0, 0]), float(neigh[h, 0, 1]), "rx")
        if abs(a[1]) > 1e-6:
            ax.plot(xs, (-b - a[0] * xs) / a[1], "k-", lw=0.7)
        de = float(plane_signed_distance(planes[h, 0], ego[h]))
        dn = float(plane_signed_distance(planes[h, 0], neigh[h, 0]))
        print(f"pair {h}: d(ego)={de:+.3f} d(neigh)={dn:+.3f} "
              f"(must be -, + and symmetric)")
        assert de < 0 < dn and abs(de + dn) < 1e-5
    ax.set_xlim(-4, 4); ax.set_ylim(-4, 4); ax.set_aspect("equal")
    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "planes.png")
    plt.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out, "- planes separate correctly")


if __name__ == "__main__":
    main()
