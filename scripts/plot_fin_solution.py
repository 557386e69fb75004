"""Plot the fin temperature field for a given conductivity vector
(the reference's notebook-style field plots, SURVEY.md §2a #13).

Usage: python scripts/plot_fin_solution.py --k 1 1 1 1 1 [--resolution 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=float, nargs=5, default=[1.0] * 5)
    ap.add_argument("--resolution", type=int, default=4)
    ap.add_argument("--biot", type=float, default=0.1)
    ap.add_argument("--out", type=str, default="fin_solution.png")
    args = ap.parse_args()

    from bayesianinferencedl_tpu.models.five_param import FiveParamFin

    fin = FiveParamFin.create(resolution=args.resolution, biot=args.biot)
    u = np.asarray(fin.solve(jnp.asarray(args.k, jnp.float32)))
    y = np.asarray(fin.qoi(jnp.asarray(u)))
    print("QoI (region averages):", y.round(5))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    mesh = fin.mesh
    # map full-grid solution back onto mesh nodes
    h = mesh.h
    ny = 16 * mesh.resolution
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(int)
    u_nodes = u[gi * (ny + 1) + gj] if u.shape[0] != mesh.n_nodes else u[: mesh.n_nodes]

    tri = mtri.Triangulation(mesh.nodes[:, 0], mesh.nodes[:, 1], mesh.triangles)
    fig, ax = plt.subplots(figsize=(7, 6))
    tc = ax.tripcolor(tri, u_nodes, shading="gouraud", cmap="inferno")
    fig.colorbar(tc, label="temperature")
    ax.set_aspect("equal")
    ax.set_title(f"Thermal fin, k={args.k}, Bi={args.biot}")
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
