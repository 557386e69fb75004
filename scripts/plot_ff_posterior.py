"""Full-field posterior visualization: truth vs posterior mean vs pointwise
uncertainty of the nodal log-conductivity field (the reference's
notebook-style posterior plots, SURVEY.md §2a #13, extended to the
full-field family §2a #4).

Runs a small end-to-end inversion (rom_nn likelihood) and renders four
panels on the fin triangulation: the true field theta(x), the posterior
mean field, the pointwise posterior std, and the signed error. With few
observations the field is identified only in a few data directions, so the
honest picture is mean + std TOGETHER: the error should sit inside ~2 std
nearly everywhere.

Usage: python scripts/plot_ff_posterior.py [--cpu] [--resolution 2]
       [--n-features 16] [--steps 4000] [--out artifacts/ff_posterior_r3.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="pin the CPU backend")
    ap.add_argument("--resolution", type=int, default=2)
    ap.add_argument("--n-features", type=int, default=16)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--burn", type=int, default=1000)
    ap.add_argument("--noise", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="artifacts/ff_posterior_r3.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_full_field_inversion,
    )
    from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh

    pipe = build_full_field_pipeline(
        resolution=args.resolution, n_features=args.n_features,
        n_snapshots=128, basis_size=24, k_basis_size=24, n_train=512,
        surrogate_steps=2000, seed=args.seed,
    )
    res, z_true, data, ess, rhat, wall = run_full_field_inversion(
        pipe, likelihood="rom_nn", sampler="pcn", n_chains=args.chains,
        n_steps=args.steps, n_burn=args.burn, noise_sigma=args.noise,
        key=jax.random.PRNGKey(args.seed),
    )
    print(
        f"rhat_split_max={float(jnp.max(rhat)):.4f} "
        f"ess_bulk_min={float(jnp.min(ess)):.1f} wall={wall:.2f}s"
    )

    # posterior fields from a thinned subsample of kept draws
    T, C, d = res.samples.shape
    zs = np.asarray(res.samples).reshape(T * C, d)
    idx = np.linspace(0, T * C - 1, min(2048, T * C)).astype(np.int64)
    # features live in the solver's GRID layout; read them back PER MESH NODE
    # through the pipeline's mapping (api_full_field.node_mesh_ids)
    mesh, gid = pipe.node_mesh_ids()
    feats = np.asarray(pipe.field.features)[np.asarray(gid)]  # (n_nodes, M)
    theta_draws = pipe.field.mean + pipe.field.sigma * zs[idx] @ feats.T
    theta_mean = theta_draws.mean(axis=0)
    theta_std = theta_draws.std(axis=0)
    theta_true = np.asarray(pipe.node_theta(z_true))
    n = mesh.n_nodes

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    tri = mtri.Triangulation(mesh.nodes[:, 0], mesh.nodes[:, 1], mesh.triangles)
    fig, axes = plt.subplots(1, 4, figsize=(22, 5.5))
    panels = [
        (theta_true[:n], "true log-conductivity", "viridis", None),
        (theta_mean[:n], "posterior mean", "viridis", None),
        (theta_std[:n], "posterior std (pointwise)", "magma", None),
        (theta_mean[:n] - theta_true[:n], "mean - truth", "coolwarm", "sym"),
    ]
    vmin = min(panels[0][0].min(), panels[1][0].min())
    vmax = max(panels[0][0].max(), panels[1][0].max())
    for ax, (vals, title, cmap, scale) in zip(axes, panels):
        kw = {}
        if cmap == "viridis":
            kw = {"vmin": vmin, "vmax": vmax}
        elif scale == "sym":
            a = np.abs(vals).max()
            kw = {"vmin": -a, "vmax": a}
        tc = ax.tripcolor(tri, vals, shading="gouraud", cmap=cmap, **kw)
        ax.set_title(title)
        ax.set_aspect("equal")
        fig.colorbar(tc, ax=ax, shrink=0.9)
    frac_in_2std = float(
        np.mean(np.abs(theta_mean[:n] - theta_true[:n]) <= 2 * theta_std[:n] + 1e-12)
    )
    fig.suptitle(
        f"Full-field posterior (d={args.n_features}, noise={args.noise:g}): "
        f"{100 * frac_in_2std:.0f}% of nodes within 2 posterior std of truth"
    )
    fig.tight_layout()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=110)
    print(f"wrote {out}; frac_within_2std={frac_in_2std:.3f}")


if __name__ == "__main__":
    main()
