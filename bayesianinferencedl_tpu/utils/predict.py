"""Posterior push-forward prediction: UQ on quantities that were never
measured.

After inversion, the parameter posterior implies a posterior over ANY
derived quantity — the full temperature field, the reading a thermocouple
WOULD take at a location that was never instrumented, subregion averages on
a finer partition than the observed one. The reference's workflow stops at
posterior parameter comparisons (SURVEY.md Appendix C); a deployable
inverse-problem framework must close the loop with prediction, reporting
uncertainty split into its two parts:

- **epistemic** — spread of u(x; theta) over posterior draws theta (shrinks
  with more/better data, cf. infer/oed.py which *designs* the data to
  shrink it);
- **aleatoric** — the observation noise a NEW measurement at x would add
  (irreducible; only reported when the caller passes ``noise_sigma``).

Everything is one batched FOM sweep over an evenly-thinned posterior
subsample — the same TPU-batched solve path the samplers use (one fused
Pallas CG dispatch for the whole draw batch on TPU) — plus host-side order
statistics. Point evaluation is exact P1 interpolation: locate the
containing triangle, barycentric-weight its three nodes (exact for the FEM
solution, which IS piecewise linear).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def interp_rows(mesh, points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """P1 interpolation rows for arbitrary in-domain points.

    points: (P, 2) float coordinates. Returns (ids, w): (P, 3) mesh-node ids
    and barycentric weights such that u(points[p]) = sum_j w[p, j] *
    u_nodes[ids[p, j]] — exact for the piecewise-linear FEM solution.

    Host-side brute force over triangles (meshes here are O(1e4-1e5)
    elements and prediction points are a handful, offline): a point is in a
    triangle iff all three barycentric coordinates are >= 0. Points outside
    the fin domain raise ValueError naming the offending point.
    """
    pts = np.atleast_2d(np.asarray(points, np.float64))
    if pts.shape[-1] != 2:
        raise ValueError(f"points must be (P, 2), got {pts.shape}")
    tri = np.asarray(mesh.triangles)  # (nt, 3)
    xy = np.asarray(mesh.nodes, np.float64)  # (n_nodes, 2)
    a, b, c = xy[tri[:, 0]], xy[tri[:, 1]], xy[tri[:, 2]]  # (nt, 2) each
    # barycentric solve: [b-a | c-a] [l1 l2]^T = p - a
    m00, m01 = b[:, 0] - a[:, 0], c[:, 0] - a[:, 0]
    m10, m11 = b[:, 1] - a[:, 1], c[:, 1] - a[:, 1]
    det = m00 * m11 - m01 * m10  # 2*area, nonzero for valid triangles

    ids = np.empty((pts.shape[0], 3), np.int64)
    w = np.empty((pts.shape[0], 3), np.float64)
    eps = 1e-9
    for p_i, p in enumerate(pts):
        rx, ry = p[0] - a[:, 0], p[1] - a[:, 1]
        l1 = (m11 * rx - m01 * ry) / det
        l2 = (-m10 * rx + m00 * ry) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -eps) & (l1 >= -eps) & (l2 >= -eps)
        if not inside.any():
            raise ValueError(
                f"prediction point {tuple(p)} lies outside the fin domain"
            )
        t = int(np.argmax(inside))
        ids[p_i] = tri[t]
        w[p_i] = np.clip([l0[t], l1[t], l2[t]], 0.0, 1.0)
        w[p_i] /= w[p_i].sum()
    return ids, w


def _stats(draws: np.ndarray) -> dict:
    """(D, ...) draws -> {mean, std, q05, q50, q95} over the draw axis."""
    q = np.quantile(draws, [0.05, 0.5, 0.95], axis=0)
    return {
        "mean": draws.mean(axis=0),
        "std": draws.std(axis=0),
        "q05": q[0],
        "q50": q[1],
        "q95": q[2],
    }


@dataclass
class FieldPrediction:
    """Posterior predictive summary of a nodal field (+ optional points).

    Node arrays are in MESH-NODE order ((n_nodes,) — already mapped back
    from the solver's padded layout), coordinates in ``node_xy``. Point
    arrays are (P,) in the order the points were given. ``point_pred_std``
    is the predictive SD for a NEW measurement at the point — epistemic
    spread plus the aleatoric noise_sigma in quadrature — present only when
    noise_sigma was supplied.
    """

    node_xy: np.ndarray
    mean: np.ndarray
    std: np.ndarray
    q05: np.ndarray
    q50: np.ndarray
    q95: np.ndarray
    n_draws: int
    points: Optional[np.ndarray] = None
    point_mean: Optional[np.ndarray] = None
    point_std: Optional[np.ndarray] = None
    point_q05: Optional[np.ndarray] = None
    point_q50: Optional[np.ndarray] = None
    point_q95: Optional[np.ndarray] = None
    point_pred_std: Optional[np.ndarray] = None
    point_draws: Optional[np.ndarray] = None  # (D, P) for downstream use

    def save_npz(self, path) -> None:
        payload = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if getattr(self, f.name) is not None
        }
        np.savez(path, **payload)

    def summary_rows(self) -> list[dict]:
        """One dict per prediction point (CLI/report-friendly)."""
        if self.points is None:
            return []
        rows = []
        for i, p in enumerate(self.points):
            row = {
                "x": float(p[0]),
                "y": float(p[1]),
                "mean": float(self.point_mean[i]),
                "sd": float(self.point_std[i]),
                "q05": float(self.point_q05[i]),
                "q95": float(self.point_q95[i]),
            }
            if self.point_pred_std is not None:
                row["pred_sd"] = float(self.point_pred_std[i])
            rows.append(row)
        return rows


def predict_field(
    u_draws: jax.Array,
    sol_idx: np.ndarray,
    mesh,
    *,
    points: Optional[np.ndarray] = None,
    noise_sigma: Optional[float] = None,
) -> FieldPrediction:
    """Summarize posterior field draws into a FieldPrediction.

    u_draws: (D, n_solver) posterior draws of the solution in the SOLVER's
    layout; sol_idx: (n_nodes,) index of each mesh node into that layout
    (infer/oed.py solution_indices — identity for the ELL layout, grid ids
    for the stencil layout). points: optional (P, 2) coordinates for exact
    P1 point prediction."""
    u_nodes = np.asarray(u_draws)[:, np.asarray(sol_idx)]  # (D, n_nodes)
    s = _stats(u_nodes)
    pred = FieldPrediction(
        node_xy=np.asarray(mesh.nodes),
        n_draws=u_nodes.shape[0],
        **{k: v for k, v in s.items()},
    )
    if points is not None:
        ids, w = interp_rows(mesh, points)
        pd = np.einsum("dpj->dp", u_nodes[:, ids] * w[None])  # (D, P)
        ps = _stats(pd)
        pred = dataclasses.replace(
            pred,
            points=np.atleast_2d(np.asarray(points, np.float64)),
            point_mean=ps["mean"],
            point_std=ps["std"],
            point_q05=ps["q05"],
            point_q50=ps["q50"],
            point_q95=ps["q95"],
            point_draws=pd,
            point_pred_std=(
                np.sqrt(ps["std"] ** 2 + float(noise_sigma) ** 2)
                if noise_sigma is not None
                else None
            ),
        )
    return pred
