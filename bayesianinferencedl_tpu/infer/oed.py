"""Bayesian optimal experimental design: where should the sensors go?

Beyond the reference's capability set (SURVEY.md §2a fixes the observation
operator to the five subfin averages): given candidate POINTWISE temperature
sensors on the fin, choose the n-sensor subset that maximizes the expected
information gain (EIG) of the linearized (Laplace) posterior,

    EIG(S) = 1/2 E_theta~prior[ log det( I_d + sigma^-2 Jw_S(theta) Jw_S(theta)^T ) ]

where J(theta) = d u(sensors) / d theta is the pointwise parametric
sensitivity at a prior draw and Jw = J C^{1/2} absorbs the prior covariance
(so the identity is the prior-precision term). This is the D-optimality /
information-gain objective of linear-Gaussian OED; for nonlinear forward
models the prior expectation over draws is the standard Laplace-design
approximation (Chaloner & Verdinelli's Bayesian D-optimality).

TPU-first mechanics:
- Sensitivities are EXACT adjoints: `jax.jacrev` of the solution through
  `lax.custom_linear_solve` (fem/solve.py) — d backward solves per draw,
  vmapped over the prior batch; no finite differences, no hand assembly.
- Greedy selection maximizes a submodular set function, so it carries the
  (1 - 1/e) near-optimality guarantee (Krause & Guestrin); each step is a
  batched Sherman-Morrison rank-one update over ALL candidates at once
  (B x n_cand x d tensor ops — d = 5, so this is elementwise-cheap).

Validated against brute-force subset enumeration and by posterior
contraction of actual MCMC runs on designed vs random sensor sets
(tests/test_oed.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem.solve import solve_fom


def mesh_node_grid_ids(mesh) -> np.ndarray:
    """Structured-grid solution index of every mesh node, for the stencil
    (dia) layout: the grid keeps the full (nx+1) x (ny+1) lattice numbering
    (fem/dia.py assemble_fin_dia:83-95), so u[gid] is the temperature at
    mesh node i. The ELL layout stores u in mesh-node order directly —
    callers pick the mapping by operator layout (see sensor_matrix)."""
    n_res = mesh.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(np.int64)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(np.int64)
    return gi * (ny + 1) + gj


def solution_indices(fin) -> np.ndarray:
    """(n_nodes,) index into the solver's u vector for each mesh node, for
    either operator layout."""
    if hasattr(fin.op, "vals_grid") or type(fin.op).__name__ == "StencilOperator":
        return mesh_node_grid_ids(fin.mesh)
    return np.arange(fin.mesh.n_nodes, dtype=np.int64)


def boundary_candidates(fin) -> np.ndarray:
    """Default candidate set: exterior-boundary nodes (where a physical
    thermocouple could sit), deduplicated, as mesh-node ids."""
    edges = np.asarray(fin.mesh.ext_edges).reshape(-1)
    return np.unique(edges)


def pointwise_sensitivities(
    fin,
    xs: jax.Array,
    node_ids: np.ndarray,
    *,
    to_theta=None,
    tol: float = 1e-9,
    maxiter: int = 3000,
) -> jax.Array:
    """(B, n_cand, d) exact sensitivities d u(node) / d x at each prior draw
    x in WORKING coordinates (theta = log k for the Gaussian prior, whitened
    z for box priors — pass the prior's to_theta, exactly as run_inversion
    composes its misfits), via jacrev through the implicit-diff solve — one
    forward + d adjoint solves per draw, vmapped over the batch."""
    idx = jnp.asarray(solution_indices(fin)[node_ids])
    to_theta = to_theta if to_theta is not None else (lambda x: x)

    def u_at(x):
        u = solve_fom(fin.op, jnp.exp(to_theta(x)), tol=tol, maxiter=maxiter)
        return u[idx]

    return jax.vmap(jax.jacrev(u_at))(xs)


@dataclass
class SensorDesign:
    node_ids: np.ndarray  # (n_sensors,) chosen mesh-node ids, greedy order
    xy: np.ndarray  # (n_sensors, 2) coordinates
    eig_trace: np.ndarray  # (n_sensors,) cumulative EIG (nats) after each pick
    gains: np.ndarray  # (n_sensors,) marginal EIG of each pick
    candidates: np.ndarray  # the candidate pool the design was drawn from


def greedy_eig(
    J: jax.Array,
    noise_sigma: float,
    n_sensors: int,
    *,
    prior_chol: Optional[jax.Array] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy D-optimal selection. J: (B, n_cand, d) sensitivities in
    working (theta) coordinates; prior_chol: (d, d) lower Cholesky of the
    prior covariance (identity if omitted — e.g. whitened coordinates).

    Returns (picked candidate indices, cumulative EIG trace, gains). The
    per-draw posterior precision starts at I_d (the whitened prior) and each
    pick adds sigma^-2 jw jw^T; its inverse is carried by Sherman-Morrison,
    so evaluating every remaining candidate's gain each round is one
    (B, n_cand, d) einsum — no re-factorizations."""
    Jw = J if prior_chol is None else jnp.einsum("bnd,de->bne", J, prior_chol)
    # d x d Sherman-Morrison at d ~ 5: full precision when x64 is on (tests,
    # offline design), f32 otherwise — no silent upcast warnings either way
    Jw = jnp.asarray(Jw, jnp.promote_types(jnp.asarray(J).dtype, jnp.float32))
    B, n_cand, d = Jw.shape
    inv_s2 = 1.0 / float(noise_sigma) ** 2
    Minv = jnp.broadcast_to(jnp.eye(d, dtype=Jw.dtype), (B, d, d))

    picked: list[int] = []
    gains: list[float] = []
    trace: list[float] = []
    total = 0.0
    for _ in range(n_sensors):
        # q_bn = jw_bn^T Minv_b jw_bn for every candidate at once; Minv is
        # PSD so q >= 0 exactly — clamp the f32 roundoff tail (measured: an
        # unclamped q ~ -1e-8 at sigma = 1e-2 sends log1p(1e4 q) to NaN and
        # argmax then picks the NaN candidate)
        Mj = jnp.einsum("bde,bne->bnd", Minv, Jw)
        q = jnp.maximum(jnp.einsum("bnd,bnd->bn", Mj, Jw), 0.0)
        # EIG gain of each candidate (mean over prior draws); repeating an
        # already-picked sensor still gains (it halves that sensor's
        # effective noise) — no masking needed, the math prices it
        g = 0.5 * jnp.mean(jnp.log1p(inv_s2 * q), axis=0)
        s = int(jnp.argmax(g))
        picked.append(s)
        gains.append(float(g[s]))
        total += float(g[s])
        trace.append(total)
        # Sherman-Morrison: Minv -= (Minv j)(Minv j)^T / (s^2 + j^T Minv j);
        # re-symmetrize so f32 drift can't accumulate into the PSD check
        v = Mj[:, s, :]  # (B, d)
        denom = (1.0 / inv_s2) + q[:, s]  # (B,)
        Minv = Minv - jnp.einsum("bd,be->bde", v, v) / denom[:, None, None]
        Minv = 0.5 * (Minv + jnp.swapaxes(Minv, -1, -2))
    return np.asarray(picked), np.asarray(trace), np.asarray(gains)


def design_sensors(
    fin,
    prior,
    *,
    n_sensors: int = 5,
    noise_sigma: float = 1e-2,
    n_draws: int = 16,
    candidates: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    tol: float = 1e-9,
    maxiter: int = 3000,
) -> SensorDesign:
    """End-to-end design: sample prior draws, compute exact sensitivities at
    the candidate nodes, pick n_sensors greedily by expected information
    gain. `prior` follows infer.priors.GaussianPrior's contract (sample /
    cov / to_theta); draws and sensitivities are taken in working
    coordinates, matching how run_inversion evaluates its misfits."""
    key = key if key is not None else jax.random.PRNGKey(0)
    cand = boundary_candidates(fin) if candidates is None else np.asarray(candidates)
    xs = prior.sample(key, (n_draws,))
    J = pointwise_sensitivities(
        fin, xs, cand, to_theta=prior.to_theta, tol=tol, maxiter=maxiter
    )
    picked, trace, gains = greedy_eig(
        J, noise_sigma, n_sensors, prior_chol=prior.chol
    )
    node_ids = cand[picked]
    return SensorDesign(
        node_ids=node_ids,
        xy=np.asarray(fin.mesh.nodes[node_ids]),
        eig_trace=trace,
        gains=gains,
        candidates=cand,
    )


def with_sensor_qoi(fin, node_ids: np.ndarray):
    """A FiveParamFin whose observation operator is the given POINTWISE
    sensors instead of the five subfin averages: qoi rows become one-hot
    selectors at the sensors' solution indices. Everything downstream
    (snapshots, ROM lifted QoI, NN output dim, misfits, samplers) follows
    op.n_obs/op.observe, so `api.build_pipeline(cfg, fin=with_sensor_qoi(
    fin, design.node_ids))` inverts the designed observables end to end."""
    import dataclasses as _dc

    idx = solution_indices(fin)[np.asarray(node_ids)]
    B = np.zeros((len(idx), fin.op.n), dtype=np.asarray(fin.op.qoi).dtype)
    B[np.arange(len(idx)), idx] = 1.0
    # both the device operator AND the host assembly carry qoi rows — the
    # f64 offline ROM projection reads host.qoi (rom/galerkin.py
    # project_host), so replace both or the reduced observables keep the
    # old dimension
    host = _dc.replace(fin.host, qoi=np.asarray(B, np.float64))
    return _dc.replace(
        fin, host=host, op=_dc.replace(fin.op, qoi=jnp.asarray(B))
    )


def eig_of_subset(
    J: jax.Array,
    subset: np.ndarray,
    noise_sigma: float,
    *,
    prior_chol: Optional[jax.Array] = None,
) -> float:
    """Exact EIG of a FIXED sensor subset (for brute-force oracles and for
    scoring random baselines): 1/2 mean_b log det(I + sigma^-2 Jw_S^T Jw_S
    ... ) computed in the d x d dual form."""
    Jw = J if prior_chol is None else jnp.einsum("bnd,de->bne", J, prior_chol)
    Jw = jnp.asarray(Jw, jnp.promote_types(jnp.asarray(J).dtype, jnp.float32))
    Jw = Jw[:, np.asarray(subset), :]
    d = Jw.shape[-1]
    inv_s2 = 1.0 / float(noise_sigma) ** 2
    M = jnp.eye(d, dtype=Jw.dtype) + inv_s2 * jnp.einsum("bnd,bne->bde", Jw, Jw)
    sign, logdet = jnp.linalg.slogdet(M)
    return float(0.5 * jnp.mean(logdet))
