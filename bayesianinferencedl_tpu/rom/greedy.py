"""Greedy reduced-basis construction (SURVEY.md §3.3, §7 Hard parts #5).

The outer greedy loop is inherently sequential (each iteration adds the FOM
solution at the worst-approximated parameter), so it runs as a short host
loop; the expensive part — the error-indicator sweep over the candidate set —
is a single jitted vmap per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.rom.galerkin import ReducedOperator


class GreedyResult(NamedTuple):
    V: jnp.ndarray  # (n, r) orthonormal basis (device dtype)
    selected: np.ndarray  # (r,) candidate indices chosen
    indicators: np.ndarray  # (r,) max indicator value at each iteration
    snapshots: np.ndarray  # (n, r) the basis columns as built on-device:
    # the (unnormalized-span) first FOM solution, then f32-MGS-orthonormalized
    # residual directions of each selected solution — NOT raw FOM solutions.
    # Feed to orthonormalize_host to restore f64 orthonormality for the
    # offline-f64 projection path.


def _indicator_sweep(op: FinOperator, rom: ReducedOperator, ks: jax.Array) -> jax.Array:
    """Residual-norm error indicator at every candidate, vmapped."""
    return jax.vmap(lambda k: rom.residual_norm(op, k))(ks)


def greedy_basis(
    op: FinOperator,
    candidates: jax.Array,
    r: int,
    *,
    tol: float = 1e-10,
    maxiter: int = 3000,
    seed_index: int = 0,
) -> GreedyResult:
    """Build an r-dimensional basis by greedy selection over ``candidates``.

    Iteration: project -> sweep residual indicator over candidates -> pick the
    argmax -> solve the FOM there -> Gram-Schmidt the new snapshot into V.
    """
    sweep = jax.jit(_indicator_sweep)
    solve = jax.jit(lambda k: solve_fom(op, k, tol=tol, maxiter=maxiter))

    hi = jax.lax.Precision.HIGHEST  # TPU matmuls default to bf16 MXU passes;
    # bf16 Gram-Schmidt leaves ~1e-2 cross-terms that destroy the basis

    u0 = solve(candidates[seed_index])
    V = (u0 / jnp.linalg.norm(u0))[:, None]
    selected = [int(seed_index)]
    indicators = [float(jnp.linalg.norm(u0))]
    snaps = [np.asarray(u0, np.float64)]

    for _ in range(1, r):
        rom = ReducedOperator.project(op, V)
        ind = np.array(sweep(op, rom, candidates))  # writable host copy
        # never re-select: a noise-floored indicator can re-pick a candidate
        # whose snapshot is already in span(V), degenerating the basis
        ind[np.asarray(selected)] = -np.inf
        j = int(np.argmax(ind))
        indicators.append(float(ind[j]))
        selected.append(j)
        u = solve(candidates[j])
        # Modified Gram-Schmidt (twice, for orthogonality at f32)
        for _ in range(2):
            u = u - jnp.dot(V, jnp.dot(V.T, u, precision=hi), precision=hi)
        nrm = jnp.linalg.norm(u)
        if float(nrm) < 1e-6 * float(indicators[0]):
            break  # candidate already represented; basis saturated
        V = jnp.concatenate([V, (u / nrm)[:, None]], axis=1)
        snaps.append(np.asarray(u / nrm, np.float64))

    return GreedyResult(
        V=V,
        selected=np.array(selected),
        indicators=np.array(indicators),
        snapshots=np.stack(snaps, axis=1),
    )


def orthonormalize_host(snapshots: np.ndarray) -> np.ndarray:
    """float64 host re-orthonormalization of the greedy basis columns.

    The greedy loop orthonormalizes on-device at the working dtype (f32 on
    TPU), which leaves ~1e-4-scale cross-terms in V^T V — the same f32 floor
    pod_basis_host exists to avoid. A host QR restores ORTHONORMALITY to
    machine-f64 (the span itself is already fixed by the on-device f32
    Gram-Schmidt — only the cross-terms are repaired), giving greedy the
    same offline-f64 / online-f32 precision architecture as the POD path
    (VERDICT.md round-1 item 8)."""
    Q, _ = np.linalg.qr(np.asarray(snapshots, np.float64))
    return Q
