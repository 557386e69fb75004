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
    V: jnp.ndarray  # (n, r) orthonormal basis
    selected: np.ndarray  # (r,) candidate indices chosen
    indicators: np.ndarray  # (r,) max indicator value at each iteration


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

    u0 = solve(candidates[seed_index])
    V = (u0 / jnp.linalg.norm(u0))[:, None]
    selected = [int(seed_index)]
    indicators = [float(jnp.linalg.norm(u0))]

    for _ in range(1, r):
        rom = ReducedOperator.project(op, V)
        ind = sweep(op, rom, candidates)
        j = int(jnp.argmax(ind))
        indicators.append(float(ind[j]))
        selected.append(j)
        u = solve(candidates[j])
        # Modified Gram-Schmidt (twice, for orthogonality at f32)
        for _ in range(2):
            u = u - V @ (V.T @ u)
        nrm = jnp.linalg.norm(u)
        if float(nrm) < 1e-12:
            break  # candidate already represented; basis saturated
        V = jnp.concatenate([V, (u / nrm)[:, None]], axis=1)

    return GreedyResult(V=V, selected=np.array(selected), indicators=np.array(indicators))
