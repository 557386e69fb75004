"""Snapshot generation: the reference's python sample loop (SURVEY.md §3.2)
collapsed into one vmapped batched FOM solve (BASELINE config 2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import solve_fom


def sample_log_uniform(key: jax.Array, n: int, dim: int = 5, lo: float = 0.1, hi: float = 10.0):
    """Log-uniform conductivity samples on [lo, hi]^dim (SURVEY.md A.2:
    'independent uniform/log-uniform on roughly [0.1, 10] per k_i')."""
    u = jax.random.uniform(key, (n, dim))
    return jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))


def generate_snapshots(
    op: FinOperator,
    ks: jax.Array,
    *,
    tol: float = 1e-10,
    maxiter: int = 3000,
    chunk: int | None = None,
) -> jax.Array:
    """Solve the FOM at each parameter sample; returns (n_samples, n) snapshots.

    ``chunk`` optionally splits the batch through lax.map to bound peak memory
    (each lane of the vmapped CG carries ~4 state vectors of size n).
    """
    f = lambda k: solve_fom(op, k, tol=tol, maxiter=maxiter)
    if chunk is None:
        return jax.vmap(f)(ks)
    n = ks.shape[0]
    pad = (-n) % chunk
    ks_p = jnp.concatenate([ks, jnp.broadcast_to(ks[:1], (pad, ks.shape[1]))]) if pad else ks
    out = jax.lax.map(jax.vmap(f), ks_p.reshape(-1, chunk, ks.shape[1]))
    return out.reshape(-1, out.shape[-1])[:n]
