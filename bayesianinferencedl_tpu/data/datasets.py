"""Training-set generation for the ROM-error surrogate (SURVEY.md §3.2).

The reference loops in Python over N samples, each doing a FEniCS solve and a
small ROM solve, then packages tf.data datasets. Here the whole generation is
two batched device computations: one vmapped FOM sweep and one vmapped ROM
sweep; the targets are the QoI discrepancies e = y_FOM - y_ROM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.rom.galerkin import ReducedOperator
from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform


class ErrorDataset(NamedTuple):
    log_k: jax.Array  # (N, 5) inputs (log-conductivity)
    error: jax.Array  # (N, m) targets y_FOM - y_ROM
    y_fom: jax.Array  # (N, m)
    y_rom: jax.Array  # (N, m)

    def split(self, n_train: int) -> tuple["ErrorDataset", "ErrorDataset"]:
        tr = ErrorDataset(*(a[:n_train] for a in self))
        te = ErrorDataset(*(a[n_train:] for a in self))
        return tr, te


def generate_error_dataset(
    op: FinOperator,
    rom: ReducedOperator,
    key: jax.Array,
    n_samples: int,
    *,
    lo: float = 0.1,
    hi: float = 10.0,
    tol: float = 1e-10,
    maxiter: int = 3000,
    chunk: int | None = None,
    fom_solver=None,
    rom_forward=None,
) -> ErrorDataset:
    """fom_solver: optional batched solver ks -> u batch (e.g. the fused
    Pallas PCG, ops.solve_fom_stencil_pallas); default is the vmapped
    implicit-diff solve. rom_forward: optional per-k reduced forward (e.g.
    the factorization-free rom.fast_forward — required for float64 on TPU,
    where dense linalg is unsupported but matmul-CG works)."""
    ks = sample_log_uniform(key, n_samples, lo=lo, hi=hi).astype(op.dtype)

    if fom_solver is not None:
        u = fom_solver(ks)
        y_fom = jax.vmap(op.observe)(u)
    else:
        def fom_qoi(k):
            return op.observe(solve_fom(op, k, tol=tol, maxiter=maxiter))

        if chunk is None:
            y_fom = jax.vmap(fom_qoi)(ks)
        else:
            pad = (-n_samples) % chunk
            # cycle rows so padding works even when pad > n_samples
            # (ks[:pad] alone under-fills for chunk > 2 * n_samples)
            pad_rows = ks[jnp.arange(pad) % n_samples] if pad else None
            ks_p = jnp.concatenate([ks, pad_rows]) if pad else ks
            y_fom = jax.lax.map(jax.vmap(fom_qoi), ks_p.reshape(-1, chunk, ks.shape[1]))
            y_fom = y_fom.reshape(-1, y_fom.shape[-1])[:n_samples]
    y_rom = jax.vmap(rom_forward)(ks) if rom_forward is not None else rom.forward_batch(ks)
    return ErrorDataset(log_k=jnp.log(ks), error=y_fom - y_rom, y_fom=y_fom, y_rom=y_rom)
