"""POD basis construction (SURVEY.md A.3).

Thin SVD of the snapshot matrix via the Gram-matrix eigendecomposition
(method of snapshots): for S of shape (N, n) with N << n, eigh of S S^T is an
(N x N) on-chip problem, and V = S^T W / sqrt(lambda). Equivalent to the
reference's SVD-of-snapshots (SURVEY.md §3.3) but sized for the device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PODResult(NamedTuple):
    V: jnp.ndarray  # (n, r) orthonormal basis
    singular_values: jnp.ndarray  # (N,) full spectrum (for energy plots)
    energy: jnp.ndarray  # (N,) cumulative energy fraction


def pod_basis(snapshots: jnp.ndarray, r: int) -> PODResult:
    """Leading-r POD basis of row-stacked snapshots (N, n)."""
    S = snapshots
    G = S @ S.T  # (N, N) Gram
    w, W = jnp.linalg.eigh(G)  # ascending
    w = w[::-1]
    W = W[:, ::-1]
    w_pos = jnp.maximum(w, 0.0)
    sv = jnp.sqrt(w_pos)
    inv = jnp.where(sv > sv[0] * 1e-12, 1.0 / jnp.maximum(sv, jnp.finfo(S.dtype).tiny), 0.0)
    V = S.T @ (W[:, :r] * inv[:r][None, :])  # (n, r)
    energy = jnp.cumsum(w_pos) / jnp.maximum(jnp.sum(w_pos), jnp.finfo(S.dtype).tiny)
    return PODResult(V=V, singular_values=sv, energy=energy)


def orthonormality_error(V: jnp.ndarray) -> jnp.ndarray:
    r = V.shape[1]
    return jnp.max(jnp.abs(V.T @ V - jnp.eye(r, dtype=V.dtype)))


def pod_basis_host(snapshots, r: int):
    """float64 host-side POD (NumPy) regardless of snapshot dtype.

    The Gram matrix's condition number is kappa(S)^2, so float32 eigh destroys
    every mode below ~sqrt(eps32) relative energy — at r=40 that is a ~2%
    reconstruction floor. The offline POD is cheap, so it always runs in f64
    on the host; only the projected operators are cast down for the online
    path (SURVEY.md §7 Hard parts #1 applied to the ROM).

    Returns (V: (n, r) float64 ndarray, singular_values: (N,) ndarray).
    """
    import numpy as np

    S = np.asarray(snapshots, dtype=np.float64)
    G = S @ S.T
    w, W = np.linalg.eigh(G)
    w = w[::-1]
    W = W[:, ::-1]
    w_pos = np.maximum(w, 0.0)
    sv = np.sqrt(w_pos)
    inv = np.where(sv > sv[0] * 1e-14, 1.0 / np.maximum(sv, np.finfo(np.float64).tiny), 0.0)
    V = S.T @ (W[:, :r] * inv[:r][None, :])
    # one Gram-Schmidt pass to clean the trailing modes
    Q, _ = np.linalg.qr(V)
    return Q, sv
