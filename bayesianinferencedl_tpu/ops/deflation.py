"""Two-level deflation preconditioner for the fused stencil-CG kernels.

Jacobi-CG iteration counts on the fin grow like 1/h^2 because the low
(smooth) end of A(k)'s spectrum is untouched by diagonal scaling. This
module removes it with an additive coarse correction

    M^-1 = D^-1 + W B(k)^-1 W^T,      B(k) = W^T A(k) W,

where W (n, m) is a SHARED coarse space (same W for every conductivity
sample) and B(k) inherits the operator's affine structure:
B(k) = sum_i k_i C_i + Bi * C_ext with C_* = W^T A_* W precomputed once per
mesh on the host in float64. Per sample, assembling and inverting the m x m
coarse matrix is a trivial batched XLA op; inside the Pallas kernel the
correction is two MXU matmuls (bf16 storage of W — preconditioner accuracy
only affects the convergence rate, never the solution) plus an m^2-size VPU
contraction.

Two coarse spaces, selected by `basis=`:

- "eig" (default): the m lowest generalized eigenvectors of
  (A(1), D(1)) at the log-mean conductivity k = 1, computed once per mesh
  by shift-invert Lanczos on the diagonally-scaled operator (SciPy eigsh,
  host f64). These are exactly the modes Jacobi-CG converges slowest on
  for the geometric-mean operator, and they transfer across the log-uniform
  k-range: measured mean-iteration cut vs the cosine space at equal m=128,
  tol=1e-7, 24 log-uniform draws — res4 49.2 -> 35.5, res8 97.3 -> 69.5,
  (~1.4x) with the max cut matching the mean cut.
- "cosine": smooth tensor-cosine modes on the structured grid, masked to
  the fin domain and QR-orthonormalized — no eigensolve needed; kept as
  the fallback (and for hosts where SciPy's shift-invert fails). Measured
  cuts vs UNdeflated at tol=1e-7 (host oracle, res8): m=64: 3.3-4.1x,
  m=100: 3.7-4.7x, m=144: 4.5-5.6x.

A union of eigenspaces from several high-contrast corner k's was measured
WORSE than spending the whole budget at k=1 (res8 m=128: 95.1 vs 69.5 mean
iters) — splitting m dilutes the per-operator resolution faster than the
k-coverage pays. Doubling the budget (m=256, eig, res8 S=16 on-chip) cuts
iterations further (89 -> 65 mean) but is NET SLOWER (48.5 -> 64.5 ms per
256-batch): the per-iteration (S, m) x (S, m, m) coarse-inverse apply is a
VPU contraction whose cost grows with m^2 and at m=256 it outweighs the
iteration cut (and at res16 the bf16 W alone would bust VMEM). m=128 — one
MXU/lane tile — is the measured sweet spot.

This is the TPU-native answer to the multigrid crossover failure
(experimental/multigrid.py): the coarse space rides the MXU instead of a
V-cycle's masked-domain transfers, and the whole solve stays in one fused
kernel. (SURVEY.md §2b PETSc row, §7 hard-part 2.)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Wt", "C"],
    meta_fields=["m"],
)
@dataclasses.dataclass(frozen=True)
class DeflationBasis:
    """Shared coarse basis + affine-Galerkin component projections.

    Wt: (m, n) float32 — the orthonormal smooth modes, TRANSPOSED: the (m, n)
        orientation has the already-128-padded grid axis on lanes, so its
        bf16 VMEM copy costs m*n*2 bytes with no lane padding (an (n, m)
        copy would pad m up to 128 lanes and cost n*128*2 regardless of m).
        Both kernel matmuls contract against this one operand.
    C:  (6, m, m) float32 components: C[0..4] = W^T A_i W (region stiffness),
        C[5] = W^T M_ext W (Robin boundary mass).
    """

    Wt: jax.Array
    C: jax.Array
    m: int

    @classmethod
    def create(
        cls,
        host,
        biot: float = 0.1,
        *,
        m: int = 128,
        dtype=jnp.float32,
        basis: str = "eig",
    ) -> "DeflationBasis":
        """Build from a FinFEMDiaHost (fem/dia.py); all algebra in host
        float64 (offline-f64 rule). basis="eig" (default) uses the m lowest
        generalized eigenvectors of (A(1), D(1)) — ~1.4x fewer CG iterations
        than "cosine" at equal m (module docstring); falls back to "cosine"
        if the eigensolve fails."""
        As, Mext = host.to_scipy_components()
        mask = sum(A.diagonal() for A in As) > 0  # stiffness-domain rows

        W = None
        if basis == "eig":
            try:
                W = _eig_modes(As, Mext, biot, mask, m)
            except Exception:  # pragma: no cover - scipy/env dependent
                W = None
        if W is None:
            W = _cosine_modes(host, mask, m)
        W[~mask] = 0.0  # scrub QR's ~1e-16 dust off the structurally-zero rows

        C = np.stack([W.T @ (A @ W) for A in As] + [W.T @ (Mext @ W)])
        return cls(Wt=jnp.asarray(W.T.copy(), dtype), C=jnp.asarray(C, dtype), m=m)

    def coarse_matrices(self, ks: jax.Array, biot: float) -> jax.Array:
        """(B, 5) conductivities -> (B, m, m) coarse Galerkin matrices."""
        dt = self.C.dtype
        ks = jnp.asarray(ks, dt)
        return (
            jnp.einsum("bi,imk->bmk", ks, self.C[:5],
                       precision=jax.lax.Precision.HIGHEST)
            + dt.type(biot) * self.C[5][None]
        )

    def coarse_inverses_from_vals(
        self, op, vals_batch: jax.Array, n_iters: int = 24
    ) -> jax.Array:
        """Exact coarse inverses for a NON-affine (e.g. nodal-field)
        operator: project each sample's assembled stencil values through the
        basis on-device — B_ij = w_i . (A w_j) via m stencil matvecs + one
        matmul per sample — then Newton-Schulz invert. vals_batch: (B, n, 7)
        from vmap(op.vals); op supplies matvec. Cost per sample ~ m stencil
        applies: trivial next to the solve it accelerates."""
        Wt = self.Wt.astype(vals_batch.dtype)  # (m, n)

        def project(vals):  # (n, 7) -> (m, m)
            AW = jax.vmap(lambda w: op.matvec(vals, w))(Wt)  # (m, n), rows A w_j
            return jnp.dot(
                Wt, AW.T, precision=jax.lax.Precision.HIGHEST
            )  # B[i, j] = w_i . (A w_j)

        Bk = jax.lax.map(project, vals_batch)  # sequential: bounds memory
        return _newton_schulz(Bk, self.m, n_iters)

    def coarse_inverses(self, ks: jax.Array, biot: float, n_iters: int = 24) -> jax.Array:
        """(B, 5) -> (B, m, m) inverses of the coarse matrices via batched
        Newton-Schulz iteration X <- X (2I - B X) from X0 = I / lambda_max
        (Gershgorin bound) — pure MXU matmuls, quadratically convergent for
        SPD B since ||I - B X0|| = 1 - lambda_min/lambda_max < 1.

        Deliberately NOT jnp.linalg.inv: the LU custom call fails to compile
        on this environment's chipless AOT helper ("Failed to find host
        bounds for accelerator type"), and a preconditioner-grade inverse
        only needs matmuls anyway."""
        Bk = self.coarse_matrices(ks, biot)
        return _newton_schulz(Bk, self.m, n_iters)


def _eig_modes(As, Mext, biot: float, mask: np.ndarray, m: int) -> np.ndarray:
    """(n, m) f64 orthonormal: the m lowest generalized eigenvectors of
    (A(1), D(1)) at the geometric-mean conductivity, via shift-invert
    Lanczos on the symmetrically scaled S = D^-1/2 A D^-1/2 (off-domain
    rows get identity so S is SPD; their eigenvalue is 1, far above the
    smooth band). Deterministic start vector for reproducible builds."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = Mext.shape[0]
    A = biot * Mext
    for Ai in As:
        A = A + Ai
    A = (A + sp.diags(np.where(mask, 0.0, 1.0))).tocsr()
    d = A.diagonal()
    Dm = sp.diags(1.0 / np.sqrt(d))
    S = (Dm @ A @ Dm).tocsc()
    lu = spla.splu(S)
    op = spla.LinearOperator(S.shape, matvec=lu.solve)
    v0 = np.full(n, 1.0 / np.sqrt(n))
    # loose Lanczos tol: preconditioner-grade modes only need the right
    # subspace to a few digits (measured: no iteration-count change vs 1e-6)
    _, vecs = spla.eigsh(S, k=m, sigma=0, which="LM", OPinv=op, tol=1e-4, v0=v0)
    V = Dm @ vecs  # undo the scaling: generalized modes of (A, D)
    V[~mask] = 0.0
    W, _ = np.linalg.qr(V)  # (n, m) f64 orthonormal
    return W


def _cosine_modes(host, mask: np.ndarray, m: int) -> np.ndarray:
    """(n, m) f64 orthonormal: the m lowest-frequency tensor-cosine modes on
    the structured grid (sorted by physical frequency (a/X)^2 + (b/Y)^2),
    masked to the stiffness domain and QR-orthonormalized."""
    n = host.n
    res = host.resolution
    x0g, y0g = 24 * res + 1, 16 * res + 1
    side = int(np.ceil(np.sqrt(m))) + 4
    freqs = sorted(
        ((a / x0g) ** 2 + (b / y0g) ** 2, a, b)
        for a in range(side * 2)
        for b in range(side * 2)
    )[:m]
    ix = np.arange(x0g)
    iy = np.arange(y0g)
    modes = np.empty((m, n))
    for i, (_, a, b) in enumerate(freqs):
        cx = np.cos(np.pi * a * (ix + 0.5) / x0g)
        cy = np.cos(np.pi * b * (iy + 0.5) / y0g)
        v = np.zeros(n)
        v[: x0g * y0g] = np.outer(cx, cy).reshape(-1)
        v[~mask] = 0.0
        modes[i] = v
    W, _ = np.linalg.qr(modes.T)  # (n, m) f64 orthonormal
    return W


def _newton_schulz(Bk: jax.Array, m: int, n_iters: int) -> jax.Array:
    """Batched SPD inverse X <- X (2I - B X) from X0 = I / lambda_max."""
    dt = Bk.dtype
    hp = jax.lax.Precision.HIGHEST
    lam_hi = jnp.max(jnp.sum(jnp.abs(Bk), axis=2), axis=1)  # (B,)
    X = jnp.eye(m, dtype=dt)[None] / lam_hi[:, None, None]
    eye2 = 2.0 * jnp.eye(m, dtype=dt)

    def step(X, _):
        BX = jnp.einsum("bij,bjk->bik", Bk, X, precision=hp)
        X = jnp.einsum("bij,bjk->bik", X, eye2[None] - BX, precision=hp)
        return X, None

    X, _ = jax.lax.scan(step, X, None, length=n_iters)
    return X
