"""Affinized reduced-order model for the full-field (nodal-k) problem
(SURVEY.md A.2 non-affine case, A.3).

A(k_nodal) is LINEAR in the nodal conductivity, so projecting k onto an
m_k-dimensional POD basis W of conductivity snapshots makes the operator
affine again — exactly (not approximately) whenever k lies in span(W):

    k ~ W c,   A(k) = sum_q c_q A(w_q),   Ahat(k) = sum_q c_q (V^T A(w_q) V)

The offline stage therefore precomputes the (m_k, r, r) stack of projected
component operators in float64 on the host; online, a reduced solve is a
(n x m_k) coefficient projection, an m_k-term contraction, and an r x r
dense solve — the same shape of work as the 5-parameter affine ROM, just
with m_k components. This is the classical linear-coefficient variant of
EIM: no interpolation error because the nonlinearity (exp of the log-field)
is absorbed into the coefficient projection, not the operator.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _nodal_vals_host(G: np.ndarray, offsets: np.ndarray, k: np.ndarray) -> np.ndarray:
    """float64 host mirror of NodalStencilOperator.vals (stiffness part)."""
    n, nd, _ = G.shape
    m = int(np.max(np.abs(offsets)))
    k_pad = np.pad(k, (m, m))
    vals = np.zeros((n, nd))
    for d, off in enumerate(offsets):
        vals += G[:, :, d] * k_pad[m + off : m + off + n][:, None]
    return vals


def _stencil_apply_host(vals: np.ndarray, offsets: np.ndarray, U: np.ndarray) -> np.ndarray:
    """float64 host stencil SpMV on a block of vectors U (n, r)."""
    n = vals.shape[0]
    m = int(np.max(np.abs(offsets)))
    U_pad = np.pad(U, ((m, m), (0, 0)))
    out = np.zeros_like(U)
    for s, off in enumerate(offsets):
        out += vals[:, s : s + 1] * U_pad[m + off : m + off + n]
    return out


def _project_f64(op, G_host: np.ndarray, V: np.ndarray, W: np.ndarray):
    """float64 host projection core shared by project_host and the greedy
    builder: (Ahat (m_k, r, r), Mhat (r, r), Fhat (r,), Bhat (n_obs, r))."""
    offsets = np.asarray(op.offsets)
    m_k = W.shape[1]
    Ahat = np.zeros((m_k, V.shape[1], V.shape[1]))
    for q in range(m_k):
        vals_q = _nodal_vals_host(G_host, offsets, W[:, q])
        Ahat[q] = V.T @ _stencil_apply_host(vals_q, offsets, V)
    ext = np.asarray(op.base.ext_mass, np.float64)
    MV = _stencil_apply_host(ext, offsets, V)
    return (
        Ahat,
        V.T @ MV,
        V.T @ np.asarray(op.F_root, np.float64),
        np.asarray(op.qoi, np.float64) @ V,
    )


def greedy_basis_nonaffine(
    op,
    G_host: np.ndarray,
    ks: np.ndarray,  # (N, n) candidate conductivity fields
    S: np.ndarray,  # (N, n) their FOM solutions (the POD path solves all N anyway)
    W: np.ndarray,  # (n, m_k) conductivity basis (fixed during state-basis greedy)
    r: int,
    *,
    seed_index: int = 0,
):
    """Greedy state-basis selection for the affinized full-field ROM
    (SURVEY.md §2a-5 / A.3 'greedy alternative'; the five-param analog is
    rom/greedy.py).

    The candidate snapshots are already solved — the POD path pays one
    batched FOM sweep for all N — so greedy here is a SELECTION rule, not
    an extra solve loop: each iteration projects the affinized operator
    onto the current basis (exact f64 host projection via _project_f64),
    sweeps the full-space residual-norm error indicator over every
    candidate field, and admits the worst-approximated candidate's
    solution, f64-QR-re-orthonormalized. All host f64 (TPU dense linalg is
    off the table per CLAUDE.md rule 5; the candidate stencil values are
    V-independent and precomputed once).

    Returns (V (n, r) float64 orthonormal, selected indices, indicator
    trace). Measured POD-vs-greedy comparison at equal r:
    artifacts/greedy_ff_r4.json (scripts/greedy_ff_compare.py)."""
    offsets = np.asarray(op.offsets)
    biot = float(op.base.biot)
    ks64 = np.asarray(ks, np.float64)
    S64 = np.asarray(S, np.float64)
    N = ks64.shape[0]
    W64 = np.asarray(W, np.float64)
    F = np.asarray(op.F_root, np.float64)
    ext = np.asarray(op.base.ext_mass, np.float64)
    # candidate operator values (stiffness + Robin mass) are V-independent
    vals_all = np.stack(
        [_nodal_vals_host(G_host, offsets, ks64[i]) + biot * ext for i in range(N)]
    )
    C_all = ks64 @ W64  # (N, m_k) affinization coefficients

    sel = [int(seed_index)]
    indicators = [float(np.linalg.norm(F))]  # the r=0 residual is F itself
    while len(sel) < r:
        V, _ = np.linalg.qr(S64[np.asarray(sel)].T)
        Ahat, Mhat, Fhat, _ = _project_f64(op, G_host, V, W64)
        A = np.tensordot(C_all, Ahat, axes=1) + biot * Mhat  # (N, r_i, r_i)
        rhs = np.broadcast_to(Fhat, (N, Fhat.shape[0]))[..., None]  # column vecs
        u_r = np.linalg.solve(A, rhs)[..., 0]
        lifted = u_r @ V.T  # (N, n)
        ind = np.empty(N)
        for i in range(N):
            Ax = _stencil_apply_host(vals_all[i], offsets, lifted[i][:, None])[:, 0]
            ind[i] = np.linalg.norm(F - Ax)
        # never re-select: a noise-floored indicator can re-pick a candidate
        # already in span(V), degenerating the basis (rom/greedy.py rule)
        ind[np.asarray(sel)] = -np.inf
        j = int(np.argmax(ind))
        if ind[j] < 1e-12 * indicators[0]:
            break  # every candidate represented; basis saturated
        sel.append(j)
        indicators.append(float(ind[j]))
    V, _ = np.linalg.qr(S64[np.asarray(sel)].T)
    return V, np.asarray(sel), np.asarray(indicators)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["W", "Ahat", "Mhat", "Fhat", "Bhat", "V"],
    meta_fields=["biot"],
)
@dataclasses.dataclass(frozen=True)
class AffinizedReducedOperator:
    """Reduced operator for the full-field problem via k-POD affinization.

    W (n, m_k): conductivity POD basis; Ahat (m_k, r, r); rest as in
    rom.galerkin.ReducedOperator."""

    W: jax.Array
    Ahat: jax.Array
    Mhat: jax.Array
    Fhat: jax.Array
    Bhat: jax.Array
    V: jax.Array
    biot: float

    @property
    def r(self) -> int:
        return self.Ahat.shape[-1]

    @property
    def m_k(self) -> int:
        return self.Ahat.shape[0]

    @classmethod
    def project_host(
        cls, op, G_host: np.ndarray, V: np.ndarray, W: np.ndarray, dtype=jnp.float32
    ) -> "AffinizedReducedOperator":
        """Exact float64 offline projection. op: NodalStencilOperator (for
        offsets / boundary mass / loads via its host-compatible arrays)."""
        V = np.asarray(V, np.float64)
        W = np.asarray(W, np.float64)
        Ahat, Mhat, Fhat, Bhat = _project_f64(op, G_host, V, W)
        return cls(
            W=jnp.asarray(W, dtype),
            Ahat=jnp.asarray(Ahat, dtype),
            Mhat=jnp.asarray(Mhat, dtype),
            Fhat=jnp.asarray(Fhat, dtype),
            Bhat=jnp.asarray(Bhat, dtype),
            V=jnp.asarray(V, dtype),
            biot=float(op.base.biot),
        )

    # --- online --------------------------------------------------------------
    def coeffs(self, k_nodal: jax.Array) -> jax.Array:
        """c = W^T k — the conductivity-basis projection (one tall matvec)."""
        return jnp.dot(self.W.T, jnp.asarray(k_nodal, self.W.dtype),
                       precision=jax.lax.Precision.HIGHEST)

    def assemble(self, c: jax.Array) -> jax.Array:
        hi = jax.lax.Precision.HIGHEST
        A = jnp.einsum("q,qrs->rs", c, self.Ahat, precision=hi)
        return A + self.Ahat.dtype.type(self.biot) * self.Mhat

    def solve(self, k_nodal: jax.Array) -> jax.Array:
        A = self.assemble(self.coeffs(k_nodal))
        cf = jax.scipy.linalg.cho_factor(A)
        return jax.scipy.linalg.cho_solve(cf, self.Fhat)

    def forward(self, k_nodal: jax.Array) -> jax.Array:
        """G_ROM: nodal conductivity -> QoI observables."""
        return jnp.dot(self.Bhat, self.solve(k_nodal),
                       precision=jax.lax.Precision.HIGHEST)

    def forward_batch(self, ks: jax.Array) -> jax.Array:
        return jax.vmap(self.forward)(ks)

    def preconditioner(self, c_ref: jax.Array) -> jax.Array:
        """P0 = Ahat(c_ref)^{-1} in f64 on the host (hot-loop PCG)."""
        A = np.tensordot(np.asarray(c_ref, np.float64), np.asarray(self.Ahat, np.float64), axes=1)
        A = A + self.biot * np.asarray(self.Mhat, np.float64)
        return jnp.asarray(np.linalg.inv(A), self.Ahat.dtype)

    def fast_forward(self, P0: jax.Array, n_iters: int = 25, precision=None,
                     differentiable: bool = True):
        """k_nodal -> y via fixed-iteration preconditioned CG (see
        rom.galerkin.ReducedOperator.solve_pcg — same construction,
        including the precision ladder and the direct non-differentiable
        route for sampler hot loops)."""
        hi = jax.lax.Precision.HIGHEST if precision is None else precision

        def f(k_nodal):
            c = self.coeffs(k_nodal)

            def amat(p):
                Ap = jnp.einsum("q,qrs,s->r", c, self.Ahat, p, precision=hi)
                return Ap + self.Ahat.dtype.type(self.biot) * jnp.dot(self.Mhat, p, precision=hi)

            def prec(v):
                return jnp.dot(P0, v, precision=hi)

            def pcg_solve(mv, b):
                x = prec(b)
                r_ = b - mv(x)
                # derive x from the (chain-varying) residual so every
                # fori_loop carry leaf shares the device-varying axis under
                # shard_map (rom/galerkin.py has the same fix)
                x = x + r_ * 0
                z = prec(r_)
                p = z
                rz = jnp.vdot(r_, z)

                def body(_, carry):
                    x, r_, p, rz = carry
                    Ap = mv(p)
                    pAp = jnp.vdot(p, Ap)
                    alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
                    x = x + alpha * p
                    r_ = r_ - alpha * Ap
                    z = prec(r_)
                    rz_new = jnp.vdot(r_, z)
                    beta = rz_new / jnp.where(rz != 0, rz, 1.0)
                    return x, r_, z + beta * p, rz_new

                x, _, _, _ = jax.lax.fori_loop(0, n_iters, body, (x, r_, p, rz))
                return x

            if differentiable:
                u_r = jax.lax.custom_linear_solve(
                    amat, self.Fhat, solve=pcg_solve, symmetric=True
                )
            else:
                u_r = pcg_solve(amat, self.Fhat)
            return jnp.dot(self.Bhat, u_r, precision=jax.lax.Precision.HIGHEST)

        return f

    def residual_norm(self, op, k_nodal: jax.Array) -> jax.Array:
        """Full-space residual error indicator (greedy / a-posteriori)."""
        u_r = self.solve(k_nodal)
        lifted = jnp.dot(self.V, u_r, precision=jax.lax.Precision.HIGHEST)
        return jnp.linalg.norm(op.F_root - op.apply(k_nodal, lifted))
