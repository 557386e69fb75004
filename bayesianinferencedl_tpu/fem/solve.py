"""Batched Jacobi-PCG FOM solver (SURVEY.md §7 stage 2, §2b PETSc row).

Replaces the reference's PETSc/UMFPACK sparse direct solves with a
matrix-free, vmappable preconditioned conjugate gradient:

  * the iteration lives in ``lax.while_loop`` with a fixed iteration budget
    plus a residual predicate — under ``vmap`` JAX runs the loop while any
    lane is active and freezes converged lanes, which is exactly the
    "mask converged lanes" strategy of SURVEY.md §7 "Hard parts" #3;
  * the outer entry point wraps the solve in ``lax.custom_linear_solve``
    so reverse- and forward-mode AD differentiate *implicitly* (adjoint
    solves with the same PCG) instead of unrolling the loop — this is the
    TPU-native replacement for the reference's hand-coded adjoints
    (SURVEY.md §2a #11); and
  * optional iterative refinement re-solves the residual equation with the
    residual evaluated in float64 to push beyond the f32 accuracy floor
    (SURVEY.md §7 "Hard parts" #1). Requires x64 to be enabled for full
    effect; with x64 disabled it still does plain refinement in f32.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from bayesianinferencedl_tpu.fem.operators import FinOperator


class PCGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rz: jax.Array
    it: jax.Array


def pcg(matvec, b, diag, *, tol: float = 1e-10, maxiter: int = 2000, x0=None):
    """Jacobi-preconditioned CG for SPD systems. Returns (x, iters, relres).

    Stops at ||r|| <= tol * ||b|| or maxiter. All shapes static; safe under
    jit and vmap.
    """
    dtype = b.dtype
    inv_diag = jnp.where(diag != 0, 1.0 / diag, 0.0).astype(dtype)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    z0 = inv_diag * r0
    rz0 = jnp.vdot(r0, z0)
    b_nrm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(jnp.finfo(dtype).tiny, dtype))
    tol2 = jnp.asarray(tol, dtype) ** 2 * b_nrm2
    # Derive the initial x, the iteration counter, and the tolerance from the
    # (possibly device-varying) residual so every value in the while_loop has
    # consistent vma axes under shard_map — fresh constants would be
    # 'unvarying' and fail to unify with the varying carry.
    x0 = x0 + z0 * 0
    it0 = (rz0 * 0).astype(jnp.int32)
    tol2 = tol2 + rz0 * 0
    maxiter_v = it0 + maxiter

    def cond(s: PCGState):
        return jnp.logical_and(s.it < maxiter_v, jnp.vdot(s.r, s.r) > tol2)

    def body(s: PCGState):
        Ap = matvec(s.p)
        pAp = jnp.vdot(s.p, Ap)
        alpha = jnp.where(pAp > 0, s.rz / pAp, 0.0)
        x = s.x + alpha * s.p
        r = s.r - alpha * Ap
        z = inv_diag * r
        rz = jnp.vdot(r, z)
        beta = jnp.where(s.rz > 0, rz / s.rz, 0.0)
        p = z + beta * s.p
        return PCGState(x, r, p, rz, s.it + 1)

    out = lax.while_loop(cond, body, PCGState(x0, r0, z0, rz0, it0))
    relres = jnp.sqrt(jnp.vdot(out.r, out.r) / b_nrm2)
    return out.x, out.it, relres


def _pcg_solve_only(matvec, b, diag, tol, maxiter, x0=None):
    x, _, _ = pcg(matvec, b, diag, tol=tol, maxiter=maxiter, x0=x0)
    return x


@partial(jax.jit, static_argnames=("tol", "maxiter", "refine_steps"))
def solve_fom(
    op,
    k: jax.Array,
    F: jax.Array | None = None,
    *,
    tol: float = 1e-8,
    maxiter: int = 2000,
    refine_steps: int = 0,
) -> jax.Array:
    """Solve A(k) u = F, differentiable in k and F.

    ``op`` is any affine operator exposing vals/diag/matvec/F_root — the ELL
    :class:`FinOperator` or the gather-free :class:`fem.dia.StencilOperator`.

    The linear solve is wrapped in ``lax.custom_linear_solve(symmetric=True)``:
    JVPs/VJPs trigger extra PCG solves against the same operator rather than
    differentiating through the iteration. vmap over a batch of k (and
    optionally F) gives the batched FOM of SURVEY.md §3.2.
    """
    if F is None:
        F = op.F_root
    vals = op.vals(k)
    diag = op.diag(vals)

    def mv(x):
        return op.matvec(vals, x)

    def slv(matvec, b):
        x = _pcg_solve_only(matvec, b, lax.stop_gradient(diag), tol, maxiter)
        for _ in range(refine_steps):
            # High-precision residual: promotes to f64 when x64 is enabled.
            hp_vals = lax.stop_gradient(vals).astype(jnp.float64)
            r_hp = b.astype(jnp.float64) - op.matvec(hp_vals, x.astype(jnp.float64))
            dx = _pcg_solve_only(matvec, r_hp.astype(b.dtype), lax.stop_gradient(diag), tol, maxiter)
            x = (x.astype(jnp.float64) + dx.astype(jnp.float64)).astype(b.dtype)
        return x

    return lax.custom_linear_solve(mv, F.astype(vals.dtype), solve=slv, symmetric=True)


def forward(op: FinOperator, k: jax.Array, **kw) -> jax.Array:
    """Full forward map G_FOM: k -> QoI observables y = B u(k).

    This is the rebuild of the reference's ``Fin.forward`` + ``qoi_operator``
    composition (SURVEY.md §3.1)."""
    u = solve_fom(op, k, **kw)
    return op.observe(u)


def solve_fom_batch(op: FinOperator, ks: jax.Array, **kw) -> jax.Array:
    """vmapped FOM solve over a batch of conductivity vectors (SURVEY.md §3.2:
    the reference's python sample loop becomes one vmap)."""
    return jax.vmap(lambda k: solve_fom(op, k, **kw))(ks)
