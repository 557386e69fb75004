"""Hand-coded adjoint gradient / Gauss-Newton HVP — the test oracle.

The reference implements these by hand as its only derivative path
(SURVEY.md §2a #11); the rebuild's production path is autodiff through
``lax.custom_linear_solve``, and this module re-derives the adjoint
explicitly so the two can be cross-checked (SURVEY.md §4 "keep one
hand-coded adjoint as oracle").

Math (SURVEY.md A.5): J(k) = 1/(2 s^2) ||B u(k) - d||^2 with A(k) u = F.
  adjoint solve:   A(k) p = -B^T (B u - d) / s^2      (A symmetric)
  gradient:        dJ/dk_i = p^T A_i u
  GN HVP:          v -> J_G^T J_G v / s^2 with J_G v = -B A^{-1} (A_v u),
                   A_v = sum_i v_i A_i  (incremental forward/adjoint pair)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import solve_fom


def adjoint_gradient(op: FinOperator, k, data, noise_sigma, *, tol=1e-12, maxiter=4000):
    """Explicit adjoint-method gradient of the data misfit wrt k (5,)."""
    u = solve_fom(op, k, tol=tol, maxiter=maxiter)
    misfit = (op.observe(u) - data) / noise_sigma**2
    rhs = -jnp.dot(op.qoi.T, misfit, precision=jax.lax.Precision.HIGHEST)
    p = solve_fom(op, k, F=rhs, tol=tol, maxiter=maxiter)
    grads = [jnp.vdot(p, op.apply_component(i, u)) for i in range(5)]
    return jnp.stack(grads)


def adjoint_gn_hvp(op: FinOperator, k, v, noise_sigma, *, tol=1e-12, maxiter=4000):
    """Explicit Gauss-Newton Hessian-vector product via one incremental
    forward solve and one incremental adjoint solve."""
    u = solve_fom(op, k, tol=tol, maxiter=maxiter)
    # incremental forward: A du = -A_v u
    Av_u = sum(v[i] * op.apply_component(i, u) for i in range(5))
    du = solve_fom(op, k, F=-Av_u, tol=tol, maxiter=maxiter)
    Jv = op.observe(du)  # dG/dk . v
    # incremental adjoint: A w = -B^T (Jv) / s^2 ; HVP_i = w^T A_i u... but for
    # pure GN in observation space: H v = J^T Sigma^{-1} J v. Expand:
    # (J^T y)_i = (d(Bu)/dk_i)^T y = (B A^{-1}(-A_i u))^T y = -(A_i u)^T A^{-1} B^T y
    rhs_w = jnp.dot(op.qoi.T, Jv / noise_sigma**2, precision=jax.lax.Precision.HIGHEST)
    w = solve_fom(op, k, F=rhs_w, tol=tol, maxiter=maxiter)
    hvp = [-jnp.vdot(op.apply_component(i, u), w) for i in range(5)]
    return jnp.stack(hvp)
