"""In-repo BFGS minimizer (jit/vmap-safe) for MAP estimation.

The reference leans on SciPy's BFGS family (SURVEY.md §2a #9); jax 0.9
removed ``jax.scipy.optimize``, so the framework carries its own compact
implementation: dense-inverse BFGS with Armijo backtracking line search,
entirely in ``lax.while_loop`` so the whole MAP search jit-compiles and can
be vmapped over multistarts. Dimension here is tiny (5, or a reduced field),
so the dense d x d inverse-Hessian update is the right tool.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class BFGSResult(NamedTuple):
    x: jax.Array
    fun: jax.Array
    grad_norm: jax.Array
    n_iter: jax.Array
    converged: jax.Array


class _State(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    H: jax.Array  # inverse-Hessian approximation
    it: jax.Array


@partial(jax.jit, static_argnames=("fun", "maxiter", "max_ls"))
def minimize_bfgs(
    fun: Callable,
    x0: jax.Array,
    *,
    maxiter: int = 200,
    gtol: float = 1e-8,
    max_ls: int = 25,
) -> BFGSResult:
    dtype = x0.dtype
    d = x0.shape[0]
    vg = jax.value_and_grad(fun)
    f0, g0 = vg(x0)
    eye = jnp.eye(d, dtype=dtype)
    c1 = jnp.asarray(1e-4, dtype)

    def cond(s: _State):
        return jnp.logical_and(s.it < maxiter, jnp.linalg.norm(s.g) > gtol)

    def body(s: _State):
        p = -(s.H @ s.g)
        gp = jnp.vdot(s.g, p)
        # fall back to steepest descent if p is not a descent direction
        bad = gp >= 0
        p = jnp.where(bad, -s.g, p)
        gp = jnp.where(bad, -jnp.vdot(s.g, s.g), gp)

        def sufficient(alpha, f_new):
            # NaN-safe Armijo: NaN/inf objective counts as "not sufficient",
            # so backtracking continues instead of silently accepting it
            # (exp() in log-conductivity models overflows at full steps).
            return f_new <= s.f + c1 * alpha * gp

        def ls_cond(carry):
            alpha, f_new, ls = carry
            return jnp.logical_and(ls < max_ls, jnp.logical_not(sufficient(alpha, f_new)))

        def ls_body(carry):
            alpha, _, ls = carry
            alpha = alpha * 0.5
            return alpha, fun(s.x + alpha * p), ls + 1

        alpha0 = jnp.asarray(1.0, dtype)
        alpha, f_new, _ = lax.while_loop(
            ls_cond, ls_body, (alpha0, fun(s.x + alpha0 * p), jnp.array(0, jnp.int32))
        )
        x_new = s.x + alpha * p
        f_new, g_new = vg(x_new)
        # if the line search failed to decrease, keep the old iterate (the
        # gradient-norm condition will end things if truly stuck)
        accept = jnp.logical_and(jnp.isfinite(f_new), f_new <= s.f)
        x_acc = jnp.where(accept, x_new, s.x)
        g_acc = jnp.where(accept, g_new, s.g)
        f_acc = jnp.where(accept, f_new, s.f)

        sv = x_new - s.x
        y = g_new - s.g
        sy = jnp.vdot(sv, y)
        finite = jnp.all(jnp.isfinite(y)) & jnp.all(jnp.isfinite(sv))
        ok = accept & finite & (
            sy > 1e-12 * jnp.linalg.norm(sv) * jnp.linalg.norm(y) + jnp.finfo(dtype).tiny
        )
        # classic first-update scaling: H <- (s.y / y.y) I before the update
        first = s.it == 0
        yy = jnp.vdot(y, y)
        H_base = jnp.where(
            first & ok, (sy / jnp.where(yy > 0, yy, 1.0)) * eye, s.H
        )
        rho = jnp.where(ok, 1.0 / jnp.where(ok, sy, 1.0), 0.0)
        A = eye - rho * jnp.outer(sv, y)
        H_new = A @ H_base @ A.T + rho * jnp.outer(sv, sv)
        H_new = jnp.where(ok, H_new, s.H)
        return _State(x=x_acc, f=f_acc, g=g_acc, H=H_new, it=s.it + 1)

    out = lax.while_loop(cond, body, _State(x0, f0, g0, eye, jnp.array(0, jnp.int32)))
    gn = jnp.linalg.norm(out.g)
    return BFGSResult(x=out.x, fun=out.f, grad_norm=gn, n_iter=out.it, converged=gn <= gtol)
