"""MAP estimation and Laplace approximation (SURVEY.md A.5, §3.5).

The reference finds the MAP with SciPy BFGS on hand-coded adjoint gradients
(SURVEY.md §2a #9/#11); here the objective's gradients flow by autodiff
through the implicit-differentiated PDE solve, and the Gauss-Newton Hessian
is assembled from jvp-of-vjp products. Everything jit-compiles; the optimizer
is an in-repo BFGS(-fallback-Adam) loop so the whole MAP search can run
on-device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class LaplaceApproximation(NamedTuple):
    """Gaussian posterior approximation N(mean, cov) (SURVEY.md A.5)."""

    mean: jax.Array  # (d,)
    cov: jax.Array  # (d, d)
    chol: jax.Array  # (d, d) lower Cholesky of cov

    def sample(self, key: jax.Array, shape: tuple = ()) -> jax.Array:
        z = jax.random.normal(key, (*shape, self.mean.shape[0]), dtype=self.mean.dtype)
        return self.mean + jnp.dot(z, self.chol.T, precision=jax.lax.Precision.HIGHEST)

    def log_density(self, theta: jax.Array) -> jax.Array:
        w = jax.scipy.linalg.solve_triangular(self.chol, theta - self.mean, lower=True)
        return -0.5 * jnp.sum(w * w, axis=-1) - jnp.sum(jnp.log(jnp.diag(self.chol)))


def negative_log_posterior(misfit_fn: Callable, prior: GaussianPrior) -> Callable:
    def nlp(theta):
        w = prior.whiten(theta)
        return misfit_fn(theta) + 0.5 * jnp.sum(w * w)

    return nlp


@partial(jax.jit, static_argnames=("misfit_fn", "maxiter"))
def find_map(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    *,
    maxiter: int = 200,
) -> tuple[jax.Array, jax.Array]:
    """Minimize misfit + prior via the in-repo BFGS (``infer.optimize``).
    Returns (theta_map, nlp)."""
    from bayesianinferencedl_tpu.infer.optimize import minimize_bfgs

    nlp = negative_log_posterior(misfit_fn, prior)
    res = minimize_bfgs(nlp, theta0, maxiter=maxiter, gtol=1e-8)
    return res.x, res.fun


def find_map_multistart(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_starts: int = 8,
    maxiter: int = 200,
) -> tuple[jax.Array, jax.Array]:
    """vmapped multi-start MAP search from prior samples; returns the best."""
    theta0s = prior.sample(key, (n_starts,))

    xs, fs = jax.vmap(lambda t0: find_map(misfit_fn, prior, t0, maxiter=maxiter))(theta0s)
    best = jnp.nanargmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
    return xs[best], fs[best]


def laplace_approximation(
    forward: Callable,
    data: jax.Array,
    noise_sigma: float,
    prior: GaussianPrior,
    theta_map: jax.Array,
    *,
    use_gauss_newton: bool = True,
) -> LaplaceApproximation:
    """Gaussian approximation N(theta_map, H^{-1}).

    use_gauss_newton=True: H = J^T J / sigma^2 + C^{-1} with J = dG/dtheta
    (jacfwd through the implicit solve — the rebuild of 'Gauss-Newton Hessian
    via incremental solves'). Otherwise the full Hessian of the negative log
    posterior via jax.hessian.
    """
    d = theta_map.shape[0]
    Cinv = jax.scipy.linalg.cho_solve((prior.chol, True), jnp.eye(d, dtype=theta_map.dtype))
    if use_gauss_newton:
        J = jax.jit(jax.jacfwd(forward))(theta_map)  # (m, d)
        H = jnp.dot(J.T, J, precision=jax.lax.Precision.HIGHEST) / noise_sigma**2 + Cinv
    else:
        def nlp(t):
            r = forward(t) - data
            w = prior.whiten(t)
            return 0.5 * jnp.sum(r * r) / noise_sigma**2 + 0.5 * jnp.sum(w * w)

        H = jax.jit(jax.hessian(nlp))(theta_map)
    H = 0.5 * (H + H.T)
    # the d x d inverse/cholesky is offline algebra: run it in f64 on the
    # host (TPU f64 jnp.linalg.* is unsupported — CLAUDE.md rule 5 — and the
    # conditioning of H squares the misfit scaling), cast back to the
    # working dtype
    import numpy as np

    H64 = np.asarray(H, np.float64)
    cov64 = np.linalg.inv(H64)
    cov64 = 0.5 * (cov64 + cov64.T)
    chol64 = np.linalg.cholesky(cov64)
    dt = theta_map.dtype
    return LaplaceApproximation(
        mean=theta_map, cov=jnp.asarray(cov64, dt), chol=jnp.asarray(chol64, dt)
    )
