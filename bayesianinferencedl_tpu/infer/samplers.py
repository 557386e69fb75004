"""Laplace-informed MCMC samplers (SURVEY.md A.5: "Laplace posterior used
directly and/or as a proposal").

Beyond plain pCN (infer/pcn.py), the framework provides two samplers that
exploit the Laplace approximation N(m_L, C_L) computed at the MAP:

* :func:`run_laplace_mh` — independence Metropolis-Hastings with the Laplace
  approximation as proposal. When the posterior is near-Gaussian the chain is
  near-iid (ESS ~ n_steps), orders of magnitude better mixing than
  random-walk pCN on concentrated posteriors.
* :func:`run_gpcn` — generalized pCN: the pCN autoregressive proposal with
  the Laplace approximation (not the prior) as the Gaussian reference
  measure. Dimension-robust like pCN, but proposals move along posterior
  covariance directions; the acceptance ratio gains the explicit
  prior/reference density correction.

Both are pure functions scanned over steps and vmapped over chains — the
same zero-host-round-trip structure as pCN.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.map import LaplaceApproximation
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class MHResult(NamedTuple):
    samples: jax.Array  # (n_kept, n_chains, d)
    log_post: jax.Array  # (n_kept, n_chains) unnormalized log posterior
    accept_rate: jax.Array  # (n_chains,)


def _inv_chol(chol: jax.Array) -> jax.Array:
    """L^{-1}, computed once outside the chain scan so per-step whitening is
    a matmul instead of a triangular solve."""
    eye = jnp.eye(chol.shape[0], dtype=chol.dtype)
    return jax.scipy.linalg.solve_triangular(chol, eye, lower=True)


def _log_posterior(misfit_fn: Callable, prior: GaussianPrior) -> Callable:
    Li = _inv_chol(prior.chol)
    hi = jax.lax.Precision.HIGHEST
    mean = prior.mean

    def lp(theta):
        w = jnp.dot(Li, theta - mean, precision=hi)
        return -misfit_fn(theta) - 0.5 * jnp.sum(w * w)

    return lp


def _log_gaussian(mean: jax.Array, chol: jax.Array) -> Callable:
    """Unnormalized-up-to-constant log N(.; mean, chol chol^T) as matmuls."""
    Li = _inv_chol(chol)
    hi = jax.lax.Precision.HIGHEST

    def ld(theta):
        w = jnp.dot(Li, theta - mean, precision=hi)
        return -0.5 * jnp.sum(w * w)

    return ld


@partial(jax.jit, static_argnames=("misfit_fn", "n_steps", "n_burn"))
def run_laplace_mh(
    misfit_fn: Callable,
    prior: GaussianPrior,
    laplace: LaplaceApproximation,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
) -> MHResult:
    """Independence MH with proposal q = N(m_L, C_L).

    log alpha = [lp(theta') - log q(theta')] - [lp(theta) - log q(theta)].
    theta0: (n_chains, d).
    """
    lp_fn = _log_posterior(misfit_fn, prior)
    lq_fn = _log_gaussian(laplace.mean, laplace.chol)

    def lp_and_weight(theta):  # one misfit evaluation yields both
        lp = lp_fn(theta)
        return lp, lp - lq_fn(theta)

    lp0, w0 = jax.vmap(lp_and_weight)(theta0)

    def step(carry, key_t):
        theta, lp, w, n_acc = carry
        k_prop, k_acc = jax.random.split(key_t)
        prop = laplace.sample(k_prop, theta.shape[:-1])
        lp_prop, w_prop = jax.vmap(lp_and_weight)(prop)
        u = jax.random.uniform(k_acc, w.shape, w.dtype)
        accept = jnp.log(u) < (w_prop - w)
        theta = jnp.where(accept[..., None], prop, theta)
        lp = jnp.where(accept, lp_prop, lp)
        w = jnp.where(accept, w_prop, w)
        n_acc = n_acc + accept.astype(jnp.int32)
        return (theta, lp, w, n_acc), (theta, lp)

    n_acc0 = (w0 * 0).astype(jnp.int32)
    keys = jax.random.split(key, n_steps)
    (theta, lp, w, n_acc), (samples, lps) = jax.lax.scan(step, (theta0, lp0, w0, n_acc0), keys)
    return MHResult(
        samples=samples[n_burn:],
        log_post=lps[n_burn:],
        accept_rate=n_acc.astype(jnp.float32) / max(n_steps, 1),
    )


@partial(jax.jit, static_argnames=("misfit_fn", "n_steps", "n_burn"))
def run_gpcn(
    misfit_fn: Callable,
    prior: GaussianPrior,
    laplace: LaplaceApproximation,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.5,
) -> MHResult:
    """Generalized pCN: autoregressive proposal wrt the Laplace reference.

    proposal: theta' = m_L + sqrt(1-b^2)(theta - m_L) + b L_L xi
    acceptance: log alpha = J(theta') - J(theta) with
      J(theta) = -Phi(theta) + log p_prior(theta) - log N(theta; m_L, C_L)
    (the reference-measure density cancels the proposal asymmetry exactly, so
    the chain is reversible wrt the true posterior).
    """
    lp_fn = _log_posterior(misfit_fn, prior)
    lref_fn = _log_gaussian(laplace.mean, laplace.chol)

    def lp_and_J(theta):  # one misfit evaluation yields both
        lp = lp_fn(theta)
        return lp, lp - lref_fn(theta)

    dtype = theta0.dtype
    b = jnp.asarray(beta, dtype)
    lp0, j0 = jax.vmap(lp_and_J)(theta0)

    def step(carry, key_t):
        theta, lp, j, n_acc = carry
        k_prop, k_acc = jax.random.split(key_t)
        xi = jnp.dot(jax.random.normal(k_prop, theta.shape, dtype), laplace.chol.T,
                     precision=jax.lax.Precision.HIGHEST)
        prop = laplace.mean + jnp.sqrt(1.0 - b**2) * (theta - laplace.mean) + b * xi
        lp_prop, j_prop = jax.vmap(lp_and_J)(prop)
        u = jax.random.uniform(k_acc, j.shape, dtype)
        accept = jnp.log(u) < (j_prop - j)
        theta = jnp.where(accept[..., None], prop, theta)
        lp = jnp.where(accept, lp_prop, lp)
        j = jnp.where(accept, j_prop, j)
        n_acc = n_acc + accept.astype(jnp.int32)
        return (theta, lp, j, n_acc), (theta, lp)

    n_acc0 = (j0 * 0).astype(jnp.int32)
    keys = jax.random.split(key, n_steps)
    (theta, lp, j, n_acc), (samples, lps) = jax.lax.scan(step, (theta0, lp0, j0, n_acc0), keys)
    return MHResult(
        samples=samples[n_burn:],
        log_post=lps[n_burn:],
        accept_rate=n_acc.astype(jnp.float32) / max(n_steps, 1),
    )
