"""Posterior predictive checks: does the fitted model actually explain the
data? (SURVEY.md §4 posterior-quality oracles, extended to model criticism —
the Bayesian-workflow step after sampling that the reference leaves to
notebook inspection.)

The chi-square discrepancy T(y, theta) = ||y - G(theta)||^2 / sigma^2 is the
canonical choice for a Gaussian likelihood: the posterior predictive p-value

    p = P[ T(y_rep, theta) >= T(y_obs, theta) ],   y_rep ~ N(G(theta), sigma^2 I)

averages over posterior draws theta. A well-specified model gives p in the
body of (0, 1) (NOT uniformly distributed — posterior predictive p-values
concentrate toward 0.5; extremes are what matter); p near 0 means the data
misfit is worse than the model can explain (under-modeled physics, noise
understated), p near 1 means the fit is too good (noise overstated, data
leakage). Everything is one vmapped forward batch + elementwise ops — a
single XLA program over the thinned posterior subsample.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def thin_samples(samples: jax.Array, n_draws: int) -> jax.Array:
    """(T, C, d) kept chains -> (n_draws, d) evenly-thinned flat subsample
    (deterministic — thinning needs no randomness)."""
    T, C, d = samples.shape
    flat = samples.reshape(T * C, d)
    idx = jnp.linspace(0, T * C - 1, min(n_draws, T * C)).astype(jnp.int32)
    return flat[idx]


def posterior_predictive(
    forward_b: Callable,
    samples: jax.Array,
    noise_sigma: float,
    key: jax.Array,
    *,
    n_draws: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Replicated observations from the posterior: returns (y_model, y_rep)
    with y_model = G(theta_i) (n_draws, m) and y_rep = y_model + noise.

    forward_b: batched forward map (n, d) -> (n, m) in the SAME working
    coordinates as `samples` (e.g. a misfit-free pipe.batched_forward_fn
    composed with the prior's to_theta, exactly as run_inversion builds
    its misfits)."""
    theta = thin_samples(samples, n_draws)
    y_model = forward_b(theta)
    y_rep = y_model + noise_sigma * jax.random.normal(
        key, y_model.shape, y_model.dtype
    )
    return y_model, y_rep


def ppc_chi2_pvalue(
    forward_b: Callable,
    samples: jax.Array,
    data: jax.Array,
    noise_sigma: float,
    key: jax.Array,
    *,
    n_draws: int = 1024,
) -> dict:
    """Chi-square posterior predictive check.

    Returns {"p_value", "t_obs_mean", "t_rep_mean", "n_draws", "n_obs"}:
    per-draw T_obs = ||data - G(theta)||^2/sigma^2 vs T_rep with replicated
    data; p = mean(T_rep >= T_obs). For a well-specified model both T means
    sit near n_obs (the chi-square mean) and p is interior; gate on e.g.
    0.01 < p < 0.99."""
    y_model, y_rep = posterior_predictive(
        forward_b, samples, noise_sigma, key, n_draws=n_draws
    )
    inv = 1.0 / (noise_sigma**2)
    t_obs = jnp.sum((data[None, :] - y_model) ** 2, axis=-1) * inv
    t_rep = jnp.sum((y_rep - y_model) ** 2, axis=-1) * inv
    return {
        "p_value": float(jnp.mean(t_rep >= t_obs)),
        "t_obs_mean": float(jnp.mean(t_obs)),
        "t_rep_mean": float(jnp.mean(t_rep)),
        "n_draws": int(y_model.shape[0]),
        "n_obs": int(y_model.shape[1]),
    }
