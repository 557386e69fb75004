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


def noise_posterior(
    forward_b: Callable,
    samples: jax.Array,
    data: jax.Array,
    key: jax.Array,
    *,
    a0: float,
    b0: float,
    n_draws: int = 1024,
) -> tuple[jax.Array, dict]:
    """Marginal posterior over the observation noise for cfg.infer_noise
    runs (infer/pcn.py marginal_misfit, same (a0, b0) noise prior).
    Conditional on theta the noise is conjugate —
    sigma^2 | theta, d ~ InvGamma(a0 + m/2, b0 + S(theta)/2) with
    S = ||d - G(theta)||^2 — so compounding one InvGamma draw per kept theta
    gives exact draws from the sigma marginal. One batched forward over the
    thinned subsample + elementwise ops. Returns (sigma_draws, stats)."""
    theta = thin_samples(samples, n_draws)
    y = forward_b(theta)
    s = jnp.sum((data[None, :] - y) ** 2, axis=-1)
    m = y.shape[-1]
    # InvGamma(a, b) draw = b / Gamma(a, 1)
    gam = jax.random.gamma(key, a0 + 0.5 * m, shape=s.shape).astype(s.dtype)
    sigma = jnp.sqrt((b0 + 0.5 * s) / gam)
    q = jnp.quantile(sigma, jnp.asarray([0.05, 0.5, 0.95], sigma.dtype))
    stats = {
        "sigma_mean": float(jnp.mean(sigma)),
        "sigma_sd": float(jnp.std(sigma)),
        "sigma_q05": float(q[0]),
        "sigma_q50": float(q[1]),
        "sigma_q95": float(q[2]),
        "n_draws": int(y.shape[0]),
        "n_obs": m,
    }
    return sigma, stats


def ppc_shape_pvalue(
    forward_b: Callable,
    samples: jax.Array,
    data: jax.Array,
    key: jax.Array,
    *,
    n_draws: int = 1024,
) -> dict:
    """Scale-free posterior predictive check for UNKNOWN noise
    (cfg.infer_noise). The chi-square discrepancy is powerless there by
    construction: with sigma^2 | theta ~ InvGamma(m/2, S/2), the statistic
    S/sigma^2 is chi2_m exactly for ANY theta — the inferred noise absorbs
    any misfit magnitude. So test the residual's SHAPE instead:

        T(r) = sqrt(m) * max_j |r_j| / ||r||   (largest studentized
                                                residual component)

    which is invariant to scale. Structured model error — one observable
    systematically off, the ROM-bias signature — drives T toward sqrt(m)
    regardless of the inferred sigma; iid Gaussian residuals of any sigma
    keep it at its reference distribution (simulated here per draw, so the
    p-value needs no table)."""
    theta = thin_samples(samples, n_draws)
    y = forward_b(theta)
    r_obs = data[None, :] - y
    m = y.shape[-1]

    def t_stat(r):
        nrm = jnp.sqrt(jnp.sum(r * r, axis=-1))
        return jnp.sqrt(float(m)) * jnp.max(jnp.abs(r), axis=-1) / nrm

    # replicated residuals are sigma * iid-normal and T is scale-invariant,
    # so unit normals simulate the reference distribution exactly
    r_rep = jax.random.normal(key, r_obs.shape, r_obs.dtype)
    t_obs = t_stat(r_obs)
    t_rep = t_stat(r_rep)
    return {
        "p_value": float(jnp.mean(t_rep >= t_obs)),
        "t_obs_mean": float(jnp.mean(t_obs)),
        "t_rep_mean": float(jnp.mean(t_rep)),
        "n_draws": int(y.shape[0]),
        "n_obs": m,
        "statistic": "max-studentized-residual (scale-free)",
    }
