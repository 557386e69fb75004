"""pCN sampler correctness (SURVEY.md §4 'Posterior quality' row: pCN on a
linear-Gaussian target must match the analytic posterior)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import (
    GaussianPrior,
    effective_sample_size,
    rhat,
    run_pcn,
)
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def _linear_gaussian_setup(d=3, m=4, sigma=0.5, prior_sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    # analytic posterior: C_post = (H^T H / s^2 + I/sp^2)^{-1}, mu = C H^T d/s^2
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    return H, data, prior, sigma, mu, Cpost


def test_pcn_matches_analytic_posterior():
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    key = jax.random.PRNGKey(0)
    theta0 = prior.sample(key, (64,))
    res = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=6000, n_burn=1000, beta=0.4
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    emp_mu = samples.mean(0)
    emp_C = np.cov(samples.T)
    np.testing.assert_allclose(emp_mu, mu, atol=0.05)
    np.testing.assert_allclose(emp_C, Cpost, atol=0.06)
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.1 < acc < 0.95


def test_pcn_invariance_no_data():
    """With zero misfit the pCN chain has the prior as invariant measure."""
    prior = GaussianPrior.iid(2, mean=1.0, sigma=0.7, dtype=jnp.float64)
    misfit = lambda t: jnp.asarray(0.0, jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (32,))
    res = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(3), n_steps=4000, n_burn=500, beta=0.6)
    samples = np.asarray(res.samples).reshape(-1, 2)
    # acceptance must be exactly 1 (misfit difference is 0)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)
    np.testing.assert_allclose(samples.mean(0), 1.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)


def test_thinning_and_burnin_shapes():
    prior = GaussianPrior.iid(2, dtype=jnp.float64)
    misfit = lambda t: 0.5 * jnp.sum(t * t)
    theta0 = prior.sample(jax.random.PRNGKey(0), (8,))
    res = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=1000, n_burn=200, thin=4, beta=0.3
    )
    assert res.samples.shape == (200, 8, 2)
    assert res.phi_trace.shape == (200, 8)


def test_ess_iid_near_n():
    """ESS of iid samples ~ n; ESS of a sticky chain << n."""
    key = jax.random.PRNGKey(0)
    iid = jax.random.normal(key, (2000, 4, 1), dtype=jnp.float64)
    ess = float(effective_sample_size(iid)[0])
    assert ess > 0.5 * 2000 * 4

    # AR(1) with rho=0.95 -> tau ~ 39 -> ESS ~ n/39
    rho = 0.95
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2000, 4)))
    x = np.zeros((2000, 4))
    for t in range(1, 2000):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    ess_ar = float(effective_sample_size(jnp.asarray(x[..., None]))[0])
    assert ess_ar < 0.15 * 2000 * 4


def test_rhat_mixed_vs_unmixed():
    key = jax.random.PRNGKey(0)
    mixed = jax.random.normal(key, (1000, 4, 2), dtype=jnp.float64)
    r = np.asarray(rhat(mixed))
    assert (r < 1.05).all()
    shifted = mixed + jnp.arange(4.0)[None, :, None] * 3
    r2 = np.asarray(rhat(shifted))
    assert (r2 > 1.5).all()


def test_adapt_t0_advances_robbins_monro_clock():
    """adapt_t0 is the global-step offset segmented drivers pass so the
    Robbins-Monro schedule anneals across segments: a huge offset makes
    eta ~ 0 and the adapted betas stay at their initial value, while the
    default clock moves them substantially."""
    prior = GaussianPrior.iid(2, dtype=jnp.float64)
    misfit = lambda t: 50.0 * jnp.sum(t * t)  # concentrated: beta must shrink
    theta0 = prior.sample(jax.random.PRNGKey(0), (16,))
    res_fresh = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=300, n_burn=250, beta=0.5,
    )
    res_frozen = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=300, n_burn=250, beta=0.5, adapt_t0=1e12,
    )
    moved = float(jnp.mean(jnp.abs(jnp.log(res_fresh.beta) - jnp.log(0.5))))
    frozen = float(jnp.mean(jnp.abs(jnp.log(res_frozen.beta) - jnp.log(0.5))))
    assert moved > 0.1           # the fresh clock adapts
    assert frozen < 0.1 * moved   # a late clock (eta ~ 0) barely does
