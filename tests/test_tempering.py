"""Parallel-tempered pCN correctness (infer/tempering.py).

Gates: (1) with zero misfit every level keeps the prior invariant and all
swaps accept; (2) on a unimodal linear-Gaussian target the cold level matches
the analytic posterior (tempering machinery adds no bias); (3) on a bimodal
target PT recovers the exact mode masses from a quadrature oracle while
single-temperature pCN with the same budget provably fails (the measured
round-2 failure mode of the fin posterior at 1e-3 noise).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.tempering import run_pt_pcn


def test_pt_invariance_no_data():
    prior = GaussianPrior.iid(2, mean=1.0, sigma=0.7, dtype=jnp.float64)
    misfit = lambda t: jnp.asarray(0.0, jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=4000, n_burn=500, beta=0.6, n_temps=3,
    )
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)  # Phi diff = 0
    np.testing.assert_allclose(np.asarray(res.swap_rate), 1.0)  # log ratio = 0
    np.testing.assert_allclose(samples.mean(0), 1.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)


def test_pt_matches_analytic_posterior_unimodal():
    d, m, sigma, prior_sigma = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2

    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, n_temps=4, lambda_min=0.1,
    )
    samples = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)
    # the ladder actually exchanges
    assert np.asarray(res.swap_rate).min() > 0.2


def _bimodal_setup():
    """Posterior ∝ exp(-Phi) N(0,1) with two wells at ±a of unequal depth;
    oracle mass and moments by dense 1-D quadrature."""
    a, s, depth = 1.6, 0.12, 0.5

    def misfit(t):
        q1 = (t[..., 0] - a) ** 2 / (2 * s**2)
        q2 = (t[..., 0] + a) ** 2 / (2 * s**2) + depth
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    g = np.linspace(-4, 4, 20001)
    q1 = (g - a) ** 2 / (2 * s**2)
    q2 = (g + a) ** 2 / (2 * s**2) + depth
    logp = np.logaddexp(-q1, -q2) - 0.5 * g**2
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mass_right = w[g > 0].sum()
    mean = w @ g
    return misfit, float(mass_right), float(mean)


def test_pt_recovers_bimodal_masses_where_pcn_fails():
    misfit, mass_right, mean = _bimodal_setup()
    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))

    res_pt = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, beta=0.3, n_temps=5, lambda_min=0.02,
    )
    s_pt = np.asarray(res_pt.samples).reshape(-1)
    est_mass = float((s_pt > 0).mean())
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(s_pt.mean() - mean) < 0.1

    # single-temperature pCN with the same per-chain budget: chains freeze in
    # whichever well burn-in left them (the wells are ~13 sigma_well apart),
    # so the cross-chain mass estimate stays at the initialization split and
    # per-chain traces never cross. Assert essentially no chain crosses.
    res_1t = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, beta=0.3,
    )
    s_1t = np.asarray(res_1t.samples)[..., 0]  # (n_kept, G)
    sign_flips = (np.sign(s_1t[1:]) != np.sign(s_1t[:-1])).mean()
    assert sign_flips < 1e-3  # no within-chain mode hops
    # PT cold chains DO hop (that's where the mixing comes from)
    s_pt_chain = np.asarray(res_pt.samples)[..., 0]
    assert (np.sign(s_pt_chain[1:]) != np.sign(s_pt_chain[:-1])).mean() > 1e-3
