"""Uniform / log-uniform prior support (SURVEY.md A.5: "For uniform priors,
transform to unbounded coordinates first").

BoxPrior realizes the box prior on k as the probit push-forward of the
standard Gaussian, so pCN's reference measure is exactly the prior and the
data misfit alone is the correct potential. Tests: (1) the push-forward has
exactly the requested distribution, (2) the transform round-trips, (3) a pCN
run with a BoxPrior matches a dense quadrature oracle of the uniform-prior
posterior — the posterior-correctness gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.priors import BoxPrior


def _ks_against_uniform(x, lo, hi):
    """Kolmogorov-Smirnov statistic of samples x against U[lo, hi]."""
    u = np.sort((np.asarray(x) - lo) / (hi - lo))
    n = len(u)
    grid = np.arange(1, n + 1) / n
    return max(np.max(np.abs(grid - u)), np.max(np.abs(u - np.arange(n) / n)))


def test_log_uniform_pushforward_distribution():
    prior = BoxPrior.create(3, low=0.1, high=10.0, kind="log_uniform", dtype=jnp.float64)
    z = prior.sample(jax.random.PRNGKey(0), (20000,))
    theta = prior.to_theta(z)  # should be exactly U[log 0.1, log 10] per dim
    lo, hi = np.log(0.1), np.log(10.0)
    th = np.asarray(theta)
    assert th.min() >= lo - 1e-9 and th.max() <= hi + 1e-9
    for i in range(3):
        assert _ks_against_uniform(th[:, i], lo, hi) < 0.015
    np.testing.assert_allclose(th.mean(0), (lo + hi) / 2, atol=0.05)
    np.testing.assert_allclose(th.var(0), (hi - lo) ** 2 / 12, rtol=0.05)


def test_uniform_pushforward_distribution():
    prior = BoxPrior.create(2, low=0.5, high=4.0, kind="uniform", dtype=jnp.float64)
    z = prior.sample(jax.random.PRNGKey(1), (20000,))
    k = np.exp(np.asarray(prior.to_theta(z)))  # should be exactly U[0.5, 4]
    assert k.min() >= 0.5 - 1e-9 and k.max() <= 4.0 + 1e-9
    for i in range(2):
        assert _ks_against_uniform(k[:, i], 0.5, 4.0) < 0.015
    np.testing.assert_allclose(k.mean(0), 2.25, atol=0.03)
    np.testing.assert_allclose(k.var(0), 3.5**2 / 12, rtol=0.05)


def test_box_prior_roundtrip():
    for kind in ("uniform", "log_uniform"):
        prior = BoxPrior.create(4, low=0.1, high=10.0, kind=kind, dtype=jnp.float64)
        z = jnp.linspace(-4.0, 4.0, 33)[:, None] * jnp.ones(4)
        z2 = prior.from_theta(prior.to_theta(z))
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)


def test_pcn_box_prior_matches_quadrature_oracle():
    """pCN in z-coordinates with a log-uniform BoxPrior must target the
    uniform-on-log-k posterior: compare against dense 2-D grid quadrature of
    pi(theta) ∝ exp(-||d - H theta||^2 / 2 sigma^2) * 1_box(theta)."""
    d, m, sigma = 2, 3, 0.5
    rng = np.random.default_rng(7)
    H = jnp.asarray(rng.standard_normal((m, d)))
    theta_star = jnp.asarray([0.3, -0.5], jnp.float64)
    data = H @ theta_star + 0.1 * jnp.asarray(rng.standard_normal(m))

    prior = BoxPrior.create(d, low=0.1, high=10.0, kind="log_uniform", dtype=jnp.float64)
    misfit = gaussian_misfit(lambda z: H @ prior.to_theta(z), data, sigma)

    z0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pcn(misfit, prior, z0, jax.random.PRNGKey(3), n_steps=6000, n_burn=1500, beta=0.5)
    theta_samps = np.asarray(prior.to_theta(res.samples)).reshape(-1, d)

    # quadrature oracle on the theta box
    lo, hi = np.log(0.1), np.log(10.0)
    g = np.linspace(lo, hi, 400)
    T1, T2 = np.meshgrid(g, g, indexing="ij")
    TH = np.stack([T1.ravel(), T2.ravel()], axis=1)
    R = TH @ np.asarray(H).T - np.asarray(data)
    logw = -0.5 * np.sum(R * R, axis=1) / sigma**2
    w = np.exp(logw - logw.max())
    w /= w.sum()
    mu = w @ TH
    Cq = (TH - mu).T @ ((TH - mu) * w[:, None])

    np.testing.assert_allclose(theta_samps.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(theta_samps.T), Cq, atol=0.05)


def test_run_inversion_with_log_uniform_prior():
    """End-to-end: prior.kind='log_uniform' flows through build_pipeline and
    run_inversion (VERDICT.md round-1 item 7)."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, PriorConfig,
        ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=48, basis_size=16),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=128, epochs=40, batch_size=64),
        prior=PriorConfig(kind="log_uniform", low=0.2, high=5.0),
        mcmc=MCMCConfig(n_chains=32, n_steps=1200, n_burn=400, beta=0.3, noise_sigma=1e-2),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64)
    inv = run_inversion(pipe, likelihood="rom_nn", key=jax.random.PRNGKey(5))
    theta_samps = np.asarray(pipe.prior.to_theta(inv.result.samples))
    assert np.isfinite(theta_samps).all()
    # every sample's log k stays inside the box
    assert theta_samps.min() >= np.log(0.2) - 1e-6
    assert theta_samps.max() <= np.log(5.0) + 1e-6
    # posterior mean tracks the truth (moderate noise, coarse gate)
    theta_true_logk = np.asarray(pipe.prior.to_theta(inv.theta_true))
    err = np.abs(theta_samps.mean(axis=(0, 1)) - theta_true_logk).max()
    assert err < 0.5, (theta_samps.mean(axis=(0, 1)), theta_true_logk)
    assert float(jnp.mean(inv.result.accept_rate)) > 0.05


def test_mala_box_prior_matches_quadrature_oracle():
    """MALA (and its tempered variant) in z-coordinates with a log-uniform
    BoxPrior: the drift differentiates through the probit push-forward
    (to_theta) and the z-space reference term, and the posterior must match
    the same dense quadrature oracle as the pCN test above — the gradient
    machinery adds no bias on a bounded-prior problem."""
    from bayesianinferencedl_tpu.infer.mala import run_mala
    from bayesianinferencedl_tpu.infer.tempering import run_pt_mala

    d, m, sigma = 2, 3, 0.5
    rng = np.random.default_rng(7)
    H = jnp.asarray(rng.standard_normal((m, d)))
    theta_star = jnp.asarray([0.3, -0.5], jnp.float64)
    data = H @ theta_star + 0.1 * jnp.asarray(rng.standard_normal(m))

    prior = BoxPrior.create(d, low=0.1, high=10.0, kind="log_uniform", dtype=jnp.float64)
    misfit = gaussian_misfit(lambda z: H @ prior.to_theta(z), data, sigma)

    # quadrature oracle on the theta box (same as the pCN test)
    lo, hi = np.log(0.1), np.log(10.0)
    g = np.linspace(lo, hi, 400)
    T1, T2 = np.meshgrid(g, g, indexing="ij")
    TH = np.stack([T1.ravel(), T2.ravel()], axis=1)
    R = TH @ np.asarray(H).T - np.asarray(data)
    logw = -0.5 * np.sum(R * R, axis=1) / sigma**2
    w = np.exp(logw - logw.max())
    w /= w.sum()
    mu = w @ TH
    Cq = (TH - mu).T @ ((TH - mu) * w[:, None])

    z0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_mala(misfit, prior, z0, jax.random.PRNGKey(3),
                   n_steps=6000, n_burn=1500, step=0.3)
    th = np.asarray(prior.to_theta(res.samples)).reshape(-1, d)
    np.testing.assert_allclose(th.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(th.T), Cq, atol=0.05)

    res_pt = run_pt_mala(misfit, prior, z0, jax.random.PRNGKey(4),
                         n_steps=6000, n_burn=1500, step=0.3, n_temps=3,
                         lambda_min=0.1)
    th_pt = np.asarray(prior.to_theta(res_pt.samples)).reshape(-1, d)
    np.testing.assert_allclose(th_pt.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(th_pt.T), Cq, atol=0.05)
