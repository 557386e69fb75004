"""Laplace-informed samplers: on a linear-Gaussian target the Laplace
approximation is exact, so the independence sampler is ~iid and gpCN accepts
every proposal (SURVEY.md A.5 'Laplace chains')."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, find_map, laplace_approximation
from bayesianinferencedl_tpu.infer.diagnostics import effective_sample_size
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.samplers import run_gpcn, run_laplace_mh


def _setup(d=3, m=5, sigma=0.4, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    fwd = lambda t: H @ t
    misfit = gaussian_misfit(fwd, data, sigma)
    theta_map, _ = find_map(misfit, prior, jnp.zeros(d, jnp.float64))
    lap = laplace_approximation(fwd, data, sigma, prior, theta_map)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    return misfit, prior, lap, mu, Cpost


def test_laplace_mh_near_iid_on_gaussian():
    misfit, prior, lap, mu, Cpost = _setup()
    theta0 = lap.sample(jax.random.PRNGKey(0), (16,))
    res = run_laplace_mh(misfit, prior, lap, theta0, jax.random.PRNGKey(1), n_steps=2000, n_burn=100)
    acc = float(jnp.mean(res.accept_rate))
    assert acc > 0.98  # proposal == posterior -> alpha == 1
    s = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.03)
    np.testing.assert_allclose(np.cov(s.T), Cpost, atol=0.03)
    ess = float(jnp.min(effective_sample_size(res.samples)))
    assert ess > 0.5 * res.samples.shape[0] * res.samples.shape[1]


def test_gpcn_accepts_everything_on_gaussian():
    misfit, prior, lap, mu, Cpost = _setup(seed=1)
    theta0 = lap.sample(jax.random.PRNGKey(0), (16,))
    res = run_gpcn(misfit, prior, lap, theta0, jax.random.PRNGKey(1), n_steps=1500, n_burn=100, beta=0.7)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0, atol=1e-12)
    s = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)


def test_laplace_samplers_beat_pcn_on_concentrated_posterior():
    """With small noise (concentrated posterior) the Laplace samplers mix
    dramatically better than prior-referenced pCN per step."""
    misfit, prior, lap, mu, Cpost = _setup(sigma=0.05, seed=2)
    theta0 = lap.sample(jax.random.PRNGKey(0), (8,))
    n = 1500
    res_mh = run_laplace_mh(misfit, prior, lap, theta0, jax.random.PRNGKey(1), n_steps=n, n_burn=100)
    res_pcn = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=n, n_burn=100)
    ess_mh = float(jnp.min(effective_sample_size(res_mh.samples)))
    ess_pcn = float(jnp.min(effective_sample_size(res_pcn.samples)))
    assert ess_mh > 3 * ess_pcn, (ess_mh, ess_pcn)


def test_ks_distance():
    from bayesianinferencedl_tpu.infer.diagnostics import ks_distance

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4000, 2), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(1), (4000, 2), jnp.float64)
    d_same = np.asarray(ks_distance(a, b))
    assert (d_same < 0.05).all()
    c = b + jnp.asarray([1.0, 0.0])
    d_shift = np.asarray(ks_distance(a, c))
    assert d_shift[0] > 0.3 and d_shift[1] < 0.05


def test_laplace_mh_matches_pcn_in_ks():
    """Same-posterior check via KS distance (SURVEY.md §4)."""
    from bayesianinferencedl_tpu.infer.diagnostics import ks_distance

    misfit, prior, lap, mu, Cpost = _setup(seed=3)
    theta0 = lap.sample(jax.random.PRNGKey(0), (16,))
    res_mh = run_laplace_mh(misfit, prior, lap, theta0, jax.random.PRNGKey(1), n_steps=4000, n_burn=500)
    res_pcn = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(2), n_steps=8000, n_burn=2000, beta=0.5)
    d = np.asarray(ks_distance(
        res_mh.samples.reshape(-1, 3), res_pcn.samples.reshape(-1, 3)
    ))
    assert (d < 0.06).all(), d


def test_gpcn_nonlinear_consistency():
    """On a (mildly) non-Gaussian target gpCN and laplace-MH agree with plain
    pCN moments (all target the same posterior)."""
    prior = GaussianPrior.iid(2, sigma=0.8, dtype=jnp.float64)
    data = jnp.asarray([0.7, 0.1], jnp.float64)
    fwd = lambda t: jnp.stack([t[0] + 0.3 * t[1] ** 2, t[1]])
    misfit = gaussian_misfit(fwd, data, 0.3)
    theta_map, _ = find_map(misfit, prior, jnp.zeros(2, jnp.float64))
    lap = laplace_approximation(fwd, data, 0.3, prior, theta_map)

    theta0 = lap.sample(jax.random.PRNGKey(0), (32,))
    m = {}
    res_g = run_gpcn(misfit, prior, lap, theta0, jax.random.PRNGKey(1), n_steps=4000, n_burn=1000, beta=0.6)
    m["gpcn"] = np.asarray(res_g.samples).reshape(-1, 2).mean(0)
    res_m = run_laplace_mh(misfit, prior, lap, theta0, jax.random.PRNGKey(2), n_steps=4000, n_burn=1000)
    m["mh"] = np.asarray(res_m.samples).reshape(-1, 2).mean(0)
    res_p = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(3), n_steps=6000, n_burn=2000, beta=0.4)
    m["pcn"] = np.asarray(res_p.samples).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(m["gpcn"], m["mh"], atol=0.05)
    np.testing.assert_allclose(m["gpcn"], m["pcn"], atol=0.08)
    assert 0.2 < float(jnp.mean(res_g.accept_rate)) <= 1.0
