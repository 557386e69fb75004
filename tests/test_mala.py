"""MALA sampler correctness (SURVEY.md §4 'Posterior quality' row; A.5).

The explicit proposal-density MH correction is the load-bearing part: the
exactness tests below run the sampler with DIFFERENT preconditioning frames
(prior, and a deliberately mismatched reference) against the same analytic
linear-Gaussian posterior — any error in the q-density bookkeeping shows up
as a frame-dependent bias."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, run_mala, run_mala_segmented
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit
from bayesianinferencedl_tpu.infer.priors import BoxPrior


def _linear_gaussian_setup(d=3, m=4, sigma=0.5, prior_sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    return H, data, prior, sigma, mu, Cpost


def test_mala_matches_analytic_posterior():
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mala(
        misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=6000, n_burn=1000
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.3 < acc < 0.9  # adapted toward 0.574


def test_mala_exact_under_mismatched_preconditioner():
    """Running in a deliberately wrong whitening frame (ref != prior, skewed
    and offset) must still target the SAME posterior — this is the direct
    test that the explicit q-density correction is right, since frame errors
    do not cancel in the acceptance ratio."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    rng = np.random.default_rng(7)
    A = rng.standard_normal((3, 3)) * 0.4 + np.eye(3)
    ref_chol = jnp.asarray(np.linalg.cholesky(A @ A.T))
    ref_mean = jnp.asarray(rng.standard_normal(3) * 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_mala(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=6000, n_burn=1500, ref=(ref_mean, ref_chol),
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)


def test_mala_prior_invariance_no_data():
    """With zero misfit the prior is the invariant measure (and the exact
    Gaussian case still needs the MH correction — h is finite)."""
    prior = GaussianPrior.iid(2, mean=1.0, sigma=0.7, dtype=jnp.float64)
    misfit = lambda t: jnp.asarray(0.0, jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (32,))
    res = run_mala(
        misfit, prior, theta0, jax.random.PRNGKey(3), n_steps=4000, n_burn=500
    )
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(0), 1.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)


def test_mala_beats_pcn_ess_on_concentrated_posterior():
    """The reason the sampler exists: on a concentrated posterior in more
    than a handful of dimensions, gradient drift buys a materially better
    ESS per kept sample than the pCN random walk (both adapted, same
    budget). Measured ratios on this family: 3.7x at d=8/16 rising to 6.3x
    at d=64 (random walks mix in O(d) steps, MALA in O(d^{1/3}); at d=3 the
    two are comparable and this test would be vacuous)."""
    from bayesianinferencedl_tpu.infer import run_pcn
    from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk

    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=16, m=24, sigma=0.1)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    kw = dict(n_steps=3000, n_burn=1000)
    res_m = run_mala(misfit, prior, theta0, jax.random.PRNGKey(1), **kw)
    res_p = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(1), **kw)
    ess_m = float(jnp.min(ess_bulk(res_m.samples)))
    ess_p = float(jnp.min(ess_bulk(res_p.samples)))
    assert ess_m > 2.0 * ess_p, (ess_m, ess_p)


def test_mala_box_prior_probit_gradients():
    """BoxPrior working coordinates: gradients flow through the probit
    push-forward; chain stays finite and samples stay in the box."""
    prior = BoxPrior.create(3, low=0.1, high=10.0, kind="log_uniform", dtype=jnp.float64)
    # likelihood on k = exp(to_theta(z)) pulling toward k ~ 2
    target_k = jnp.asarray([2.0, 2.0, 2.0], jnp.float64)
    misfit = lambda z: 50.0 * jnp.sum((jnp.exp(prior.to_theta(z)) - target_k) ** 2)
    theta0 = prior.sample(jax.random.PRNGKey(0), (16,))
    res = run_mala(misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=2000, n_burn=800)
    ks = np.exp(np.asarray(prior.to_theta(res.samples)))
    assert np.isfinite(ks).all()
    assert (ks > 0.1 - 1e-9).all() and (ks < 10.0 + 1e-9).all()
    assert np.abs(ks.reshape(-1, 3).mean(0) - 2.0).max() < 0.5


def test_mala_segmented_matches_single_run_stats():
    """Segment boundaries must not perturb the chain law: same posterior
    moments (not bit-identical — RNG streams differ by construction)."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mala_segmented(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, segment=512,
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)
    assert res.samples.shape == (5000, 64, 3)
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.3 < acc < 0.9


def test_mala_thinning_and_burnin_shapes():
    prior = GaussianPrior.iid(2, dtype=jnp.float64)
    misfit = lambda t: 0.5 * jnp.sum(t * t)
    theta0 = prior.sample(jax.random.PRNGKey(0), (8,))
    res = run_mala(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=1000, n_burn=200, thin=4,
    )
    assert res.samples.shape == (200, 8, 2)
    assert res.phi_trace.shape == (200, 8)


def test_sharded_mala_custom_linear_solve_likelihood():
    """The production mesh path: sharded_mala differentiating a likelihood
    whose forward goes through lax.custom_linear_solve (every differentiable
    batched_forward_fn does). custom_linear_solve's internal pvary rejects
    chain-varying operands under shard_map — sharded_mala must run with vma
    checking disabled (chains need no collectives), or this throws."""
    from jax.sharding import Mesh

    from bayesianinferencedl_tpu.parallel.sharding import sharded_mala

    mesh = Mesh(np.array(jax.devices()), ("devices",))
    rng = np.random.default_rng(3)
    M = jnp.asarray(rng.standard_normal((4, 4)))
    A0 = M @ M.T + 4.0 * jnp.eye(4)
    data = jnp.asarray(rng.standard_normal(4))
    prior = GaussianPrior.iid(4, sigma=0.8, dtype=jnp.float64)

    def fwd(t):  # solve (A0 + diag(exp(t))) u = 1 via custom_linear_solve
        A = A0 + jnp.diag(jnp.exp(t))
        solve = lambda mv, b: jnp.linalg.solve(A, b)
        return jax.lax.custom_linear_solve(
            lambda v: A @ v, jnp.ones(4, jnp.float64), solve=solve, symmetric=True
        )

    misfit = gaussian_misfit(fwd, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    res = sharded_mala(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=300, n_burn=100
    )
    assert res.samples.shape == (200, 32, 4)
    assert np.isfinite(np.asarray(res.samples)).all()
    assert 0.2 < float(np.mean(np.asarray(res.accept_rate))) <= 1.0


def test_sharded_mala_matches_stats():
    from bayesianinferencedl_tpu.parallel.sharding import sharded_mala

    devs = np.array(jax.devices())
    from jax.sharding import Mesh

    mesh = Mesh(devs, ("devices",))
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = sharded_mala(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=4000, n_burn=1000,
    )
    assert res.samples.shape == (3000, 64, 3)
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.08)
    # devices decorrelated
    s0 = np.asarray(res.samples[:, 0, 0])
    s8 = np.asarray(res.samples[:, 8, 0])
    assert np.abs(np.corrcoef(s0, s8)[0, 1]) < 0.5
