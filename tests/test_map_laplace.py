"""MAP + Laplace approximation tests (SURVEY.md A.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, find_map, laplace_approximation
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def test_map_linear_gaussian_analytic():
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((6, 3)))
    data = jnp.asarray(rng.standard_normal(6))
    sigma = 0.3
    prior = GaussianPrior.iid(3, sigma=1.2, dtype=jnp.float64)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta_map, _ = find_map(misfit, prior, jnp.zeros(3, jnp.float64))
    A = np.asarray(H.T @ H) / sigma**2 + np.eye(3) / 1.2**2
    mu = np.linalg.solve(A, np.asarray(H.T @ data) / sigma**2)
    np.testing.assert_allclose(np.asarray(theta_map), mu, atol=1e-6)


def test_laplace_linear_gaussian_exact():
    """For a linear forward model the Laplace approximation IS the posterior."""
    rng = np.random.default_rng(1)
    H = jnp.asarray(rng.standard_normal((5, 3)))
    data = jnp.asarray(rng.standard_normal(5))
    sigma = 0.4
    prior = GaussianPrior.iid(3, sigma=0.9, dtype=jnp.float64)
    fwd = lambda t: H @ t
    misfit = gaussian_misfit(fwd, data, sigma)
    theta_map, _ = find_map(misfit, prior, jnp.zeros(3, jnp.float64))
    lap = laplace_approximation(fwd, data, sigma, prior, theta_map)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(3) / 0.9**2)
    np.testing.assert_allclose(np.asarray(lap.cov), Cpost, atol=1e-8)
    # GN and full Hessian agree for linear G
    lap2 = laplace_approximation(fwd, data, sigma, prior, theta_map, use_gauss_newton=False)
    np.testing.assert_allclose(np.asarray(lap2.cov), Cpost, atol=1e-8)


def test_laplace_sampling():
    prior = GaussianPrior.iid(2, sigma=1.0, dtype=jnp.float64)
    fwd = lambda t: t
    data = jnp.asarray([0.5, -0.5], jnp.float64)
    misfit = gaussian_misfit(fwd, data, 0.5)
    theta_map, _ = find_map(misfit, prior, jnp.zeros(2, jnp.float64))
    lap = laplace_approximation(fwd, data, 0.5, prior, theta_map)
    s = lap.sample(jax.random.PRNGKey(0), (20000,))
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(lap.mean), atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(s).T), np.asarray(lap.cov), atol=0.03)


def test_map_on_rom_fin(op_r1_f64):
    """End-to-end MAP on the ROM forward model recovers the true parameters
    from clean data."""
    from bayesianinferencedl_tpu.rom import ReducedOperator, generate_snapshots, pod_basis
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform

    op = op_r1_f64
    ks = sample_log_uniform(jax.random.PRNGKey(0), 48)
    S = generate_snapshots(op, ks, tol=1e-12)
    rom = ReducedOperator.project(op, pod_basis(S, 24).V)

    theta_true = jnp.asarray(np.log([1.2, 0.6, 2.0, 0.8, 1.5]))
    data = rom.forward(jnp.exp(theta_true))
    prior = GaussianPrior.iid(5, mean=0.0, sigma=1.0, dtype=jnp.float64)
    misfit = gaussian_misfit(lambda t: rom.forward(jnp.exp(t)), data, 1e-3)
    theta_map, fval = find_map(misfit, prior, jnp.zeros(5, jnp.float64), maxiter=500)
    # With tiny noise the MAP should sit near the truth
    np.testing.assert_allclose(np.asarray(theta_map), np.asarray(theta_true), atol=0.05)
