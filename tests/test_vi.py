"""ADVI (infer/vi.py): full-rank exactness on linear-Gaussian posteriors,
the known mean-field shrinkage on correlated targets, frame support, and
the mesh-sharded Monte Carlo axis (parallel/sharding.sharded_advi)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.vi import run_advi, vi_sample


def _linear_gaussian(d=6, sigma=0.5, seed=0, cond=20.0):
    """Anisotropic correlated linear-Gaussian problem + exact posterior."""
    rng = np.random.default_rng(seed)
    A = jnp.asarray(
        rng.standard_normal((d, d)) * np.geomspace(1.0, cond, d)[None, :],
        jnp.float64,
    )
    data = jnp.asarray(rng.standard_normal(d))
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(A.T @ A) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(A.T @ data) / sigma**2

    def misfit(th):  # batched over leading axes
        r = th @ A.T - data
        return 0.5 / sigma**2 * jnp.sum(r * r, axis=-1)

    return misfit, prior, mu, Cpost


def test_advi_full_rank_exact_on_linear_gaussian():
    """rank='full': the optimum of KL(q||p) over Gaussians IS the posterior
    when the posterior is Gaussian — ADVI recovers mean and covariance."""
    misfit, prior, mu, Cpost = _linear_gaussian()
    res = run_advi(
        misfit, prior, jax.random.PRNGKey(1),
        n_steps=4000, n_mc=64, rank="full", lr=0.02, batched=True,
    )
    C_fit = np.asarray(res.theta_chol @ res.theta_chol.T)
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.03)
    np.testing.assert_allclose(C_fit, Cpost, atol=0.02)
    # the ELBO improved and converged
    e = np.asarray(res.elbo_trace)
    assert e[-200:].mean() > e[:200].mean()
    # vi_sample pushes the fit forward exactly (affine): moments match
    s = np.asarray(vi_sample(res, jax.random.PRNGKey(2), (200_000,)))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.02)
    np.testing.assert_allclose(np.cov(s.T), Cpost, atol=0.02)


def test_advi_meanfield_shrinks_correlated_marginals():
    """rank='meanfield' on a correlated posterior: means stay right, the
    diagonal family underestimates marginal stds (the classic KL(q||p)
    mode-seeking property) — documented behavior, asserted, not hidden."""
    misfit, prior, mu, Cpost = _linear_gaussian(seed=3)
    res = run_advi(
        misfit, prior, jax.random.PRNGKey(4),
        n_steps=4000, n_mc=64, rank="meanfield", lr=0.02, batched=True,
    )
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.04)
    sd_fit = np.sqrt(np.diag(np.asarray(res.theta_chol @ res.theta_chol.T)))
    sd_true = np.sqrt(np.diag(Cpost))
    assert np.all(sd_fit <= sd_true * 1.05)
    # meaningfully correlated target => strictly narrower somewhere
    assert np.any(sd_fit < sd_true * 0.95)


def test_advi_ref_frame_and_init():
    """ref=(mean, chol) recenters the whitening; theta0 warm-starts mu.
    A Laplace-like frame at the true posterior makes the fit trivial and
    the result identical in working coordinates."""
    misfit, prior, mu, Cpost = _linear_gaussian(seed=5)
    ref = (
        jnp.asarray(mu),
        jnp.asarray(np.linalg.cholesky(Cpost)),
    )
    res = run_advi(
        misfit, prior, jax.random.PRNGKey(6),
        n_steps=1500, n_mc=64, rank="full", lr=0.02, batched=True,
        ref=ref, theta0=jnp.asarray(mu),
    )
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.03)
    np.testing.assert_allclose(
        np.asarray(res.theta_chol @ res.theta_chol.T), Cpost, atol=0.02
    )
    # segmented run continues the same RNG stream (fresh segment offsets)
    res_seg = run_advi(
        misfit, prior, jax.random.PRNGKey(6),
        n_steps=1500, n_mc=64, rank="full", lr=0.02, batched=True,
        ref=ref, theta0=jnp.asarray(mu), segment=400,
    )
    np.testing.assert_allclose(
        np.asarray(res_seg.theta_mean), np.asarray(res.theta_mean), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_seg.L), np.asarray(res.L), atol=1e-9
    )


def test_sharded_advi_matches_posterior():
    """sharded_advi: the MC axis shards over the mesh, replicated params
    update identically everywhere (vma grad convention), and the fit
    matches the exact posterior like the single-device path."""
    from bayesianinferencedl_tpu.parallel.mesh import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_advi

    misfit, prior, mu, Cpost = _linear_gaussian(seed=7)
    mesh = device_mesh()
    res = sharded_advi(
        mesh, misfit, prior, jax.random.PRNGKey(8),
        n_steps=4000, n_mc=64, rank="full", lr=0.02, batched=True,
    )
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.03)
    np.testing.assert_allclose(
        np.asarray(res.theta_chol @ res.theta_chol.T), Cpost, atol=0.03
    )
    # params stayed replicated: theta_chol is finite + lower-triangular
    L = np.asarray(res.L)
    assert np.allclose(L, np.tril(L))
    assert np.isfinite(np.asarray(res.elbo_trace)).all()
