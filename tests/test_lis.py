"""Likelihood-informed-subspace pCN (infer/lis.py) correctness.

Two load-bearing properties, tested separately:
1. EXACTNESS for any subspace: the operator-weighted proposal is prior-
   reversible by construction, so even a deliberately WRONG basis must leave
   the posterior untouched (only mixing may suffer).
2. The subspace BUILD finds the right directions: for a linear forward the
   informed subspace is exactly the row space of the observation operator
   and the eigenvalues are the whitened GN spectrum, both analytic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, LIS, build_lis, run_lis_pcn
from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk
from bayesianinferencedl_tpu.infer.lis import run_lis_pcn_segmented
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn


def _linear_gaussian_setup(d=16, m=3, sigma=0.3, prior_sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    return H, data, prior, sigma, mu, Cpost


def test_build_lis_recovers_informed_subspace():
    """Linear forward: LIS = row space of H, lam = eig(H^T H) / sigma^2
    (whitened by the iid prior), rank = m regardless of where the
    linearization points sit."""
    d, m, sigma = 12, 3, 0.5
    H, data, prior, sigma, *_ = _linear_gaussian_setup(d=d, m=m, sigma=sigma, seed=1)
    pts = prior.sample(jax.random.PRNGKey(0), (5,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma, lam_tol=0.1)
    assert lis.rank == m
    lam_ref = np.sort(np.linalg.eigvalsh(np.asarray(H.T @ H)))[::-1][:m] / sigma**2
    np.testing.assert_allclose(np.asarray(lis.lam), lam_ref, rtol=1e-8)
    # V spans rowspace(H): projecting H's rows onto V loses nothing
    P = np.asarray(lis.V) @ np.asarray(lis.V).T
    np.testing.assert_allclose(np.asarray(H) @ P, np.asarray(H), atol=1e-8)


def test_build_lis_rank_controls():
    H, data, prior, sigma, *_ = _linear_gaussian_setup(d=10, m=4, seed=2)
    pts = prior.sample(jax.random.PRNGKey(1), (3,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma, rank_max=2)
    assert lis.rank == 2
    # a huge tolerance still keeps at least one direction
    lis1 = build_lis(lambda t: H @ t, prior, pts, sigma, lam_tol=1e12)
    assert lis1.rank == 1


def test_lis_pcn_matches_analytic_posterior():
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=16, m=3, seed=3)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    pts = prior.sample(jax.random.PRNGKey(5), (8,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_lis_pcn(
        misfit, prior, lis, theta0, jax.random.PRNGKey(1), n_steps=6000, n_burn=1000
    )
    samples = np.asarray(res.samples).reshape(-1, 16)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.08)
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.1 < acc < 0.6  # adapted toward 0.234


def test_lis_pcn_exact_under_wrong_subspace():
    """A deliberately wrong basis (random orthonormal directions, fabricated
    eigenvalues) must NOT bias the posterior — subspace quality is a mixing
    concern only. This pins the proposal's B^2 + G^2 = I bookkeeping: any
    error there shows up as a basis-dependent stationary distribution."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=8, m=2, seed=4)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((8, 3)))
    wrong = LIS(V=jnp.asarray(Q), lam=jnp.asarray([40.0, 7.0, 1.5]))
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_lis_pcn(
        misfit, prior, wrong, theta0, jax.random.PRNGKey(3),
        n_steps=9000, n_burn=2000,
    )
    samples = np.asarray(res.samples).reshape(-1, 8)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.07)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.09)


def test_lis_pcn_prior_invariance_no_data():
    """Zero misfit: every proposal accepts, beta0 adapts toward its ceiling,
    and the chain must preserve the prior exactly (non-iid prior exercises
    the whitening round trip)."""
    prior = GaussianPrior.iid(4, mean=1.5, sigma=0.7, dtype=jnp.float64)
    misfit = lambda t: jnp.asarray(0.0, jnp.float64)
    lis = LIS(V=jnp.eye(4, 2, dtype=jnp.float64), lam=jnp.asarray([9.0, 3.0]))
    theta0 = prior.sample(jax.random.PRNGKey(2), (32,))
    res = run_lis_pcn(
        misfit, prior, lis, theta0, jax.random.PRNGKey(3), n_steps=4000, n_burn=500
    )
    samples = np.asarray(res.samples).reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), 1.5, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)
    assert float(np.mean(np.asarray(res.accept_rate))) > 0.99


def test_lis_pcn_beats_pcn_ess_high_dim():
    """The reason the sampler exists: with m << d the single pCN beta must
    fit the stiffest informed direction, so the (d - m)-dimensional
    complement crawls; per-direction steps let it move at near-independence
    rates. Same adapted budget, same kept samples."""
    d, m = 48, 3
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(
        d=d, m=m, sigma=0.05, seed=6
    )
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    pts = prior.sample(jax.random.PRNGKey(7), (6,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    kw = dict(n_steps=3000, n_burn=1000)
    res_l = run_lis_pcn(misfit, prior, lis, theta0, jax.random.PRNGKey(1), **kw)
    res_p = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(1), **kw)
    ess_l = float(jnp.min(ess_bulk(res_l.samples)))
    ess_p = float(jnp.min(ess_bulk(res_p.samples)))
    assert ess_l > 3.0 * ess_p, (ess_l, ess_p)


def test_lis_pcn_segmented_matches_posterior():
    """Segment-carried state (theta in working coords + adapted beta0) gives
    the same posterior as one long run."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=10, m=2, seed=8)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    pts = prior.sample(jax.random.PRNGKey(9), (4,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (48,))
    res = run_lis_pcn_segmented(
        misfit, prior, lis, theta0, jax.random.PRNGKey(1),
        n_steps=5000, n_burn=1000, segment=256,
    )
    samples = np.asarray(res.samples).reshape(-1, 10)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.07)
    assert res.samples.shape[0] == 4000


def test_sharded_lis_pcn_matches_stats():
    """Chain axis sharded over the 8-device CPU mesh: same posterior, chain
    counts preserved, per-chain betas shard-local."""
    from bayesianinferencedl_tpu.parallel import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_lis_pcn

    mesh = device_mesh()
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=12, m=3, seed=10)
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    pts = prior.sample(jax.random.PRNGKey(11), (4,))
    lis = build_lis(lambda t: H @ t, prior, pts, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = sharded_lis_pcn(
        mesh, misfit, prior, lis, theta0, jax.random.PRNGKey(1),
        n_steps=5000, n_burn=1000,
    )
    assert res.samples.shape == (4000, 64, 12)
    samples = np.asarray(res.samples).reshape(-1, 12)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.07)
    assert res.beta.shape == (64,)
