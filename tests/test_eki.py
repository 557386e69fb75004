"""Ensemble Kalman inversion (infer/eki.py): linear-Gaussian exactness and
the adaptive-tempering schedule contract (SURVEY.md A.5 inversion layer —
beyond-reference derivative-free ensemble method)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.eki import run_eki
from bayesianinferencedl_tpu.infer.priors import GaussianPrior

D, M = 5, 7
A = jnp.asarray(np.random.default_rng(0).standard_normal((M, D)), jnp.float64)
SIG = 0.1


def _posterior():
    prior = GaussianPrior.iid(D, sigma=1.0, dtype=jnp.float64)
    theta_true = prior.sample(jax.random.PRNGKey(10))
    y = A @ theta_true + SIG * jax.random.normal(jax.random.PRNGKey(11), (M,), jnp.float64)
    P = np.linalg.inv(np.eye(D) + np.asarray(A).T @ np.asarray(A) / SIG**2)
    mu = P @ (np.asarray(A).T @ np.asarray(y) / SIG**2)
    return prior, y, mu, P


def test_eki_linear_gaussian_exact():
    """Adaptive-tempering perturbed-observation EKI is consistent for
    linear G + Gaussian prior: ensemble mean AND marginal spread converge
    to the analytic posterior (the spread claim is what separates the
    tempered transport from plain iterate-to-collapse EKI)."""
    prior, y, mu, P = _posterior()
    res = run_eki(
        lambda th: th @ A.T, prior, y, SIG, jax.random.PRNGKey(2),
        n_ensemble=4096,
    )
    np.testing.assert_allclose(np.asarray(res.mean), mu, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(res.std), np.sqrt(np.diag(P)), atol=0.02
    )


def test_eki_schedule_contract():
    """The adaptive schedule reaches t = 1 exactly, knots are strictly
    increasing, the ensemble-mean misfit decreases monotonically along the
    transport, and the forward-evaluation count is (n_knots)x(J)."""
    prior, y, mu, P = _posterior()
    res = run_eki(
        lambda th: th @ A.T, prior, y, SIG, jax.random.PRNGKey(3),
        n_ensemble=512,
    )
    ts = np.asarray(res.ts)
    assert ts[0] == 0.0 and ts[-1] == 1.0
    assert np.all(np.diff(ts) > 0)
    tr = np.asarray(res.misfit_trace)
    assert np.all(np.diff(tr) < 0), tr
    assert res.n_forward == len(res.ts) * 512  # (knots-1) updates + final eval


def test_eki_sharp_likelihood_takes_more_steps():
    """The pace adapts to the likelihood: 10x smaller noise needs more
    tempering increments to keep the per-step ESS fraction."""
    prior, y, mu, P = _posterior()
    n = {}
    for sig in (0.1, 0.01):
        res = run_eki(lambda th: th @ A.T, prior, y, sig,
                      jax.random.PRNGKey(4), n_ensemble=512)
        n[sig] = len(res.ts) - 1
    assert n[0.01] > n[0.1], n


def test_eki_sharded_matches_single_device():
    """mesh= shards the ensemble axis over ICI for the forward sweeps; the
    transport is numerically the same as the single-device run (the host
    algebra is identical — only the device-side batch layout changes)."""
    from bayesianinferencedl_tpu.parallel.mesh import device_mesh

    prior, y, mu, P = _posterior()
    kw = dict(n_ensemble=512, key=jax.random.PRNGKey(5))
    r1 = run_eki(lambda th: th @ A.T, prior, y, SIG, kw["key"],
                 n_ensemble=512)
    r2 = run_eki(lambda th: th @ A.T, prior, y, SIG, kw["key"],
                 n_ensemble=512, mesh=device_mesh())
    np.testing.assert_allclose(
        np.asarray(r1.mean), np.asarray(r2.mean), atol=1e-5
    )
    assert r1.ts == r2.ts
