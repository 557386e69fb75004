"""PSIS (infer/psis.py): the importance-sampling certify-and-correct layer
for the Gaussian fast approximations — exactness when the proposal is the
posterior, correction when it covers, and an honest k-hat FAIL when it
doesn't."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.psis import psis_correct, psis_smooth


def _linear_gaussian(d=5, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((d, d)), jnp.float64)
    data = jnp.asarray(rng.standard_normal(d))
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(A.T @ A) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(A.T @ data) / sigma**2

    def misfit(th):
        r = th @ A.T - data
        return 0.5 / sigma**2 * jnp.sum(r * r, axis=-1)

    return misfit, prior, mu, Cpost, (A, data, sigma)


def _analytic_log_evidence(A, data, sigma):
    """log E_mu0[exp(-Phi)] for the linear-Gaussian problem: exp(-Phi) =
    (2 pi sigma^2)^{m/2} N(y; A theta, sigma^2 I), marginalized over the
    standard-normal prior -> (2 pi sigma^2)^{m/2} N(y; 0, A A^T+sigma^2 I)."""
    A = np.asarray(A, np.float64)
    y = np.asarray(data, np.float64)
    m = y.size
    S = A @ A.T + sigma**2 * np.eye(m)
    _, logdet = np.linalg.slogdet(S)
    return float(
        0.5 * m * np.log(2.0 * np.pi * sigma**2)
        - 0.5 * (y @ np.linalg.solve(S, y) + logdet + m * np.log(2.0 * np.pi))
    )


def test_psis_exact_proposal():
    """q = the exact posterior: weights are constant, k-hat tiny, ESS ~ K,
    and the weighted moments reproduce the posterior."""
    misfit, prior, mu, Cpost, aux = _linear_gaussian()
    res = psis_correct(
        misfit, prior, jnp.asarray(mu), jnp.asarray(np.linalg.cholesky(Cpost)),
        jax.random.PRNGKey(1), n_draws=4096, batched=True,
    )
    assert res.k_hat < 0.3
    assert res.reliable
    assert res.ess > 0.98 * 4096  # constant weights
    np.testing.assert_allclose(res.mean, mu, atol=0.03)
    np.testing.assert_allclose(res.cov, Cpost, atol=0.03)
    # evidence from the raw weights matches the analytic prior-predictive
    # mass (the infer/evidence.py convention)
    assert abs(res.log_evidence - _analytic_log_evidence(*aux)) < 0.05


def test_psis_corrects_covering_proposal():
    """q wider and shifted (covers the posterior): raw q moments are wrong,
    the importance-weighted moments are right, k-hat stays below 0.7."""
    misfit, prior, mu, Cpost, aux = _linear_gaussian(seed=2)
    q_mean = jnp.asarray(mu + 0.25)  # deliberately biased
    q_chol = jnp.asarray(2.0 * np.linalg.cholesky(Cpost))  # deliberately wide
    res = psis_correct(
        misfit, prior, q_mean, q_chol, jax.random.PRNGKey(3),
        n_draws=16384, batched=True,
    )
    assert res.reliable, res.k_hat
    # the correction beats the proposal on every coordinate
    err_q = np.abs(np.asarray(q_mean) - mu)
    err_c = np.abs(res.mean - mu)
    assert float(err_c.mean()) < 0.25 * float(err_q.mean())
    np.testing.assert_allclose(res.mean, mu, atol=0.05)
    np.testing.assert_allclose(res.cov, Cpost, atol=0.08)
    assert res.ess < 16384  # non-trivial weights
    # the evidence estimate survives a biased+wide proposal too
    assert abs(res.log_evidence - _analytic_log_evidence(*aux)) < 0.1


def test_psis_flags_non_covering_proposal():
    """q much NARROWER than the posterior and shifted: the importance
    weights are heavy-tailed, k-hat crosses the 0.7 usability threshold —
    the gate fails loudly instead of returning silently-wrong moments."""
    misfit, prior, mu, Cpost, aux = _linear_gaussian(seed=4)
    q_mean = jnp.asarray(mu + 3.0 * np.sqrt(np.diag(Cpost)))
    q_chol = jnp.asarray(np.linalg.cholesky(Cpost) * 0.15)
    res = psis_correct(
        misfit, prior, q_mean, q_chol, jax.random.PRNGKey(5),
        n_draws=4096, batched=True,
    )
    assert res.k_hat >= 0.7
    assert not res.reliable


def test_psis_smooth_preserves_body_and_tames_tail():
    """psis_smooth touches only the M largest weights, never increases the
    max, and recovers the tail index of a known generalized-Pareto tail."""
    rng = np.random.default_rng(6)
    K = 8192
    # pure GPD(xi=0.4) weights: GPD is threshold-stable, so the exceedances
    # above ANY cut are GPD with the SAME shape — an exact oracle for the
    # fitted tail index
    u = rng.uniform(size=K)
    k_true = 0.4
    gpd = (np.power(1.0 - u, -k_true) - 1.0) / k_true  # sigma = 1
    lw = np.log(gpd + 1e-9)
    sm, k_hat = psis_smooth(lw)
    assert abs(k_hat - k_true) < 0.15
    assert sm.max() <= 1e-12
    # the body (all but the tail M) is only shifted, never reordered
    M = int(min(np.ceil(0.2 * K), 3.0 * np.sqrt(K)))
    order = np.argsort(lw)
    body = order[:-M]
    d = sm[body] - (lw[body] - lw.max())
    assert np.allclose(d, d[0], atol=1e-12)


def test_psis_certify_on_pipeline_fit():
    """api.psis_certify closes the loop on a real VI fit: the rom_nn
    posterior at 1e-2 noise is near-Gaussian, so a full-rank ADVI fit must
    pass the gate with a small k-hat and a correction that stays close to
    the fit mean."""
    from dataclasses import replace

    from bayesianinferencedl_tpu.api import (
        build_pipeline, psis_certify, run_vi_inversion,
    )
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=48, basis_size=16),
        surrogate=SurrogateConfig(hidden=(24, 24), n_train=128, epochs=60),
        mcmc=MCMCConfig(noise_sigma=1e-2),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64)
    key = jax.random.PRNGKey(11)
    res, theta_true, data, _ = run_vi_inversion(
        pipe, "rom_nn", n_steps=1500, n_mc=32, key=key,
    )
    cert = psis_certify(
        pipe, res.theta_mean, res.theta_chol, data, "rom_nn",
        n_draws=4096, key=jax.random.PRNGKey(12),
    )
    assert cert.reliable, cert.k_hat
    assert cert.ess > 100
    np.testing.assert_allclose(
        cert.mean, np.asarray(res.theta_mean), atol=0.15
    )


def test_psis_sharded_sweep_matches_single_device():
    """mesh=: the certification forward sweep shards the draw axis over the
    mesh (run_eki pattern). Same key => identical draws, so the sharded and
    single-device results are bit-identical up to reduction order."""
    from bayesianinferencedl_tpu.parallel.mesh import device_mesh

    misfit, prior, mu, Cpost, aux = _linear_gaussian(seed=8)
    q_mean = jnp.asarray(mu)
    q_chol = jnp.asarray(np.linalg.cholesky(Cpost))
    r1 = psis_correct(misfit, prior, q_mean, q_chol, jax.random.PRNGKey(9),
                      n_draws=4096, batched=False)
    r8 = psis_correct(misfit, prior, q_mean, q_chol, jax.random.PRNGKey(9),
                      n_draws=4096, batched=False, mesh=device_mesh())
    assert r8.reliable
    np.testing.assert_allclose(r8.mean, r1.mean, atol=1e-8)
    np.testing.assert_allclose(r8.k_hat, r1.k_hat, atol=1e-8)
    np.testing.assert_allclose(r8.log_evidence, r1.log_evidence, atol=1e-8)


def test_psis_nonfinite_forward_voids_certificate():
    """A proposal with mass where the forward is non-evaluable (NaN misfit —
    the degenerate-flow failure seen in a bench run): the NaN draws get zero
    weight instead of poisoning every output, the moments stay finite and
    close to the evaluable posterior, and the certificate is VOIDED
    (reliable=False) regardless of the fitted tail shape."""
    from bayesianinferencedl_tpu.infer.psis import psis_correct_draws

    misfit, prior, mu, Cpost, aux = _linear_gaussian()

    def misfit_nan(th):
        phi = misfit(th)
        return jnp.where(jnp.max(jnp.abs(th), axis=-1) > 4.0, jnp.nan, phi)

    # exact-posterior proposal, widened enough that a few draws cross the
    # |theta| > 4 cliff
    L = np.linalg.cholesky(Cpost)
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (4096, 5), jnp.float64)
    theta = jnp.asarray(mu) + 3.0 * (z @ jnp.asarray(L).T)
    log_q = -0.5 * jnp.sum(z * z, axis=-1) - jnp.log(
        jnp.prod(jnp.abs(jnp.diag(jnp.asarray(L)))) * 3.0**5
    )
    res = psis_correct_draws(misfit_nan, prior, theta, log_q, batched=True)
    n_nan = int(jnp.sum(jnp.isnan(misfit_nan(theta))))
    assert n_nan > 0  # the scenario actually exercises the cliff
    assert np.isfinite(res.mean).all() and np.isfinite(res.cov).all()
    assert np.isfinite(res.log_evidence)
    assert not res.reliable
    np.testing.assert_allclose(res.mean, mu, atol=0.1)

    # all draws non-evaluable: honest degenerate result, not a crash
    res_all = psis_correct_draws(
        lambda th: jnp.full(th.shape[:-1], jnp.nan), prior, theta, log_q,
        batched=True,
    )
    assert not res_all.reliable
    assert res_all.ess == 0.0
    assert res_all.log_evidence == -np.inf
