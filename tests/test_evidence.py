"""Model-evidence estimators (infer/evidence.py) against analytic and
quadrature oracles.

The linear-Gaussian case has a closed-form evidence: with Phi =
||d - H theta||^2 / (2 sigma^2) and prior N(0, sp^2 I),

    log Z = m log sigma - (1/2) log|S| - (1/2) d^T S^{-1} d,
    S = sp^2 H H^T + sigma^2 I.

Gates: (1) stepping-stone matches it on EVERY ladder — geometric and
swap-rate-adapted — for all three tempered samplers; (2) variance-corrected
TI matches on geometric ladders (its documented regime) and serves as the
independent cross-check; (3) on a bimodal target the PT evidence matches a
dense 1-D quadrature oracle, covering the case where naive prior-importance
estimates collapse onto one mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.infer.evidence import (
    log_evidence_from_pt, log_evidence_ss, log_evidence_ti, prior_phi_moments,
)
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.tempering import run_pt_da, run_pt_mala, run_pt_pcn


def _linear_gaussian():
    d, m, sigma, sp = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=sp, dtype=jnp.float64)
    S = sp**2 * np.asarray(H @ H.T) + sigma**2 * np.eye(m)
    log_z = (
        m * np.log(sigma)
        - 0.5 * np.linalg.slogdet(S)[1]
        - 0.5 * np.asarray(data) @ np.linalg.solve(S, np.asarray(data))
    )
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    return misfit, prior, float(log_z)


@pytest.mark.parametrize(
    "n_temps,lambda_min,adapt_ladder",
    [(6, 0.01, False), (8, 0.05, True), (5, 0.2, True)],
)
def test_ss_evidence_matches_analytic_any_ladder(n_temps, lambda_min, adapt_ladder):
    misfit, prior, log_z = _linear_gaussian()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=8000, n_burn=2000, beta=0.4, n_temps=n_temps,
        lambda_min=lambda_min, adapt_ladder=adapt_ladder,
    )
    est = log_evidence_from_pt(res, misfit, prior, jax.random.PRNGKey(7), batched=False)
    assert abs(est.log_z - log_z) < max(3 * est.log_z_std / 8, 0.06), (est.log_z, log_z)
    # the per-group spread is an honest error bar at this chain count
    assert est.log_z_std < 0.2


def test_ti_evidence_matches_on_geometric_ladder():
    """Variance-corrected TI: the documented-exact regime (geometric ladder),
    and an estimator with no machinery shared with stepping-stone beyond the
    chains — agreement is a real cross-check."""
    misfit, prior, log_z = _linear_gaussian()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=8000, n_burn=2000, beta=0.4, n_temps=6, lambda_min=0.01,
    )
    est_ti = log_evidence_from_pt(
        res, misfit, prior, jax.random.PRNGKey(7), batched=False, method="ti"
    )
    est_ss = log_evidence_from_pt(
        res, misfit, prior, jax.random.PRNGKey(7), batched=False, method="ss"
    )
    assert abs(est_ti.log_z - log_z) < 0.06, (est_ti.log_z, log_z)
    assert abs(est_ti.log_z - est_ss.log_z) < 0.06


def test_ti_uncorrected_vs_corrected_bias_ordering():
    """The Hermite variance term must REDUCE the trapezoid bias on a coarse
    geometric ladder (it cancels the O(h^2) error term)."""
    misfit, prior, log_z = _linear_gaussian()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=8000, n_burn=2000, beta=0.4, n_temps=5, lambda_min=0.01,
    )
    e0, e2_0 = prior_phi_moments(misfit, prior, jax.random.PRNGKey(7), 4096, batched=False)
    plain = log_evidence_ti(res.lambdas, res.phi_level_mean, e0)
    corr = log_evidence_ti(
        res.lambdas, res.phi_level_mean, e0,
        phi2_level_mean=res.phi2_level_mean, phi2_prior_mean=e2_0,
    )
    assert abs(corr.log_z - log_z) < abs(plain.log_z - log_z), (corr.log_z, plain.log_z)


def test_ss_evidence_mala_and_da_samplers():
    """The accumulators ride all three tempered samplers; for PT-DA the
    curve holds the FINE misfit, so the evidence is the fine model's."""
    misfit, prior, log_z = _linear_gaussian()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res_m = run_pt_mala(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=2000, n_temps=6, lambda_min=0.05,
        adapt_ladder=True, batched=False,
    )
    est_m = log_evidence_from_pt(res_m, misfit, prior, jax.random.PRNGKey(7), batched=False)
    assert abs(est_m.log_z - log_z) < 0.1, (est_m.log_z, log_z)

    misfit_c = lambda t: misfit(t) * 1.03  # deliberately biased coarse model
    res_d = run_pt_da(
        misfit, misfit_c, prior, theta0, jax.random.PRNGKey(1),
        n_steps=3000, n_burn=1000, subchain=4, n_temps=6, lambda_min=0.05,
        adapt_ladder=True, batched=False,
    )
    est_d = log_evidence_from_pt(res_d, misfit, prior, jax.random.PRNGKey(7), batched=False)
    assert abs(est_d.log_z - log_z) < 0.1, (est_d.log_z, log_z)


def test_ss_evidence_bimodal_quadrature_oracle():
    """Evidence of a bimodal target against dense 1-D quadrature — the case
    tempering exists for: chains must weight BOTH wells to integrate Z."""
    a, s, depth = 1.6, 0.12, 0.5

    def misfit(t):
        q1 = (t[..., 0] - a) ** 2 / (2 * s**2)
        q2 = (t[..., 0] + a) ** 2 / (2 * s**2) + depth
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    g = np.linspace(-6, 6, 400001)
    q1 = (g - a) ** 2 / (2 * s**2)
    q2 = (g + a) ** 2 / (2 * s**2) + depth
    log_integrand = np.logaddexp(-q1, -q2) - 0.5 * g**2 - 0.5 * np.log(2 * np.pi)
    mx = log_integrand.max()
    log_z = mx + np.log(np.trapezoid(np.exp(log_integrand - mx), g))

    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, beta=0.3, n_temps=6, lambda_min=0.02,
        adapt_ladder=True,
    )
    est = log_evidence_from_pt(res, misfit, prior, jax.random.PRNGKey(7), batched=False)
    assert abs(est.log_z - log_z) < 0.1, (est.log_z, float(log_z))


def test_three_estimator_evidence_consistency():
    """The repo now carries THREE independent evidence estimators —
    stepping-stone over the PT ladder (infer/evidence.py), unbiased SMC
    (infer/smc.py), and PSIS raw-weight importance sampling over an ADVI
    fit (infer/psis.py) — all under the same Z = E_mu0[exp(-Phi)]
    convention. On the linear-Gaussian oracle they must agree with the
    analytic value AND each other (the cross-check a real model-comparison
    workflow leans on)."""
    from bayesianinferencedl_tpu.infer.psis import psis_correct
    from bayesianinferencedl_tpu.infer.smc import run_smc
    from bayesianinferencedl_tpu.infer.vi import run_advi

    misfit, prior, log_z = _linear_gaussian()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))

    res_pt = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=2000, n_temps=6, lambda_min=0.05,
        adapt_ladder=True, batched=False,
    )
    z_ss = log_evidence_from_pt(
        res_pt, misfit, prior, jax.random.PRNGKey(7), batched=False
    ).log_z

    z_smc = float(run_smc(
        misfit, prior, jax.random.PRNGKey(2), n_particles=4096,
        n_mutations=5, batched=False,
    ).log_evidence)

    fit = run_advi(
        misfit, prior, jax.random.PRNGKey(3),
        n_steps=3000, n_mc=64, rank="full", lr=0.02, batched=False,
    )
    cert = psis_correct(
        misfit, prior, fit.theta_mean, fit.theta_chol,
        jax.random.PRNGKey(4), n_draws=8192, batched=False,
    )
    assert cert.reliable, cert.k_hat
    z_psis = cert.log_evidence

    for name, z in (("ss", z_ss), ("smc", z_smc), ("psis", z_psis)):
        assert abs(z - log_z) < 0.1, (name, z, log_z)
    spread = max(z_ss, z_smc, z_psis) - min(z_ss, z_smc, z_psis)
    assert spread < 0.15, (z_ss, z_smc, z_psis)
