"""Delayed-acceptance pCN (infer/delayed_acceptance.py): exactness.

SURVEY.md §4 'Posterior quality' row extended: the DA chain's stationary law
must be the FINE posterior even when the coarse surrogate is deliberately
biased — that is the whole point of the sampler (Appendix C: the ROM-only
posterior is biased; DA removes the bias at near-ROM cost)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, run_pcn
from bayesianinferencedl_tpu.infer.delayed_acceptance import (
    run_da_pcn,
    run_da_pcn_segmented,
)
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def _linear_gaussian_setup(d=3, m=4, sigma=0.5, prior_sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    return H, data, prior, sigma, mu, Cpost


def test_da_corrects_biased_coarse_to_fine_posterior():
    """Coarse forward has a deliberate O(1) bias; plain pCN on the coarse
    misfit lands on the wrong posterior, DA on the same coarse subchains
    recovers the analytic FINE posterior."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit_f = gaussian_misfit(lambda t: H @ t, data, sigma)
    bias = jnp.asarray([0.4, -0.3, 0.2, 0.1], jnp.float64)
    misfit_c = gaussian_misfit(lambda t: H @ t + bias, data, sigma)

    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_da_pcn(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, subchain=4,
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.08)
    # the coarse posterior is genuinely elsewhere — pCN on it must disagree
    res_c = run_pcn(
        misfit_c, prior, theta0, jax.random.PRNGKey(2), n_steps=4000, n_burn=1000, beta=0.4
    )
    mu_c = np.asarray(res_c.samples).reshape(-1, 3).mean(0)
    assert np.linalg.norm(mu_c - mu) > 0.15
    # a usable surrogate keeps the fine correction cheap but not vacuous
    out_acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.2 < out_acc < 0.999


def test_da_mala_inner_corrects_biased_coarse():
    """inner='mala': gradient-informed subchains must target the SAME fine
    posterior (the S-step MALA kernel is reversible w.r.t. the coarse
    posterior, so the DA composition argument is unchanged)."""
    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup()
    misfit_f = gaussian_misfit(lambda t: H @ t, data, sigma)
    bias = jnp.asarray([0.4, -0.3, 0.2, 0.1], jnp.float64)
    misfit_c = gaussian_misfit(lambda t: H @ t + bias, data, sigma)

    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_da_pcn(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, subchain=4, inner="mala",
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.08)
    out_acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.2 < out_acc < 0.999


def test_da_mala_inner_beats_pcn_inner_ess():
    """The reason the option exists: at d=16 the MALA subchain decorrelates
    materially faster per OUTER step (= per fine evaluation — the DA figure
    of merit) than the random-walk subchain, at identical exactness.

    Run in DA's design regime — accurate surrogate (small additive bias),
    chains initialized near the posterior (measured here: mala-inner
    ess_min 330 vs pcn-inner 154 at identical posterior means). From
    PRIOR-DISTANT starts with a multiplicative surrogate error, BOTH inner
    kernels stall (the outer veto scales with the subchain's accumulated
    misfit drift — the classic DA pathology the run_da_pcn adaptation note
    documents), so that regime is not a proposal-quality comparison."""
    from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk

    H, data, prior, sigma, mu, Cpost = _linear_gaussian_setup(d=16, m=24, sigma=0.3)
    misfit_f = gaussian_misfit(lambda t: H @ t, data, sigma)
    rng = np.random.default_rng(7)
    bias = jnp.asarray(rng.standard_normal(24) * 0.02)
    misfit_c = gaussian_misfit(lambda t: H @ t + bias, data, sigma)
    L = np.linalg.cholesky(Cpost)
    z = np.random.default_rng(1).standard_normal((32, 16))
    theta0 = jnp.asarray(mu + z @ L.T)
    kw = dict(n_steps=1500, n_burn=500, subchain=8)
    res_m = run_da_pcn(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(1), inner="mala", **kw
    )
    res_p = run_da_pcn(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(1), inner="pcn", **kw
    )
    ess_m = float(jnp.min(ess_bulk(res_m.samples)))
    ess_p = float(jnp.min(ess_bulk(res_p.samples)))
    assert ess_m > 1.5 * ess_p, (ess_m, ess_p)
    # both exact: posterior means agree with the analytic fine posterior
    for res in (res_m, res_p):
        emp = np.asarray(res.samples).reshape(-1, 16).mean(0)
        np.testing.assert_allclose(emp, mu, atol=0.08)


def test_da_identity_coarse_accepts_everything():
    """With coarse == fine the outer log-ratio is identically zero, so every
    outer correction accepts — DA degrades gracefully to subsampled pCN."""
    H, data, prior, sigma, *_ = _linear_gaussian_setup()
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(3), (16,))
    res = run_da_pcn(
        misfit, misfit, prior, theta0, jax.random.PRNGKey(4),
        n_steps=300, n_burn=100, beta=0.3, subchain=4,
    )
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)
    assert res.samples.shape == (200, 16, 3)
    assert bool(jnp.isfinite(res.samples).all())


def test_da_prior_invariance_no_data():
    """Zero fine and coarse misfits: the DA chain leaves the prior invariant
    (inner pCN is prior-reversible, outer correction always accepts)."""
    prior = GaussianPrior.iid(2, mean=1.0, sigma=0.7, dtype=jnp.float64)
    zero = lambda t: jnp.asarray(0.0, jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(5), (32,))
    res = run_da_pcn(
        zero, zero, prior, theta0, jax.random.PRNGKey(6),
        n_steps=2500, n_burn=500, beta=0.6, subchain=4,
    )
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(0), 1.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)


def test_da_segmented_matches_unsegmented_law():
    """The segmented dispatch carries chain state/betas across segments; its
    posterior moments must agree with the one-shot run (same law, different
    keys) and its accept accounting must cover the whole post-burn run."""
    H, data, prior, sigma, mu, _ = _linear_gaussian_setup()
    misfit_f = gaussian_misfit(lambda t: H @ t, data, sigma)
    misfit_c = gaussian_misfit(lambda t: H @ t + 0.2, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(7), (64,))
    res = run_da_pcn_segmented(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(8),
        n_steps=4000, n_burn=1000, beta=0.4, subchain=4, segment=700,
    )
    assert res.samples.shape == (3000, 64, 3)
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.07)
    assert 0.0 < float(np.mean(np.asarray(res.accept_rate))) <= 1.0
    assert 0.0 < float(np.mean(np.asarray(res.inner_accept_rate))) < 1.0


def test_da_on_fin_pipeline_fom_likelihood():
    """End-to-end smoke on the real pipeline: DA with the rom_nn surrogate
    screening and the full-order likelihood correcting. The surrogate is
    accurate, so outer acceptance should sit near 1 while each outer step
    costs one batched FOM solve instead of `subchain`."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=400),
        rom=ROMConfig(n_snapshots=48, basis_size=14),
        surrogate=SurrogateConfig(hidden=(32, 32), n_train=96, epochs=60),
        mcmc=MCMCConfig(
            n_chains=32, n_steps=220, n_burn=100, beta=0.25, noise_sigma=1e-2,
            likelihood="fom", sampler="da_pcn", subchain=4, da_coarse="rom_nn",
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    inv = run_inversion(pipe)
    res = inv.result
    assert res.samples.shape == (120, 32, 5)
    assert bool(jnp.isfinite(res.samples).all())
    # accurate surrogate -> fine corrections nearly free
    assert float(np.mean(np.asarray(res.accept_rate))) > 0.6
    assert res.n_fine_evals < cfg.mcmc.n_steps * cfg.mcmc.subchain / 2


def test_pt_da_on_fin_pipeline_fom_likelihood():
    """Tempered DA end-to-end: the exact FOM posterior with multimodal-capable
    mixing, fom likelihood corrected from rom_nn subchains, through
    run_inversion's segmented dispatch."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=400),
        rom=ROMConfig(n_snapshots=48, basis_size=14),
        surrogate=SurrogateConfig(hidden=(32, 32), n_train=96, epochs=60),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=150, n_burn=70, beta=0.25, noise_sigma=1e-2,
            likelihood="fom", sampler="pt_da_pcn", subchain=4, da_coarse="rom_nn",
            n_temps=3, lambda_min=0.1,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    inv = run_inversion(pipe)
    res = inv.result
    assert res.samples.shape == (80, 16, 5)
    assert res.theta.shape == (3, 16, 5)
    assert bool(jnp.isfinite(res.samples).all())
    # accurate surrogate -> outer corrections accept at the cold level
    assert float(np.mean(np.asarray(res.accept_rate[-1]))) > 0.6
