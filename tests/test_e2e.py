"""End-to-end pipeline test: the minimum slice of SURVEY.md §7 plus the
paper's three-way posterior comparison (SURVEY.md Appendix C) at toy scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MCMCConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)


@pytest.fixture(scope="module")
def pipe():
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=64, basis_size=24),
        surrogate=SurrogateConfig(hidden=(32, 32), n_train=256, epochs=100, batch_size=64),
        mcmc=MCMCConfig(n_chains=32, n_steps=1500, n_burn=500, beta=0.3, noise_sigma=1e-3),
    )
    return build_pipeline(cfg, dtype=jnp.float64)


def test_greedy_pipeline_builds():
    """build_pipeline with the greedy RB method (SURVEY.md §3.3 greedy path
    through the full offline stack)."""
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-10, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=32, basis_size=8, method="greedy", greedy_candidates=32),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=20),
    )
    p = build_pipeline(cfg, dtype=jnp.float64)
    y = p.forward_fn("rom_nn")(jnp.zeros(5))
    assert np.isfinite(np.asarray(y)).all()
    ds = p.dataset
    rel = float(jnp.linalg.norm(ds.error) / jnp.linalg.norm(ds.y_fom))
    assert rel < 0.2  # r=8 greedy basis is coarse but sane


def test_offline_artifacts_quality(pipe):
    s = {}
    # ROM is accurate; NN correction reduces the residual further
    ds = pipe.dataset
    rom_rel = float(jnp.linalg.norm(ds.error) / jnp.linalg.norm(ds.y_fom))
    y_corr = pipe.corrected.batch(ds.log_k)
    corr_rel = float(jnp.linalg.norm(y_corr - ds.y_fom) / jnp.linalg.norm(ds.y_fom))
    assert rom_rel < 5e-3
    assert corr_rel < rom_rel


def test_inversion_recovers_truth(pipe):
    inv = run_inversion(pipe, likelihood="rom_nn", key=jax.random.PRNGKey(11))
    post_mean = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    theta_true = np.asarray(inv.theta_true)
    # with 1e-3 noise the posterior concentrates near the truth
    assert np.abs(post_mean - theta_true).max() < 0.25, (post_mean, theta_true)
    assert float(jnp.mean(inv.result.accept_rate)) > 0.05


def test_cross_sampler_ks_on_fin(pipe):
    """Two independent sampler implementations (pCN, Laplace-MH) target the
    same fin posterior: marginal KS distances must be small (SURVEY.md §4
    posterior-quality oracle, on the real problem rather than a toy)."""
    from bayesianinferencedl_tpu.infer.diagnostics import ks_distance

    key = jax.random.PRNGKey(31)
    theta_true = pipe.prior.sample(key)
    inv_a = run_inversion(pipe, likelihood="rom_nn", sampler="laplace_mh",
                          theta_true=theta_true, key=key)
    inv_b = run_inversion(pipe, likelihood="rom_nn", sampler="gpcn",
                          theta_true=theta_true, key=key)
    d = np.asarray(ks_distance(
        inv_a.result.samples.reshape(-1, 5), inv_b.result.samples.reshape(-1, 5)
    ))
    assert (d < 0.08).all(), d


def test_laplace_sampler_inversion(pipe):
    """gpcn + laplace_mh samplers through the full pipeline: consistent
    posterior means and (near-)unit acceptance for the independence sampler
    near the Gaussian regime."""
    key = jax.random.PRNGKey(21)
    theta_true = pipe.prior.sample(key)
    inv_pcn = run_inversion(pipe, likelihood="rom_nn", sampler="pcn", theta_true=theta_true, key=key)
    inv_mh = run_inversion(pipe, likelihood="rom_nn", sampler="laplace_mh", theta_true=theta_true, key=key)
    inv_g = run_inversion(pipe, likelihood="rom_nn", sampler="gpcn", theta_true=theta_true, key=key)
    m_pcn = np.asarray(inv_pcn.result.samples.mean(axis=(0, 1)))
    m_mh = np.asarray(inv_mh.result.samples.mean(axis=(0, 1)))
    m_g = np.asarray(inv_g.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(m_mh, m_g, atol=0.1)
    np.testing.assert_allclose(m_mh, m_pcn, atol=0.2)
    assert float(jnp.mean(inv_mh.result.accept_rate)) > 0.3
    # Laplace samplers mix far better: ESS per kept sample
    assert float(jnp.min(inv_mh.ess)) > 2 * float(jnp.min(inv_pcn.ess))


def test_mala_sampler_inversion(pipe):
    """mala + mala_lap through the full pipeline (gradients of the rom_nn
    likelihood via the differentiable batched forward): posterior means agree
    with the Laplace independence sampler, and the Laplace-preconditioned
    variant mixes far better than random-walk pCN."""
    key = jax.random.PRNGKey(23)
    theta_true = pipe.prior.sample(key)
    inv_mh = run_inversion(pipe, likelihood="rom_nn", sampler="laplace_mh",
                           theta_true=theta_true, key=key)
    inv_m = run_inversion(pipe, likelihood="rom_nn", sampler="mala",
                          theta_true=theta_true, key=key)
    inv_ml = run_inversion(pipe, likelihood="rom_nn", sampler="mala_lap",
                           theta_true=theta_true, key=key)
    m_mh = np.asarray(inv_mh.result.samples.mean(axis=(0, 1)))
    m_m = np.asarray(inv_m.result.samples.mean(axis=(0, 1)))
    m_ml = np.asarray(inv_ml.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(m_ml, m_mh, atol=0.1)
    np.testing.assert_allclose(m_m, m_mh, atol=0.2)
    assert 0.3 < float(jnp.mean(inv_ml.result.accept_rate)) < 0.9
    inv_pcn = run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                            theta_true=theta_true, key=key)
    assert float(jnp.min(inv_ml.ess)) > 2 * float(jnp.min(inv_pcn.ess))


def test_mala_fom_likelihood_adjoint_gradients(pipe):
    """sampler='mala' with the FOM likelihood: each step differentiates the
    full-order solve through lax.custom_linear_solve (exact adjoint — the
    reference's hand-coded-adjoint capability driving a sampler, SURVEY.md
    A.5) on the segmented watchdog-safe path."""
    import dataclasses

    cfg = dataclasses.replace(
        pipe.config,
        mcmc=MCMCConfig(
            n_chains=8, n_steps=120, n_burn=60, noise_sigma=1e-2,
            likelihood="fom", sampler="mala",
        ),
    )
    p = dataclasses.replace(pipe, config=cfg)
    inv = run_inversion(p, key=jax.random.PRNGKey(29))
    assert inv.result.samples.shape == (60, 8, 5)
    assert np.isfinite(np.asarray(inv.result.samples)).all()
    acc = float(jnp.mean(inv.result.accept_rate))
    assert 0.05 < acc <= 1.0
    # the audit route still sees the fom likelihood
    assert inv.fom_hit_cap_frac == 0.0


def test_three_way_likelihood_comparison(pipe):
    """FOM, ROM, ROM+NN posteriors must be mutually consistent on a well-
    resolved problem (Appendix C claim structure). The near-iid Laplace
    independence sampler keeps Monte-Carlo error far below the comparison
    threshold (random-walk pCN mixes too slowly in the weakly-identified
    directions for a mean comparison at this scale)."""
    key = jax.random.PRNGKey(5)
    theta_true = pipe.prior.sample(key)
    means = {}
    for like in ["fom", "rom", "rom_nn"]:
        inv = run_inversion(
            pipe, likelihood=like, sampler="laplace_mh", theta_true=theta_true, key=key
        )
        means[like] = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    # ROM is accurate here, so all three agree; rom_nn at least as close to fom as rom
    d_rom = np.linalg.norm(means["rom"] - means["fom"])
    d_nn = np.linalg.norm(means["rom_nn"] - means["fom"])
    assert d_nn < 0.1, (means,)
    assert d_rom < 0.1, (means,)


def test_fom_iter_cap_audit_surfaces_unconverged_solves():
    """VERDICT r2 item 7: a FOM-likelihood run whose solver hits its
    iteration cap must surface that in InversionResult instead of silently
    biasing the chain. Forced here with a tiny cg_maxiter."""
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=4),  # guaranteed capped
        rom=ROMConfig(n_snapshots=16, basis_size=6),
        surrogate=SurrogateConfig(hidden=(8,), n_train=32, epochs=5),
        mcmc=MCMCConfig(
            n_chains=4, n_steps=80, n_burn=40, noise_sigma=1e-1,
            likelihood="fom", sampler="pcn",
        ),
    )
    p = build_pipeline(cfg, dtype=jnp.float64)
    with pytest.warns(UserWarning, match="iteration cap"):
        inv = run_inversion(p)
    assert inv.fom_iter_cap == 4
    assert inv.fom_iter_max >= 4
    assert inv.fom_hit_cap_frac == 1.0


def test_fom_iter_audit_clean_on_converged_solver(pipe):
    """Converged-solver counterpart: audit reports zero cap hits."""
    import dataclasses

    cfg = dataclasses.replace(
        pipe.config,
        mcmc=MCMCConfig(
            n_chains=4, n_steps=60, n_burn=30, noise_sigma=1e-2,
            likelihood="fom", sampler="pcn",
        ),
    )
    inv = run_inversion(dataclasses.replace(pipe, config=cfg))
    assert inv.fom_hit_cap_frac == 0.0
    assert inv.fom_iter_max < inv.fom_iter_cap


def test_hmc_auto_leap_through_pipeline(pipe):
    """hmc_leap=0 = ChEES auto trajectory tuning (infer/hmc.py
    run_hmc_chees) through run_inversion: the probe table lands in the
    metrics log, the chosen length is a probe candidate, and the posterior
    mean agrees with the Laplace sampler. fom + auto is refused (probes are
    unsegmented — the watchdog guard)."""
    from dataclasses import replace

    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    cfg2 = replace(pipe.config, mcmc=replace(pipe.config.mcmc, hmc_leap=0))
    pipe2 = replace(pipe, config=cfg2)
    key = jax.random.PRNGKey(29)
    theta_true = pipe.prior.sample(key)
    log = MetricsLogger()
    inv_mh = run_inversion(pipe, likelihood="rom_nn", sampler="laplace_mh",
                           theta_true=theta_true, key=key)
    inv = run_inversion(pipe2, likelihood="rom_nn", sampler="hmc",
                        theta_true=theta_true, key=key, metrics=log)
    ev = [e for e in log.events if e["event"] == "chees"]
    assert ev, "chees probe table not logged"
    assert ev[-1]["n_leap"] in ev[-1]["candidates"]
    m = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    m_mh = np.asarray(inv_mh.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(m, m_mh, atol=0.2)

    with pytest.raises(ValueError, match="ChEES"):
        run_inversion(pipe2, likelihood="fom", sampler="hmc",
                      theta_true=theta_true, key=key)


def test_vi_tracks_mcmc_posterior(pipe):
    """run_vi_inversion on the fin (rom_nn likelihood, unimodal 1e-2
    regime): the full-rank ADVI mean tracks the Laplace-MH posterior mean
    and the fitted marginal stds are the right scale — the documented
    contract (docs/SAMPLERS.md: gradient-based fast first look, exact only
    for Gaussian posteriors)."""
    import dataclasses

    from bayesianinferencedl_tpu.api import run_vi_inversion

    cfg2 = dataclasses.replace(
        pipe.config,
        mcmc=dataclasses.replace(pipe.config.mcmc, noise_sigma=1e-2),
    )
    pipe2 = dataclasses.replace(pipe, config=cfg2)
    key = jax.random.PRNGKey(41)
    theta_true = pipe.prior.sample(key)
    res, _, data, wall = run_vi_inversion(
        pipe2, "rom_nn", n_steps=2000, n_mc=32, theta_true=theta_true,
        key=key,
    )
    inv = run_inversion(pipe2, likelihood="rom_nn", sampler="laplace_mh",
                        theta_true=theta_true, data=data, key=key)
    m_mcmc = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    sd_mcmc = np.asarray(inv.result.samples.std(axis=(0, 1)))
    sd_fit = np.sqrt(np.diag(np.asarray(res.theta_chol @ res.theta_chol.T)))
    np.testing.assert_allclose(np.asarray(res.theta_mean), m_mcmc, atol=0.15)
    assert np.all(sd_fit > 0.3 * sd_mcmc) and np.all(sd_fit < 3.0 * sd_mcmc)
    # ~2000 * 32 forward evals, not tens of thousands of chain steps
    assert res.n_forward == 2000 * 32


def test_eki_tracks_mcmc_posterior(pipe):
    """run_eki_inversion on the fin (rom_nn likelihood): the derivative-free
    ensemble mean tracks the Laplace-MH posterior mean in the unimodal
    regime at a fraction of the forward evaluations — the documented
    contract (docs/SAMPLERS.md: fast first look, not a certified
    posterior)."""
    from bayesianinferencedl_tpu.api import run_eki_inversion

    key = jax.random.PRNGKey(31)
    theta_true = pipe.prior.sample(key)
    res, _, data, wall = run_eki_inversion(
        pipe, "rom_nn", n_ensemble=512, theta_true=theta_true, key=key,
    )
    inv = run_inversion(pipe, likelihood="rom_nn", sampler="laplace_mh",
                        theta_true=theta_true, data=data, key=key)
    m_mcmc = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(np.asarray(res.mean), m_mcmc, atol=0.15)
    assert np.all(np.asarray(res.std) > 0)
    # ~15 batched sweeps, not tens of thousands of chain steps
    assert res.n_forward <= 512 * 51


def test_eki_warm_start_init(pipe):
    """init='eki' (run_inversion): chains start from the EKI ensemble —
    the init event is logged, the posterior matches the prior-init run
    (exactness is init-independent), and a bogus init name raises. The
    burn-in saving itself is measured at bench scale
    (artifacts/eki_init_r3.json)."""
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    key = jax.random.PRNGKey(37)
    theta_true = pipe.prior.sample(key)
    log = MetricsLogger()
    inv_e = run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                          init="eki", theta_true=theta_true, key=key,
                          metrics=log)
    assert any(e["event"] == "eki_init" for e in log.events)
    inv_p = run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                          init="prior", theta_true=theta_true, key=key)
    m_e = np.asarray(inv_e.result.samples.mean(axis=(0, 1)))
    m_p = np.asarray(inv_p.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(m_e, m_p, atol=0.2)
    # init='vi': the gradient-based warm start, same exactness contract —
    # compared in the UNIMODAL 1e-2 regime (a mode-seeking Gaussian fit
    # plus a local sampler can strand on one basin at 1e-3, exactly the
    # documented docs/SAMPLERS.md caveat shared with init='eki')
    import dataclasses as _dc

    cfg_uni = _dc.replace(
        pipe.config, mcmc=_dc.replace(pipe.config.mcmc, noise_sigma=1e-2)
    )
    pipe_uni = _dc.replace(pipe, config=cfg_uni)
    log_v = MetricsLogger()
    inv_v = run_inversion(pipe_uni, likelihood="rom_nn", sampler="pcn",
                          init="vi", theta_true=theta_true, key=key,
                          metrics=log_v)
    assert any(e["event"] == "vi_init" for e in log_v.events)
    inv_pu = run_inversion(pipe_uni, likelihood="rom_nn", sampler="pcn",
                           init="prior", theta_true=theta_true, key=key)
    m_v = np.asarray(inv_v.result.samples.mean(axis=(0, 1)))
    m_pu = np.asarray(inv_pu.result.samples.mean(axis=(0, 1)))
    np.testing.assert_allclose(m_v, m_pu, atol=0.2)
    with pytest.raises(ValueError, match="init"):
        run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                      init="bogus", theta_true=theta_true, key=key)
