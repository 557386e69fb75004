"""Unknown observation noise: the sigma-marginalized likelihood
(infer/pcn.py marginal_misfit — conjugate InvGamma(a0, b0) prior on
sigma^2 integrated out analytically), the conjugate sigma posterior
(utils/ppc.py noise_posterior), and the scale-free residual-shape PPC
that replaces the (powerless under unknown noise) chi-square check.

Oracles: direct numerical quadrature over sigma validates the closed-form
potential including its constant; a 1-D quadrature posterior validates
pCN sampling under the marginal potential; a conjugate linear model with
many noise dof validates sigma recovery. SURVEY.md A.5 (likelihood) and
§4 (posterior-quality oracles)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.infer import GaussianPrior, run_pcn
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, marginal_misfit
from bayesianinferencedl_tpu.utils.ppc import (
    noise_posterior,
    ppc_shape_pvalue,
)


def test_marginal_misfit_matches_sigma_quadrature():
    """The closed form equals -log integral N(d; G, sigma^2 I)
    InvGamma(sigma^2; a0, b0) dsigma^2 by direct quadrature, constant
    included."""
    rng = np.random.default_rng(0)
    m, a0, b0 = 7, 2.0, 0.09
    data = jnp.asarray(rng.standard_normal(m))
    fwd = lambda t: jnp.broadcast_to(t[0], (m,)) * jnp.linspace(0.5, 1.5, m)
    phi = marginal_misfit(fwd, data, a0=a0, b0=b0)
    theta = jnp.asarray([0.7])

    # quadrature over v = sigma^2 on a log grid
    r = np.asarray(fwd(theta) - data)
    S = float(np.sum(r * r))
    v = np.logspace(-6, 4, 200_001)
    lik = (2 * np.pi * v) ** (-m / 2) * np.exp(-S / (2 * v))
    prior = b0**a0 / math.gamma(a0) * v ** (-a0 - 1) * np.exp(-b0 / v)
    integral = np.trapezoid(lik * prior, v)
    np.testing.assert_allclose(float(phi(theta)), -np.log(integral), rtol=1e-6)


def test_marginal_misfit_bounded_at_interpolation():
    """An exact interpolant (S = 0) leaves Phi FINITE — the proper b0 > 0
    prior removes the Jeffreys-limit impropriety that the fin's m = d
    observation count would otherwise trigger."""
    data = jnp.asarray(np.linspace(0.1, 1.0, 5))
    phi = marginal_misfit(lambda t: data * t[0], data, a0=2.0, b0=1e-6)
    val = float(phi(jnp.asarray([1.0])))  # exact fit: S = 0
    assert np.isfinite(val)
    expected = (2.0 + 2.5) * math.log(1e-6) + (
        2.5 * math.log(2 * math.pi) - 2.0 * math.log(1e-6)
        + math.lgamma(2.0) - math.lgamma(4.5)
    )
    np.testing.assert_allclose(val, expected, rtol=1e-6)
    with pytest.raises(ValueError):
        marginal_misfit(lambda t: t, data, a0=2.0, b0=0.0)


def test_pcn_marginal_matches_quadrature_posterior():
    """pCN on the marginal potential reproduces the 1-D quadrature
    posterior: theta ~ N(0,1) prior, G(theta) = h * theta, unknown noise."""
    rng = np.random.default_rng(3)
    m, sigma_true = 24, 0.35
    h = jnp.asarray(rng.uniform(0.5, 1.5, m))
    theta_star = 0.8
    data = jnp.asarray(theta_star * np.asarray(h) + sigma_true * rng.standard_normal(m))
    a0, b0 = 2.0, 0.25**2
    phi = marginal_misfit(lambda t: h * t[0], data, a0=a0, b0=b0)

    # quadrature oracle over theta (vmapped phi on the grid)
    tg = np.linspace(-4, 4, 8001)
    phi_grid = jax.vmap(lambda t: phi(jnp.asarray([t])))(jnp.asarray(tg))
    lp = -np.asarray(phi_grid) - 0.5 * tg**2
    w = np.exp(lp - lp.max())
    w /= np.trapezoid(w, tg)
    mu_q = np.trapezoid(tg * w, tg)
    var_q = np.trapezoid((tg - mu_q) ** 2 * w, tg)

    prior = GaussianPrior.iid(1, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pcn(
        phi, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4,
    )
    s = np.asarray(res.samples).reshape(-1)
    assert abs(s.mean() - mu_q) < 0.04, (s.mean(), mu_q)
    assert abs(s.std() - math.sqrt(var_q)) < 0.04, (s.std(), math.sqrt(var_q))


def test_gradients_of_marginal_misfit():
    """Gradient samplers need d(Phi)/d(theta); check autodiff against the
    closed form (a0 + m/2) * 2 r^T J / (2 b0 + S)."""
    rng = np.random.default_rng(5)
    m, d = 9, 3
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    a0, b0 = 2.0, 0.04
    phi = marginal_misfit(lambda t: H @ t, data, a0=a0, b0=b0)
    theta = jnp.asarray(rng.standard_normal(d))
    g = jax.grad(phi)(theta)
    r = np.asarray(H @ theta - data)
    S = float(r @ r)
    g_exact = (a0 + m / 2) * 2.0 * (r @ np.asarray(H)) / (2 * b0 + S)
    np.testing.assert_allclose(np.asarray(g), g_exact, rtol=1e-10)


def test_noise_posterior_recovers_sigma():
    """With many noise dof (m >> d) the sigma marginal concentrates on the
    generating noise level."""
    rng = np.random.default_rng(7)
    m, sigma_true = 80, 0.3
    h = jnp.asarray(rng.uniform(0.5, 1.5, m))
    data = jnp.asarray(0.6 * np.asarray(h) + sigma_true * rng.standard_normal(m))
    a0, b0 = 2.0, 0.25  # prior scale DELIBERATELY off the truth (0.5 vs 0.3)
    phi = marginal_misfit(lambda t: h * t[0], data, a0=a0, b0=b0)
    prior = GaussianPrior.iid(1, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pcn(
        phi, prior, theta0, jax.random.PRNGKey(3),
        n_steps=4000, n_burn=1000, beta=0.4,
    )
    fwd_b = lambda ts: ts[:, :1] * h[None, :]
    sigma, stats = noise_posterior(
        fwd_b, res.samples, data, jax.random.PRNGKey(4), a0=a0, b0=b0
    )
    assert stats["sigma_q05"] < sigma_true < stats["sigma_q95"], stats
    assert abs(stats["sigma_mean"] - sigma_true) < 0.12 * sigma_true + 0.05, stats
    assert sigma.shape[0] == stats["n_draws"]


def test_shape_ppc_flags_structured_error_only():
    """The scale-free residual-shape PPC: interior p for iid residuals of
    ANY magnitude (the absorbed-by-sigma case chi-square can't see past),
    small p when one observable is systematically off (the ROM-bias
    signature)."""
    rng = np.random.default_rng(11)
    m = 12
    samples = jnp.asarray(rng.standard_normal((40, 8, 2)))  # (T, C, d) dummy

    # healthy: residuals iid of LARGE magnitude (sigma unknown => fine)
    base = jnp.asarray(rng.standard_normal(m)) * 5.0
    fwd_healthy = lambda ts: jnp.zeros((ts.shape[0], m), ts.dtype)
    p_ok = ppc_shape_pvalue(fwd_healthy, samples, base, jax.random.PRNGKey(0))
    assert 0.02 < p_ok["p_value"] < 0.98, p_ok

    # broken: one observable 30 sigma off, everything else tiny
    data_bad = jnp.zeros(m).at[3].set(30.0) + jnp.asarray(rng.standard_normal(m))
    p_bad = ppc_shape_pvalue(fwd_healthy, samples, data_bad, jax.random.PRNGKey(1))
    assert p_bad["p_value"] < 0.01, p_bad
    assert p_bad["statistic"].startswith("max-studentized")


@pytest.fixture(scope="module")
def pipe():
    from bayesianinferencedl_tpu.api import build_pipeline
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=64, basis_size=24),
        surrogate=SurrogateConfig(hidden=(32, 32), n_train=256, epochs=100, batch_size=64),
        mcmc=MCMCConfig(
            n_chains=32, n_steps=1500, n_burn=500, beta=0.3,
            noise_sigma=1e-2, infer_noise=True,
        ),
    )
    return build_pipeline(cfg, dtype=jnp.float64)


def test_run_inversion_infer_noise_e2e(pipe):
    """End-to-end on the fin: run_inversion with infer_noise reports the
    sigma posterior, uses the shape PPC, and still recovers the truth.
    m = n_obs = d = 5 here, so the sigma posterior is wide and
    prior-influenced — the assertion brackets, not pins."""
    from bayesianinferencedl_tpu.api import run_inversion

    inv = run_inversion(pipe, likelihood="rom_nn", key=jax.random.PRNGKey(11))
    post_mean = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    theta_true = np.asarray(inv.theta_true)
    assert np.abs(post_mean - theta_true).max() < 0.4, (post_mean, theta_true)
    sp = inv.noise_sigma_post
    assert sp is not None
    assert sp["sigma_q05"] < sp["sigma_q50"] < sp["sigma_q95"]
    # generating noise 1e-2; five observations only => wide but sane
    assert sp["sigma_q05"] < 5e-2, sp
    assert np.isfinite(sp["sigma_mean"]) and sp["sigma_mean"] > 0
    assert inv.ppc is not None and "statistic" in inv.ppc
    assert 0.0 <= inv.ppc["p_value"] <= 1.0


def test_full_field_infer_noise():
    """The sigma-marginal potential extends to the full-field pipeline
    (api_full_field.run_full_field_inversion infer_noise=True) — the
    m << n_features regime where interpolants always exist, so the proper
    noise prior carries the whole posterior."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline,
        run_full_field_inversion,
    )

    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=16, n_snapshots=32,
        basis_size=6, k_basis_size=24, n_train=128, surrogate_hidden=(32, 32),
        surrogate_steps=800, cg_tol=1e-11, cg_maxiter=3000, use_pallas=False,
    )
    res, z_true, data, ess, r, wall = run_full_field_inversion(
        pipe, likelihood="rom_nn", n_chains=16, n_steps=800, n_burn=400,
        noise_sigma=1e-2, infer_noise=True, key=jax.random.PRNGKey(4),
    )
    assert np.isfinite(np.asarray(res.samples)).all()
    z_post = res.samples.mean(axis=(0, 1))
    fwd = pipe.forward_fn("rom_nn")
    fit_post = float(jnp.linalg.norm(fwd(z_post) - data))
    fit_prior = float(jnp.linalg.norm(fwd(jnp.zeros_like(z_post)) - data))
    assert fit_post < fit_prior
    sigma, stats = noise_posterior(
        pipe.batched_forward_fn("rom_nn"), res.samples, data,
        jax.random.PRNGKey(7), a0=2.0, b0=1e-4,
    )
    assert stats["sigma_q05"] > 0 and np.isfinite(stats["sigma_mean"])


def test_infer_noise_pt_evidence_and_mala(pipe):
    """The marginal potential rides the tempered and gradient samplers
    unchanged: pt_pcn yields a finite stepping-stone evidence, MALA
    accepts and moves."""
    import dataclasses

    from bayesianinferencedl_tpu.api import run_inversion

    cfg_pt = dataclasses.replace(
        pipe.config,
        mcmc=dataclasses.replace(
            pipe.config.mcmc, sampler="pt_pcn", n_temps=3, n_steps=800,
            n_burn=300, n_chains=16,
        ),
    )
    inv_pt = run_inversion(
        dataclasses.replace(pipe, config=cfg_pt), key=jax.random.PRNGKey(5)
    )
    assert inv_pt.log_evidence is not None and np.isfinite(inv_pt.log_evidence)
    assert inv_pt.noise_sigma_post is not None

    cfg_ml = dataclasses.replace(
        pipe.config,
        mcmc=dataclasses.replace(
            pipe.config.mcmc, sampler="mala", n_steps=600, n_burn=200,
            n_chains=16, mala_step=0.3,
        ),
    )
    inv_ml = run_inversion(
        dataclasses.replace(pipe, config=cfg_ml), key=jax.random.PRNGKey(6)
    )
    acc = float(jnp.mean(inv_ml.result.accept_rate))
    assert 0.05 < acc <= 1.0, acc
    assert np.isfinite(np.asarray(inv_ml.result.samples)).all()
