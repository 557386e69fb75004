"""Posterior predictive checks (utils/ppc.py): calibration on exact
posteriors, and sensitivity to the two classic misspecifications (biased
forward model, wrong noise level). SURVEY.md §4 posterior-quality oracles
extended to model criticism."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.utils.ppc import ppc_chi2_pvalue, thin_samples


def _exact_posterior_samples(H, data, sigma, n, key):
    d = H.shape[1]
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    L = np.linalg.cholesky(Cpost)
    z = jax.random.normal(key, (n, d), jnp.float64)
    th = jnp.asarray(mu) + z @ jnp.asarray(L).T
    # shape into the (T, C, d) kept-chains convention
    return th.reshape(n // 8, 8, d)


def _setup(seed=0, d=4, m=6, sigma=0.3):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    theta_true = jnp.asarray(rng.standard_normal(d) * 0.5)
    data = H @ theta_true + sigma * jnp.asarray(rng.standard_normal(m))
    return H, theta_true, data, sigma


def test_ppc_interior_for_well_specified_model():
    H, theta_true, data, sigma = _setup()
    samples = _exact_posterior_samples(H, data, sigma, 4096, jax.random.PRNGKey(1))
    fwd_b = lambda th: th @ H.T
    out = ppc_chi2_pvalue(fwd_b, samples, data, sigma, jax.random.PRNGKey(2))
    assert 0.05 < out["p_value"] < 0.95, out
    # both discrepancies near the chi-square mean (n_obs) scale
    assert out["t_rep_mean"] < 3 * out["n_obs"]


def test_ppc_flags_biased_forward_model():
    """The inversion was run with a forward model that systematically
    disagrees with the data-generating one: replicated data can't reach
    the observed misfit -> p collapses toward 0."""
    H, theta_true, data, sigma = _setup()
    bias = jnp.asarray([2.0, -1.5, 1.0, 2.5, -2.0, 1.5], jnp.float64)
    fwd_biased = lambda th: th @ H.T + bias
    # posterior computed UNDER the biased model (what a user would have)
    data_eff = data - bias
    samples = _exact_posterior_samples(H, data_eff, sigma, 4096, jax.random.PRNGKey(1))
    # ...but the observed data still carries the truth: use the biased
    # forward against the real data with an inflated residual
    out = ppc_chi2_pvalue(
        fwd_biased, samples, data + bias, sigma, jax.random.PRNGKey(2)
    )
    assert out["p_value"] < 0.01, out


def test_ppc_flags_overstated_noise():
    """sigma assumed 5x larger than reality: replicated data overshoots the
    observed misfit almost surely -> p near 1."""
    H, theta_true, data, sigma = _setup()
    samples = _exact_posterior_samples(H, data, sigma, 4096, jax.random.PRNGKey(1))
    fwd_b = lambda th: th @ H.T
    out = ppc_chi2_pvalue(fwd_b, samples, data, 5 * sigma, jax.random.PRNGKey(2))
    assert out["p_value"] > 0.95, out


def test_thin_samples_shape_and_determinism():
    s = jnp.arange(2 * 3 * 4, dtype=jnp.float64).reshape(2, 3, 4)
    t1 = thin_samples(s, 5)
    t2 = thin_samples(s, 5)
    assert t1.shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # n_draws larger than available draws: capped, not padded
    assert thin_samples(s, 100).shape == (6, 4)


def test_run_inversion_reports_ppc():
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-8, cg_maxiter=1000),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=1500, n_burn=500, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="pcn",
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64)
    inv = run_inversion(pipe)
    assert inv.ppc is not None
    # synthetic data from the same model family: check must not scream
    assert 0.01 < inv.ppc["p_value"] < 0.99, inv.ppc
    assert inv.ppc["n_obs"] == 5
