"""Simulation-based calibration (infer/sbc.py): the rank-uniformity oracle
accepts an exact sampler on a linear-Gaussian problem and rejects a
mis-calibrated likelihood (SURVEY.md §4 posterior-quality oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.sbc import run_sbc, rank_uniformity_pvalue

D, M = 2, 3
A = jnp.asarray(np.random.default_rng(0).normal(size=(M, D)), jnp.float32)


def forward(theta_batch):  # (B, D) -> (B, M)
    return theta_batch @ A.T


def test_sbc_accepts_exact_sampler():
    """pCN on a linear-Gaussian posterior is exact -> ranks uniform."""
    prior = GaussianPrior.iid(D, sigma=1.0)
    res = run_sbc(
        forward, prior, 0.5, jax.random.PRNGKey(1),
        n_datasets=128, n_chains=31, n_steps=800, n_burn=500,
    )
    assert res.ranks.shape == (128, D)
    assert int(jnp.min(res.ranks)) >= 0 and int(jnp.max(res.ranks)) <= 31
    # every parameter's rank histogram is consistent with uniform
    assert float(jnp.min(res.p_values)) > 1e-3, np.asarray(res.p_values)
    # chains actually moved (guards against a trivially-stuck sampler
    # passing by never leaving the prior draw)
    assert float(jnp.mean(res.accept_rate)) > 0.05


@pytest.mark.parametrize("sampler,kw", [
    ("mala", {"step": 0.3}),
    ("hmc", {"step": 0.2, "n_leap": 4}),
])
def test_sbc_accepts_gradient_kernels(sampler, kw):
    """MALA's tamed-drift correction and HMC's leapfrog MH ratio are the
    parts a calibration bug would hide in — rank-uniformity certifies both
    on the exact linear-Gaussian posterior."""
    prior = GaussianPrior.iid(D, sigma=1.0)
    res = run_sbc(
        forward, prior, 0.5, jax.random.PRNGKey(3),
        n_datasets=128, n_chains=31, n_steps=500, n_burn=300,
        sampler=sampler, **kw,
    )
    assert float(jnp.min(res.p_values)) > 1e-3, (sampler, np.asarray(res.p_values))
    assert float(jnp.mean(res.accept_rate)) > 0.2


def test_sbc_rejects_miscalibrated_noise():
    """Simulate with 2.5x the assumed noise: the inferred posterior is too
    narrow for the true spread, ranks pile at the extremes, SBC rejects."""
    prior = GaussianPrior.iid(D, sigma=1.0)
    sigma = 0.5

    def run(key):
        # hand-rolled mis-simulation: reuse run_sbc's machinery by wrapping
        # the forward so the *simulated* data carries extra noise the
        # likelihood doesn't know about
        k1, k2 = jax.random.split(key)
        extra = 2.29 * sigma * jax.random.normal(k2, (128, M), jnp.float32)
        calls = [0]

        def fwd(theta):
            out = forward(theta)
            if calls[0] == 0:  # first call = dataset simulation in run_sbc
                calls[0] = 1
                return out + extra  # total sim noise = sqrt(1+2.29^2)*sigma = 2.5 sigma
            return out

        return run_sbc(
            fwd, prior, sigma, k1,
            n_datasets=128, n_chains=31, n_steps=800, n_burn=500,
        )

    res = run(jax.random.PRNGKey(2))
    assert float(jnp.max(res.p_values)) < 1e-3, np.asarray(res.p_values)


def test_rank_uniformity_pvalue_validates_bins():
    with pytest.raises(ValueError):
        rank_uniformity_pvalue(np.zeros((10, 2), np.int32), n_draws=31, n_bins=7)
    # exact uniform counts -> p = 1
    ranks = np.tile(np.arange(32, dtype=np.int32)[:, None], (1, 2))
    p, counts = rank_uniformity_pvalue(ranks, n_draws=31, n_bins=8)
    assert np.all(counts == 4)
    assert np.all(p == 1.0)


def test_sbc_validates_chain_bin_compat():
    prior = GaussianPrior.iid(D, sigma=1.0)
    with pytest.raises(ValueError):
        run_sbc(forward, prior, 0.5, jax.random.PRNGKey(0),
                n_datasets=8, n_chains=30, n_bins=8)


def _sign_ambiguous_forward(th):  # (B, 1) -> (B, 2)
    """theta^2 leaves the sign unidentified (a high misfit barrier at 0);
    the weak 0.1*theta row identifies it, so the posterior is bimodal with
    strongly unequal weights (wrong-sign weight ~ exp(-8 theta*^2))."""
    return jnp.concatenate([th**2, 0.1 * th], axis=-1)


def test_sbc_pt_kernel_bimodal():
    """pt_pcn (adaptive ladder + replica exchange) is calibrated on a
    bimodal posterior: the swap rule and post-burn ladder freeze preserve
    the exact cold-level target, which rank-uniformity certifies."""
    prior = GaussianPrior.iid(1, sigma=1.0)
    res = run_sbc(
        _sign_ambiguous_forward, prior, 0.05, jax.random.PRNGKey(0),
        n_datasets=192, n_chains=31, n_steps=800, n_burn=500,
        sampler="pt_pcn", n_temps=5, lambda_min=0.02,
    )
    assert float(jnp.min(res.p_values)) > 1e-3, np.asarray(res.p_values)
    # cold-level acceptance is the adapted-pCN one
    assert float(jnp.mean(res.accept_rate)) > 0.1


def test_sbc_data_averaged_blind_spot():
    """Pin the documented SBC limitation (infer/sbc.py docstring): a
    single-temperature ensemble whose chains STRAND in their init basin
    still passes, because prior-initialized stranding inherits exactly the
    prior's basin occupancy — rank marginals average over the prior and a
    q/(1-q) occupancy split yields q*U[(1-q)L, L] + (1-q)*U[0, (1-q)L] =
    uniform for ANY q. SBC certifies data-AVERAGED correctness; per-dataset
    multimodal convergence still needs split-R-hat / tempering."""
    from bayesianinferencedl_tpu.infer.pcn import run_pcn

    prior = GaussianPrior.iid(1, sigma=1.0)

    # (a) chains really do strand: final basin == init basin almost always
    th_star = 1.0
    y = jnp.array([th_star**2, 0.1 * th_star])

    def misfit(th):
        r = _sign_ambiguous_forward(th) - y
        return jnp.asarray(0.5 / 0.05**2, th.dtype) * jnp.sum(r * r, axis=-1)

    theta0 = prior.sample(jax.random.PRNGKey(1), (512,))
    pres = run_pcn(misfit, prior, theta0, jax.random.PRNGKey(2),
                   n_steps=800, n_burn=500, beta=0.25, batched=True)
    fin = pres.samples[-1][:, 0]
    flip = float(jnp.mean((fin < 0) != (theta0[:, 0] < 0)))
    assert flip < 0.2, flip  # stranded: almost no basin crossings
    # ... even though the posterior puts ~exp(-8) mass on the wrong sign,
    # so ~half of these chains sample the WRONG basin for this dataset.

    # (b) yet SBC does not reject the stranded ensemble
    res = run_sbc(
        _sign_ambiguous_forward, prior, 0.05, jax.random.PRNGKey(0),
        n_datasets=192, n_chains=31, n_steps=800, n_burn=500, sampler="pcn",
    )
    assert float(jnp.min(res.p_values)) > 0.01, np.asarray(res.p_values)
