"""Hamiltonian Monte Carlo (infer/hmc.py): exactness, adaptation, and the
ESS-per-gradient advantage over MALA that justifies the n_leap cost.

SURVEY.md §4 posterior-quality oracles + A.5 gradient machinery. The clip
inside the leapfrog force (mala._tamed) must leave the stationary law exact
— the MH test uses the TRUE Hamiltonian, so any reversible volume-preserving
integrator is corrected exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior
from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk
from bayesianinferencedl_tpu.infer.hmc import run_hmc, run_hmc_segmented
from bayesianinferencedl_tpu.infer.mala import run_mala
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def _setup(d=16, m=24, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    return prior, misfit, mu, Cpost


def test_hmc_matches_analytic_posterior():
    prior, misfit, mu, Cpost = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_hmc(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=3000, n_burn=500, step=0.1, n_leap=8,
    )
    s = np.asarray(res.samples).reshape(-1, mu.shape[0])
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), Cpost, atol=0.06)
    # Robbins-Monro lands on the HMC-optimal acceptance
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.5 < acc < 0.8


def test_hmc_beats_mala_per_gradient():
    """The reason n_leap passes per step are worth paying: at an EQUAL
    gradient budget (L x more MALA steps), HMC's multi-step trajectories
    decorrelate far better (measured ~9x min bulk ESS at d=16)."""
    prior, misfit, mu, Cpost = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    L = 8
    res_h = run_hmc(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=2000, n_burn=400, step=0.1, n_leap=L,
    )
    res_m = run_mala(
        misfit, prior, theta0, jax.random.PRNGKey(2),
        n_steps=2000 * L, n_burn=400 * L, step=0.1,
    )
    e_h = float(jnp.min(ess_bulk(res_h.samples)))
    e_m = float(jnp.min(ess_bulk(res_m.samples)))
    assert e_h > 3.0 * e_m, (e_h, e_m)


def test_hmc_laplace_frame_and_segmented():
    """ref=(mean, chol) preconditioning and the watchdog-safe segmented
    driver agree with the analytic posterior; adapted step sizes carry."""
    prior, misfit, mu, Cpost = _setup(d=8, m=12)
    theta0 = prior.sample(jax.random.PRNGKey(3), (64,))
    ref = (jnp.asarray(mu), jnp.asarray(np.linalg.cholesky(Cpost)))
    res = run_hmc_segmented(
        misfit, prior, theta0, jax.random.PRNGKey(4),
        n_steps=2000, n_burn=500, step=0.5, n_leap=4, segment=256, ref=ref,
    )
    s = np.asarray(res.samples).reshape(-1, 8)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), Cpost, atol=0.06)
    assert res.samples.shape[0] == 1500


def test_sharded_hmc_matches_stats():
    from bayesianinferencedl_tpu.parallel import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_hmc

    prior, misfit, mu, Cpost = _setup(d=4, m=6)
    mesh = device_mesh()
    theta0 = prior.sample(jax.random.PRNGKey(5), (64,))
    res = sharded_hmc(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(6),
        n_steps=2500, n_burn=500, step=0.1, n_leap=4,
    )
    assert res.samples.shape == (2000, 64, 4)
    emp = np.asarray(res.samples).reshape(-1, 4).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.06)
    s0 = np.asarray(res.samples[:, 0, 0])
    s8 = np.asarray(res.samples[:, 8, 0])
    assert np.abs(np.corrcoef(s0, s8)[0, 1]) < 0.5


def test_run_inversion_hmc_end_to_end():
    """sampler='hmc' and 'hmc_lap' through the fin pipeline (rom_nn
    gradients are matmul+MLP autodiff), plus the mesh route."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )
    from bayesianinferencedl_tpu.parallel import device_mesh

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-8, cg_maxiter=1000),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=200, n_burn=80, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="hmc", hmc_leap=4,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64)
    inv = run_inversion(pipe)
    assert inv.result.samples.shape == (120, 16, 5)
    assert bool(jnp.isfinite(inv.result.samples).all())
    assert 0.3 < float(jnp.mean(inv.result.accept_rate)) <= 1.0

    inv_lap = run_inversion(pipe, sampler="hmc_lap")
    assert inv_lap.result.samples.shape == (120, 16, 5)
    assert bool(jnp.isfinite(inv_lap.result.samples).all())

    inv_sh = run_inversion(pipe, mesh=device_mesh())
    assert inv_sh.result.samples.shape == (120, 16, 5)
    assert bool(jnp.isfinite(inv_sh.result.samples).all())


def test_hmc_chees_auto_trajectory():
    """run_hmc_chees picks the trajectory length by the cross-chain ChEES
    criterion: on an anisotropic linear-Gaussian posterior (condition ~30)
    the probe table has an interior maximum (single steps waste the
    Hamiltonian flow, over-long trajectories U-turn), and the production
    run at the winner matches the analytic posterior."""
    from bayesianinferencedl_tpu.infer.hmc import run_hmc_chees

    d = 8
    rng = np.random.default_rng(0)
    A = jnp.asarray(
        rng.standard_normal((d, d)) * np.geomspace(1.0, 30.0, d)[None, :],
        jnp.float64,
    )
    sigma = 0.5
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    data = jnp.asarray(rng.standard_normal(d))
    Cpost = np.linalg.inv(np.asarray(A.T @ A) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(A.T @ data) / sigma**2

    def misfit(th):  # batched
        r = th @ A.T - data
        return 0.5 / sigma**2 * jnp.sum(r * r, axis=-1)

    theta0 = prior.sample(jax.random.PRNGKey(1), (2048,))
    res, info = run_hmc_chees(
        misfit, prior, theta0, jax.random.PRNGKey(2),
        n_steps=700, n_burn=300, step=0.1, batched=True,
    )
    # the winner is interior: neither a single step nor the longest probe
    assert 1 < info["n_leap"] < info["candidates"][-1], info
    # and per-gradient ChEES at the winner beats both endpoints
    cpg = info["chees_per_grad"]
    assert cpg[info["candidates"].index(info["n_leap"])] >= max(cpg[0], cpg[-1])
    s = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(s.std(0), np.sqrt(np.diag(Cpost)), atol=0.05)
    assert float(jnp.mean(res.accept_rate)) > 0.4
