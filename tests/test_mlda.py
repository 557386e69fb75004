"""Multilevel delayed acceptance (infer/mlda.py): exactness + accounting.

SURVEY.md §4 'Posterior quality' row, MLDA variant: the nested-screen chain's
stationary law must be the FINEST posterior even when BOTH surrogate rungs
are deliberately (and differently) biased — the recursive Christen-Fox
correction removes every rung's bias (Appendix C extended to a hierarchy)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, run_pcn
from bayesianinferencedl_tpu.infer.mlda import (
    build_mlda_kernel,
    mlda_evals_per_step,
    run_mlda,
    run_mlda_segmented,
)
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def _setup(d=3, m=4, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2
    misfit_f = gaussian_misfit(lambda t: H @ t, data, sigma)
    b1 = jnp.asarray([0.4, -0.3, 0.2, 0.1], jnp.float64)
    b0 = jnp.asarray([0.7, 0.5, -0.6, 0.3], jnp.float64)
    misfit_c1 = gaussian_misfit(lambda t: H @ t + b1, data, sigma)
    misfit_c0 = gaussian_misfit(lambda t: H @ t + b0, data, sigma)
    return prior, mu, Cpost, misfit_f, misfit_c1, misfit_c0


def test_mlda_corrects_two_biased_rungs_to_fine_posterior():
    prior, mu, Cpost, mf, mc1, mc0 = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mlda(
        (mc0, mc1, mf), prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, subchains=(4, 3),
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.08)
    # the base rung's posterior is genuinely elsewhere
    res_c = run_pcn(
        mc0, prior, theta0, jax.random.PRNGKey(2), n_steps=4000, n_burn=1000, beta=0.4
    )
    mu_c = np.asarray(res_c.samples).reshape(-1, 3).mean(0)
    assert np.linalg.norm(mu_c - mu) > 0.15
    # rate stack: base first, top last; corrections cheap but not vacuous
    rates = np.asarray(res.level_rates).mean(axis=1)
    assert rates.shape == (3,)
    assert np.all((rates > 0.05) & (rates <= 1.0))
    out_acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.2 < out_acc < 0.999


def test_mlda_mala_base_same_posterior():
    """inner='mala': gradient-informed base subchains, same invariant law
    (the S-fold MALA kernel is reversible w.r.t. the base rung posterior,
    so the recursion argument is unchanged)."""
    prior, mu, Cpost, mf, mc1, mc0 = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mlda(
        (mc0, mc1, mf), prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, subchains=(4, 3), inner="mala",
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.09)


def test_mlda_two_levels_agrees_with_analytic():
    """Degenerate ladder (one rung) is plain DA — must still hit the
    analytic posterior through the MLKernel recursion path."""
    prior, mu, Cpost, mf, mc1, _ = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mlda(
        (mc1, mf), prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, subchains=(4,),
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.08)
    assert res.evals_per_step == (4, 1)


def test_mlda_segmented_matches_whole_run_distribution():
    """Segmented dispatch (watchdog-safe) must agree in distribution and
    keep rate accounting over the WHOLE post-burn run."""
    prior, mu, Cpost, mf, mc1, mc0 = _setup()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_mlda_segmented(
        (mc0, mc1, mf), prior, theta0, jax.random.PRNGKey(1),
        n_steps=4000, n_burn=1000, beta=0.4, subchains=(4, 3), segment=640,
    )
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.08)
    assert res.samples.shape[0] == 3000
    assert np.asarray(res.level_rates).shape[0] == 3
    assert np.all(np.asarray(res.level_rates) <= 1.0 + 1e-9)
    assert np.all(np.asarray(res.accept_rate) <= 1.0 + 1e-9)


def test_mlda_eval_accounting():
    # level l: prod(subchains[l:]) base/correction evals + one sub-kernel
    # re-init eval per level-(l+2) step (docstring derivation)
    assert mlda_evals_per_step((4,)) == (4, 1)
    assert mlda_evals_per_step((4, 3)) == (4 * 3 + 1, 3, 1)
    assert mlda_evals_per_step((5, 4, 3)) == (5 * 4 * 3 + 3, 4 * 3 + 1, 3, 1)


def test_sharded_mlda_matches_stats():
    """MLDA chains shard like DA chains (independent); the sharded run must
    hit the analytic FINE posterior despite two biased rungs."""
    from bayesianinferencedl_tpu.parallel import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_mlda_segmented

    prior, mu, Cpost, mf, mc1, mc0 = _setup()
    mesh = device_mesh()
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = sharded_mlda_segmented(
        mesh, (mc0, mc1, mf), prior, theta0, jax.random.PRNGKey(1),
        n_steps=3000, n_burn=500, beta=0.4, subchains=(4, 3), segment=512,
    )
    assert res.samples.shape == (2500, 64, 3)
    emp = np.asarray(res.samples).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.08)
    # different shards decorrelated
    s0 = np.asarray(res.samples[:, 0, 0])
    s8 = np.asarray(res.samples[:, 8, 0])
    assert np.abs(np.corrcoef(s0, s8)[0, 1]) < 0.5
    assert np.asarray(res.level_rates).shape[0] == 3


def test_run_inversion_mlda_pcn_end_to_end():
    """sampler='mlda_pcn' on a tiny fin pipeline: base rung = rom_nn
    surrogate, mid rung = resolution-1 FOM, fine = the pipeline's FOM —
    finite samples, healthy per-rung rates, and the likelihood guard."""
    import pytest

    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=2),
        fem=FEMConfig(biot=0.1, cg_tol=1e-8, cg_maxiter=1000),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=40, n_burn=16, noise_sigma=1e-2,
            likelihood="fom", sampler="mlda_pcn", subchain=3,
            mlda_resolution=1, mlda_subchain=2,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64)
    inv = run_inversion(pipe)
    assert inv.result.samples.shape == (24, 16, 5)
    assert bool(jnp.isfinite(inv.result.samples).all())
    rates = np.asarray(inv.result.level_rates)
    assert rates.shape[0] == 3
    assert np.all((rates >= 0.0) & (rates <= 1.0 + 1e-9))
    assert inv.result.evals_per_step == (3 * 2 + 1, 2, 1)

    with pytest.raises(ValueError, match="likelihood='fom'"):
        run_inversion(pipe, likelihood="rom_nn")

    from bayesianinferencedl_tpu.parallel import device_mesh

    inv_sh = run_inversion(pipe, mesh=device_mesh())
    assert inv_sh.result.samples.shape == (24, 16, 5)
    assert bool(jnp.isfinite(inv_sh.result.samples).all())


def test_mlda_kernel_validation():
    prior = GaussianPrior.iid(2, mean=0.0, sigma=1.0, dtype=jnp.float64)
    m = gaussian_misfit(lambda t: t, jnp.zeros(2, jnp.float64), 1.0)
    try:
        build_mlda_kernel((m,), prior, ())
        raise AssertionError("expected ValueError for single-level ladder")
    except ValueError:
        pass
    try:
        build_mlda_kernel((m, m, m), prior, (4,))
        raise AssertionError("expected ValueError for subchain count mismatch")
    except ValueError:
        pass
