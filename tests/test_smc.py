"""Adaptive tempered SMC (infer/smc.py): analytic, quadrature, and
cross-estimator oracles.

Gates: (1) on a linear-Gaussian target the unbiased SMC evidence matches
the closed form and the terminal particles match the analytic posterior
moments; (2) on a bimodal target — where one pCN population would strand
in the initialization basin — the resampled population recovers the
quadrature mode mass AND the evidence matches the dense-quadrature oracle;
(3) SMC and the PT stepping-stone estimator (infer/evidence.py) agree on
the same problem: two independent estimators of the same integral
(SURVEY.md §4 posterior-quality oracles; the cross-check the docstring of
infer/smc.py promises).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.evidence import log_evidence_from_pt
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.smc import run_smc
from bayesianinferencedl_tpu.infer.tempering import run_pt_pcn


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
    # analytic posterior N(mu, P): P^-1 = I/sp^2 + H^T H / sigma^2
    Pinv = np.eye(d) / sp**2 + np.asarray(H.T @ H) / sigma**2
    P = np.linalg.inv(Pinv)
    mu = P @ np.asarray(H.T @ data) / sigma**2
    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    return misfit, prior, float(log_z), mu, P


def test_smc_linear_gaussian_evidence_and_moments():
    misfit, prior, log_z, mu, P = _linear_gaussian()
    res = run_smc(
        misfit, prior, jax.random.PRNGKey(0), n_particles=8192, n_mutations=5,
    )
    assert int(res.n_stages) < 64  # schedule reached lambda = 1
    np.testing.assert_allclose(float(res.lambdas[res.n_stages - 1]), 1.0)
    assert abs(float(res.log_evidence) - log_z) < 0.06, (float(res.log_evidence), log_z)
    # terminal particles are an equally-weighted posterior sample
    th = np.asarray(res.particles)
    np.testing.assert_allclose(th.mean(0), mu, atol=4 * np.sqrt(np.diag(P).max() / len(th)) + 0.02)
    np.testing.assert_allclose(np.cov(th.T), P, atol=0.05)
    # the adaptive schedule kept the ESS target per stage
    n = int(res.n_stages)
    assert (np.asarray(res.ess_frac[:n]) > 0.3).all()


def test_smc_batched_matches_vmapped():
    misfit, prior, *_ = _linear_gaussian()

    def misfit_b(T):  # whole-population misfit, like the fused solvers
        return jax.vmap(misfit)(T)

    a = run_smc(misfit, prior, jax.random.PRNGKey(3), n_particles=512, n_mutations=2)
    b = run_smc(misfit_b, prior, jax.random.PRNGKey(3), n_particles=512, n_mutations=2, batched=True)
    np.testing.assert_allclose(np.asarray(a.particles), np.asarray(b.particles))
    np.testing.assert_allclose(float(a.log_evidence), float(b.log_evidence))


def _bimodal():
    """1-D unequal bimodal misfit with dense-quadrature oracles."""
    a, s, depth = 2.0, 0.15, 1.2

    def misfit(t):
        q1 = jnp.sum((t - a) ** 2, -1) / (2 * s**2)
        q2 = jnp.sum((t + a) ** 2, -1) / (2 * s**2) + depth
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    x = np.linspace(-8, 8, 200_001)
    dx = x[1] - x[0]
    phi = np.asarray(misfit(jnp.asarray(x)[:, None]))
    mu0 = np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi)
    post = np.exp(-phi) * mu0
    log_z = float(np.log(np.sum(post) * dx))
    mass_right = float(np.sum(post[x > 0]) / np.sum(post))
    return misfit, prior, log_z, mass_right


def test_smc_bimodal_mass_and_evidence():
    misfit, prior, log_z, mass_right = _bimodal()
    res = run_smc(
        misfit, prior, jax.random.PRNGKey(1), n_particles=16384, n_mutations=5,
    )
    assert int(res.n_stages) < 64
    s = np.asarray(res.particles)[:, 0]
    est_mass = float((s > 0).mean())
    # resampling splits mass between basins without any mode-hopping kernel
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(float(res.log_evidence) - log_z) < 0.1, (float(res.log_evidence), log_z)


def test_smc_and_pt_stepping_stone_agree():
    """Two independent evidence estimators, one integral (the cross-check
    infer/smc.py exists to provide)."""
    misfit, prior, log_z, _ = _bimodal()
    smc = run_smc(misfit, prior, jax.random.PRNGKey(2), n_particles=8192)
    theta0 = prior.sample(jax.random.PRNGKey(4), (64,))
    pt = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(5),
        n_steps=8000, n_burn=3000, beta=0.4, n_temps=6, lambda_min=0.01,
        adapt_ladder=True,
    )
    est = log_evidence_from_pt(pt, misfit, prior, jax.random.PRNGKey(6), batched=False)
    assert abs(float(smc.log_evidence) - est.log_z) < max(3 * est.log_z_std, 0.15), (
        float(smc.log_evidence), est.log_z, est.log_z_std,
    )
    # and both sit on the quadrature truth
    assert abs(float(smc.log_evidence) - log_z) < 0.1


def test_sharded_island_smc():
    """Island SMC on the 8-virtual-device mesh: per-island unbiased Z
    estimates combine to the analytic evidence, particles stay sharded."""
    from bayesianinferencedl_tpu.parallel import device_mesh, sharded_smc

    misfit, prior, log_z, mu, P = _linear_gaussian()
    mesh = device_mesh()
    res, lz_islands = sharded_smc(
        mesh, misfit, prior, jax.random.PRNGKey(9), n_particles=8192,
        n_mutations=4,
    )
    assert res.particles.shape == (8192, 3)
    assert lz_islands.shape == (8,)
    assert (np.asarray(res.n_stages) < 64).all()
    # combined estimate = mean of island Z's (each unbiased)
    assert abs(float(res.log_evidence) - log_z) < 0.08, (float(res.log_evidence), log_z)
    # island spread is a usable error bar
    assert np.asarray(lz_islands).std() < 0.5
    th = np.asarray(res.particles)
    np.testing.assert_allclose(th.mean(0), mu, atol=0.05)


def test_ff_smc_evidence_and_bayes_factor():
    """Full-field SMC evidence (api_full_field.run_full_field_evidence):
    same-seed runs across likelihoods are Bayes-factor legs on identical
    data; the corrected model should never lose badly to the raw ROM (its
    forward is strictly closer to the data-generating FOM)."""
    import jax.numpy as jnp

    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_full_field_evidence,
    )

    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=8, n_snapshots=24,
        basis_size=4, k_basis_size=16, n_train=96, surrogate_hidden=(16,),
        surrogate_steps=400, cg_tol=1e-10, cg_maxiter=2000, use_pallas=False,
    )
    kw = dict(noise_sigma=1e-2, n_particles=512, n_groups=4, n_mutations=3,
              key=jax.random.PRNGKey(5))
    ev_nn = run_full_field_evidence(pipe, likelihood="rom_nn", **kw)
    ev_rom = run_full_field_evidence(pipe, likelihood="rom", **kw)
    assert np.isfinite(ev_nn.log_evidence) and np.isfinite(ev_rom.log_evidence)
    np.testing.assert_array_equal(np.asarray(ev_nn.data), np.asarray(ev_rom.data))
    # log Bayes factor rom_nn vs rom on shared data: allow noise, but the
    # corrected model must not be decisively WORSE
    assert ev_nn.log_evidence > ev_rom.log_evidence - 3 * (
        ev_nn.log_evidence_std + ev_rom.log_evidence_std + 0.5
    )
    # external-data route shares the estimator
    ev_ext = run_full_field_evidence(
        pipe, likelihood="rom_nn", data=ev_nn.data, **kw
    )
    assert np.isfinite(ev_ext.log_evidence)
    # same data, same key -> identical estimate
    np.testing.assert_allclose(ev_ext.log_evidence, ev_nn.log_evidence)


def test_ff_smc_evidence_island_sharded():
    import jax.numpy as jnp

    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_full_field_evidence,
    )
    from bayesianinferencedl_tpu.parallel import device_mesh

    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=8, n_snapshots=24,
        basis_size=4, k_basis_size=16, n_train=96, surrogate_hidden=(16,),
        surrogate_steps=400, cg_tol=1e-10, cg_maxiter=2000, use_pallas=False,
    )
    ev = run_full_field_evidence(
        pipe, likelihood="rom_nn", noise_sigma=1e-2, n_particles=512,
        n_mutations=3, key=jax.random.PRNGKey(6), mesh=device_mesh(),
    )
    assert np.isfinite(ev.log_evidence)
    assert ev.log_z_groups.shape[0] == 8  # one island per device
