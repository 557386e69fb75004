"""Multi-device sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 'multi-device tests without a TPU pod')."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit
from bayesianinferencedl_tpu.models.surrogate import MLP, adam_init
from bayesianinferencedl_tpu.parallel import device_mesh, dp_train_step, sharded_pcn, sharded_snapshots


def test_mesh_has_8_devices():
    mesh = device_mesh()
    assert mesh.devices.size == 8


def test_sharded_pcn_runs_and_matches_stats():
    mesh = device_mesh()
    prior = GaussianPrior.iid(3, sigma=1.0, dtype=jnp.float64)
    H = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)))
    data = jnp.asarray(np.random.default_rng(1).standard_normal(4))
    misfit = gaussian_misfit(lambda t: H @ t, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = sharded_pcn(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(1), n_steps=2000, n_burn=500, beta=0.4
    )
    assert res.samples.shape == (1500, 64, 3)
    # analytic posterior mean check (coarse)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / 0.25 + np.eye(3))
    mu = Cpost @ np.asarray(H.T @ data) / 0.25
    emp = np.asarray(res.samples).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.08)
    # different devices actually decorrelated: chains on different shards differ
    s0 = np.asarray(res.samples[:, 0, 0])
    s8 = np.asarray(res.samples[:, 8, 0])
    assert np.abs(np.corrcoef(s0, s8)[0, 1]) < 0.5


def test_sharded_snapshots_match_local(op_r1_f64):
    mesh = device_mesh()
    from bayesianinferencedl_tpu.rom.snapshots import generate_snapshots, sample_log_uniform

    ks = sample_log_uniform(jax.random.PRNGKey(5), 16)
    S_local = generate_snapshots(op_r1_f64, ks, tol=1e-12)
    S_shard = sharded_snapshots(mesh, op_r1_f64, ks, tol=1e-12)
    np.testing.assert_allclose(np.asarray(S_shard), np.asarray(S_local), rtol=1e-9, atol=1e-11)


def test_dp_train_step_matches_single_device():
    mesh = device_mesh()
    mlp = MLP(sizes=(5, 16, 3), activation="tanh")
    params = mlp.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    opt = adam_init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 5), jnp.float64)
    y = jax.random.normal(jax.random.PRNGKey(2), (64, 3), jnp.float64)

    p_dp, _, loss_dp = dp_train_step(mesh, mlp, params, opt, x, y, 1e-3)

    # single-device reference step
    from bayesianinferencedl_tpu.models.surrogate import adam_update

    def loss_fn(pp):
        return jnp.mean((mlp.apply(pp, x) - y) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_fn)(params)
    p_ref, _ = adam_update(params, g_ref, opt, 1e-3)

    assert abs(float(loss_dp) - float(l_ref)) < 1e-10
    for (W1, b1), (W2, b2) in zip(p_dp, p_ref):
        np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), atol=1e-10)


def test_sharded_da_pcn_matches_stats():
    """DA chains shard like pCN chains (independent); the sharded run must
    hit the same analytic FINE posterior despite a biased coarse misfit."""
    from bayesianinferencedl_tpu.parallel import sharded_da_pcn

    mesh = device_mesh()
    prior = GaussianPrior.iid(3, sigma=1.0, dtype=jnp.float64)
    H = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)))
    data = jnp.asarray(np.random.default_rng(1).standard_normal(4))
    misfit_f = gaussian_misfit(lambda t: H @ t, data, 0.5)
    misfit_c = gaussian_misfit(lambda t: H @ t + 0.3, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = sharded_da_pcn(
        mesh, misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(1),
        n_steps=2500, n_burn=500, beta=0.4, subchain=4,
    )
    assert res.samples.shape == (2000, 64, 3)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / 0.25 + np.eye(3))
    mu = Cpost @ np.asarray(H.T @ data) / 0.25
    emp = np.asarray(res.samples).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.08)
    # different shards decorrelated
    s0 = np.asarray(res.samples[:, 0, 0])
    s8 = np.asarray(res.samples[:, 8, 0])
    assert np.abs(np.corrcoef(s0, s8)[0, 1]) < 0.5


def test_sharded_pt_da_runs_and_swaps():
    """Tempered DA shards the chain-group axis; each device owns its full
    ladder, so swap rates are healthy and the cold level is exact."""
    from bayesianinferencedl_tpu.parallel import sharded_pt_da

    mesh = device_mesh()
    prior = GaussianPrior.iid(2, sigma=1.0, dtype=jnp.float64)
    H = jnp.asarray(np.random.default_rng(2).standard_normal((3, 2)))
    data = jnp.asarray(np.random.default_rng(3).standard_normal(3))
    misfit = gaussian_misfit(lambda t: H @ t, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(2), (32,))
    res = sharded_pt_da(
        mesh, misfit, misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=1500, n_burn=300, beta=0.4, subchain=4, n_temps=3, lambda_min=0.1,
    )
    assert res.samples.shape == (1200, 32, 2)
    assert res.theta.shape == (3, 32, 2)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)  # identical misfits
    assert np.asarray(res.swap_rate).min() > 0.2
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / 0.25 + np.eye(2))
    mu = Cpost @ np.asarray(H.T @ data) / 0.25
    emp = np.asarray(res.samples).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.08)


def test_run_inversion_routes_mesh_for_da_samplers():
    """run_inversion(mesh=...) must actually shard the new samplers (the
    non-sharded fallback silently ignoring the mesh was a review finding).
    Exercised end-to-end on the virtual 8-device mesh at toy scale."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-6, cg_maxiter=300),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=40, n_burn=16, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="da_pcn", subchain=2, da_coarse="rom",
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    mesh = device_mesh()

    inv = run_inversion(pipe, mesh=mesh)
    assert inv.result.samples.shape == (24, 16, 5)
    assert bool(jnp.isfinite(inv.result.samples).all())

    inv_pt = run_inversion(pipe, sampler="pt_da_pcn", mesh=mesh)
    assert inv_pt.result.samples.shape == (24, 16, 5)
    assert inv_pt.result.theta.shape[0] == cfg.mcmc.n_temps
    assert bool(jnp.isfinite(inv_pt.result.samples).all())

    inv_ptp = run_inversion(pipe, sampler="pt_pcn", mesh=mesh)
    assert inv_ptp.result.samples.shape == (24, 16, 5)
    assert bool(jnp.isfinite(inv_ptp.result.samples).all())


def test_run_inversion_routes_mesh_for_pt_mala():
    """sampler='pt_mala' through run_inversion(mesh=...): the sharded
    gradient-informed tempering path (sharded_pt_mala), end-to-end on the
    virtual 8-device mesh at toy scale — gradients of the rom_nn likelihood
    flow through the differentiable batched forward under shard_map."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-6, cg_maxiter=300),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=40, n_burn=16, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="pt_mala", n_temps=3,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    inv = run_inversion(pipe, mesh=device_mesh())
    assert inv.result.samples.shape == (24, 16, 5)
    assert inv.result.theta.shape == (3, 16, 5)
    assert inv.result.step.shape == (3, 16)
    assert bool(jnp.isfinite(inv.result.samples).all())


def test_run_inversion_routes_mesh_for_pt_da_mala_inner():
    """sampler='pt_da_pcn' with cfg.da_inner='mala' through
    run_inversion(mesh=...): tempered DA with gradient-informed subchains on
    the sharded path (sharded_pt_da_segmented inner='mala' — vma checking
    disabled for the differentiable coarse forward's custom_linear_solve)."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-6, cg_maxiter=300),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=40, n_burn=16, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="pt_da_pcn", subchain=2,
            da_coarse="rom", da_inner="mala", n_temps=3,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    inv = run_inversion(pipe, mesh=device_mesh())
    assert inv.result.samples.shape == (24, 16, 5)
    assert inv.result.theta.shape == (3, 16, 5)
    assert bool(jnp.isfinite(inv.result.samples).all())
    assert 0.0 < float(jnp.mean(inv.result.inner_accept_rate)) <= 1.0


def test_sharded_pt_pcn_adaptive_ladder():
    """adapt_ladder under shard_map: each device tunes per-group ladders for
    its own shard (no collectives), the global result carries the full
    (K, G) ladder, and the cold level stays exact."""
    from bayesianinferencedl_tpu.parallel import sharded_pt_pcn

    mesh = device_mesh()
    prior = GaussianPrior.iid(2, sigma=1.0, dtype=jnp.float64)
    H = jnp.asarray(np.random.default_rng(2).standard_normal((3, 2)))
    data = jnp.asarray(np.random.default_rng(3).standard_normal(3))
    misfit = gaussian_misfit(lambda t: H @ t, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(2), (32,))
    res = sharded_pt_pcn(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=2500, n_burn=500, beta=0.4, n_temps=3, lambda_min=0.5,
        adapt_ladder=True,
    )
    assert res.lambdas.shape == (3, 32)
    lam = np.asarray(res.lambdas)
    np.testing.assert_allclose(lam[-1], 1.0)
    assert (np.diff(lam, axis=0) > 0).all()
    # ladders adapted away from the (0.5, ~0.7, 1) start
    assert lam[0].mean() < 0.45
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / 0.25 + np.eye(2))
    mu = Cpost @ np.asarray(H.T @ data) / 0.25
    emp = np.asarray(res.samples).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(emp, mu, atol=0.08)


def test_sharded_hmc_chees_auto():
    """sharded_hmc_chees: the ChEES probes compute their centering mean and
    criterion as cross-device pmeans, so every shard scores candidates
    identically; the winner is interior on an anisotropic target and the
    sharded production run matches the analytic posterior."""
    import numpy as np

    from bayesianinferencedl_tpu.infer.priors import GaussianPrior
    from bayesianinferencedl_tpu.parallel.mesh import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_hmc_chees

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

    mesh = device_mesh()
    theta0 = prior.sample(jax.random.PRNGKey(1), (2048,))
    res, info = sharded_hmc_chees(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(2),
        n_steps=700, n_burn=300, step=0.1, batched=True,
    )
    assert 1 < info["n_leap"] < info["candidates"][-1], info
    s = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(s.std(0), np.sqrt(np.diag(Cpost)), atol=0.05)
