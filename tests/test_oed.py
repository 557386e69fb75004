"""Optimal experimental design (infer/oed.py): greedy D-optimal sensor
placement against brute-force and posterior-contraction oracles."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior, run_pcn
from bayesianinferencedl_tpu.infer.oed import (
    boundary_candidates,
    design_sensors,
    eig_of_subset,
    greedy_eig,
    pointwise_sensitivities,
    solution_indices,
)
from bayesianinferencedl_tpu.models.five_param import FiveParamFin


def _rand_J(B=4, n=8, d=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, n, d)))


def test_greedy_first_pick_is_optimal_and_near_optimal_overall():
    J = _rand_J()
    sigma = 0.5
    picked, trace, gains = greedy_eig(J, sigma, 3)
    # first greedy pick IS the best single sensor (exact)
    singles = [eig_of_subset(J, [s], sigma) for s in range(J.shape[1])]
    assert np.isclose(trace[0], max(singles), rtol=1e-10)
    # overall: within the submodular (1 - 1/e) guarantee of brute force
    best3 = max(
        eig_of_subset(J, list(S), sigma)
        for S in itertools.combinations(range(J.shape[1]), 3)
    )
    assert trace[-1] >= (1 - 1 / np.e) * best3
    assert trace[-1] <= best3 + 1e-9


def test_greedy_trace_equals_exact_subset_eig():
    """The chain-rule det factorization: summed greedy gains equal the
    exact EIG of the final picked set (duplicates priced correctly)."""
    J = _rand_J(B=3, n=6, d=4, seed=2)
    sigma = 0.3
    picked, trace, gains = greedy_eig(J, sigma, 4)
    # picked may contain repeats — the exact EIG of a multiset sums the
    # rank-one updates the same way greedy accumulated them
    Jrep = J[:, np.asarray(picked), :]
    assert np.isclose(
        trace[-1], eig_of_subset(Jrep, np.arange(len(picked)), sigma), rtol=1e-9
    )
    assert np.all(np.diff(trace) > 0)
    assert np.all(np.diff(gains) <= 1e-12)  # submodularity: gains shrink


def test_design_on_fin_beats_random_subsets():
    fin = FiveParamFin.create(resolution=1, dtype=jnp.float64, cg_tol=1e-11)
    prior = GaussianPrior.iid(5, sigma=0.6, dtype=jnp.float64)
    sigma_n = 1e-2
    design = design_sensors(
        fin, prior, n_sensors=6, noise_sigma=sigma_n, n_draws=8,
        key=jax.random.PRNGKey(0),
    )
    assert np.all(np.diff(design.eig_trace) > 0)
    assert design.xy.shape == (6, 2)

    # same J the design saw; score random 6-subsets of the same pool
    cand = design.candidates
    xs = prior.sample(jax.random.PRNGKey(0), (8,))
    J = pointwise_sensitivities(fin, xs, cand, to_theta=prior.to_theta)
    eig_design = design.eig_trace[-1]
    rng = np.random.default_rng(3)
    eig_rand = [
        eig_of_subset(
            J, rng.choice(len(cand), 6, replace=False), sigma_n,
            prior_chol=prior.chol,
        )
        for _ in range(20)
    ]
    # the designed set beats EVERY random draw (and the mean by a margin)
    assert eig_design > max(eig_rand), (eig_design, max(eig_rand))
    assert eig_design > 1.1 * np.mean(eig_rand)


def test_designed_sensors_tighten_the_actual_posterior():
    """End-to-end: pCN with the designed pointwise-sensor likelihood
    contracts the posterior more than a clustered sensor set of the same
    size — the EIG ordering shows up in real MCMC variances."""
    fin = FiveParamFin.create(resolution=1, dtype=jnp.float64, cg_tol=1e-11)
    prior = GaussianPrior.iid(5, sigma=0.6, dtype=jnp.float64)
    sigma_n = 1e-2
    design = design_sensors(
        fin, prior, n_sensors=6, noise_sigma=sigma_n, n_draws=8,
        key=jax.random.PRNGKey(0),
    )
    # clustered baseline: the 6 candidates nearest the first candidate node
    cand = design.candidates
    xy = np.asarray(fin.mesh.nodes[cand])
    d0 = np.linalg.norm(xy - xy[0], axis=1)
    clustered = cand[np.argsort(d0)[:6]]

    sol_idx = solution_indices(fin)
    theta_true = prior.sample(jax.random.PRNGKey(9))
    key_noise = jax.random.PRNGKey(10)

    def posterior_var(node_ids, key):
        idx = jnp.asarray(sol_idx[np.asarray(node_ids)])
        from bayesianinferencedl_tpu.fem.solve import solve_fom

        fwd = lambda th: solve_fom(fin.op, jnp.exp(th), tol=1e-11, maxiter=3000)[idx]
        data = fwd(theta_true) + sigma_n * jax.random.normal(
            key_noise, (len(node_ids),), jnp.float64
        )
        from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit

        mis = gaussian_misfit(fwd, data, sigma_n)
        theta0 = prior.sample(jax.random.PRNGKey(1), (32,))
        res = run_pcn(
            mis, prior, theta0, key, n_steps=1200, n_burn=400, beta=0.25
        )
        s = np.asarray(res.samples).reshape(-1, 5)
        return float(np.sum(s.var(axis=0)))

    v_design = posterior_var(design.node_ids, jax.random.PRNGKey(2))
    v_cluster = posterior_var(clustered, jax.random.PRNGKey(3))
    assert v_design < v_cluster, (v_design, v_cluster)


def test_designed_sensors_through_full_pipeline():
    """with_sensor_qoi + build_pipeline(fin=...): the whole offline stack
    (snapshots, ROM lifted QoI, NN correction) and the inversion follow a
    CUSTOM pointwise observation operator end to end."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )
    from bayesianinferencedl_tpu.infer.oed import with_sensor_qoi

    fin = FiveParamFin.create(resolution=1, dtype=jnp.float64, cg_tol=1e-11)
    prior = GaussianPrior.iid(5, sigma=0.6, dtype=jnp.float64)
    design = design_sensors(
        fin, prior, n_sensors=7, noise_sigma=1e-2, n_draws=8,
        key=jax.random.PRNGKey(0),
    )
    fin_s = with_sensor_qoi(fin, design.node_ids)
    assert fin_s.op.n_obs == 7

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=48, basis_size=20),
        surrogate=SurrogateConfig(hidden=(32, 32), n_train=192, epochs=80, batch_size=64),
        mcmc=MCMCConfig(n_chains=32, n_steps=1200, n_burn=400, beta=0.3, noise_sigma=1e-2),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float64, fin=fin_s)
    # the surrogate learned the 7-dim observable space
    assert pipe.dataset.y_fom.shape[-1] == 7
    inv = run_inversion(pipe, likelihood="rom_nn", key=jax.random.PRNGKey(11))
    assert inv.data.shape == (7,)
    post_mean = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    post_sd = np.asarray(inv.result.samples.reshape(-1, 5).std(axis=0))
    theta_true = np.asarray(inv.theta_true)
    # truth within the posterior's own calibration (pointwise sensors leave
    # some components legitimately wide at 1e-2 noise — the check is
    # coverage, not a hard error bound)
    err = np.abs(post_mean - theta_true)
    assert err.max() < 0.5, (post_mean, theta_true)
    assert np.all(err < 3.0 * post_sd + 0.05), (err, post_sd)
