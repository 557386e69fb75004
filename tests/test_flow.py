"""Normalizing-flow VI + NeuTra (infer/flow.py): identity/inverse exactness,
reverse-KL exactness on linear-Gaussian targets, the MEASURED multimodal
dichotomy (every reverse-KL schedule collapses; forward-KL MLE on particles
never does), the PSIS mode-missing blind spot, flow-preconditioned pCN mode
crossing where plain pCN strands, and the mesh-sharded trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.flow import (
    CouplingFlow,
    fit_flow_mle,
    flow_psis_certify,
    flow_sample,
    neutra_misfit,
    run_flow_vi,
    run_neutra_pcn,
)
from bayesianinferencedl_tpu.infer.priors import GaussianPrior

A_MODE = 1.5
S_MODE = 0.25


def _bimodal(d=2, a=A_MODE, s=S_MODE):
    """Posterior = 0.5 N(+a 1, s^2 I) + 0.5 N(-a 1, s^2 I) under an iid
    N(0, 1) prior: the misfit adds the prior nlp back so the posterior is
    exactly the mixture. Separation 2*a*sqrt(d)/s = 17 sigma — far enough
    that single-chain kernels and mode-seeking fits provably fail."""
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    m1 = jnp.full((d,), a, jnp.float64)
    m2 = -m1

    def misfit(th):
        d1 = jnp.sum((th - m1) ** 2, axis=-1) / (2 * s * s)
        d2 = jnp.sum((th - m2) ** 2, axis=-1) / (2 * s * s)
        return -jnp.logaddexp(-d1, -d2) + 0.5 * jnp.sum(th * th, axis=-1)

    def particles(key, n):
        k1, k2 = jax.random.split(key)
        which = jax.random.bernoulli(k1, 0.5, (n,))
        return jnp.where(which[:, None], m1, m2) + s * jax.random.normal(
            k2, (n, d), jnp.float64
        )

    def mode_fracs(th):
        th = np.asarray(th).reshape(-1, d)
        f1 = (((th - np.asarray(m1)) ** 2).sum(-1) < (4 * s) ** 2).mean()
        f2 = (((th - np.asarray(m2)) ** 2).sum(-1) < (4 * s) ** 2).mean()
        return float(f1), float(f2)

    return misfit, prior, particles, mode_fracs, (m1, m2)


def _linear_gaussian(d=5, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((d, d)), jnp.float64)
    data = jnp.asarray(rng.standard_normal(d))
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(A.T @ A) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(A.T @ data) / sigma**2

    def misfit(th):
        r = th @ A.T - data
        return 0.5 / sigma**2 * jnp.sum(r * r, axis=-1)

    return misfit, prior, mu, Cpost


def test_flow_identity_init_and_inverse_roundtrip():
    """Zero-initialized flow IS the identity (forward(Z) = Z, logdet 0);
    after perturbing the parameters the analytic inverse round-trips both
    the point and the log-determinant."""
    flow = CouplingFlow(dim=4, n_couplings=4, hidden=16)
    params = flow.init(jax.random.PRNGKey(0), jnp.float64)
    Z = jax.random.normal(jax.random.PRNGKey(1), (64, 4), jnp.float64)
    Y, logdet = flow.forward(params, Z)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Z), atol=1e-14)
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-14)

    # perturb every leaf so the map is genuinely nonlinear, then round-trip
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    params = jax.tree.unflatten(tree, leaves)
    Y, ld_f = flow.forward(params, Z)
    assert float(jnp.std(Y - Z)) > 0.01  # actually moved
    Z2, ld_i = flow.inverse(params, Y)
    np.testing.assert_allclose(np.asarray(Z2), np.asarray(Z), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld_i), np.asarray(ld_f), atol=1e-10)


def test_flow_vi_exact_on_linear_gaussian():
    """Reverse-KL flow-VI on a Gaussian posterior: the affine first layer
    makes the family contain the truth, so the fit recovers mean and
    covariance (sampled moments) and PSIS certifies it."""
    misfit, prior, mu, Cpost = _linear_gaussian()
    res = run_flow_vi(
        misfit, prior, jax.random.PRNGKey(1),
        n_couplings=4, hidden=16, n_steps=4000, n_mc=64, lr=0.01,
        anneal_steps=0, batched=True,
    )
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.05)
    np.testing.assert_allclose(np.asarray(res.theta_cov), Cpost, atol=0.06)
    e = np.asarray(res.elbo_trace)
    assert e[-200:].mean() > e[:200].mean()
    cert = flow_psis_certify(
        misfit, prior, res, jax.random.PRNGKey(2), n_draws=4096, batched=True
    )
    assert cert.reliable
    np.testing.assert_allclose(cert.mean, mu, atol=0.03)


def test_reverse_kl_collapses_forward_kl_covers():
    """The measured multimodal dichotomy this module's design rests on:
    (a) annealed reverse-KL flow-VI collapses to ONE basin; (b) forward-KL
    MLE on a covering particle population holds BOTH (~50/50); (c) even a
    short reverse-KL refinement warm-started from the covering fit
    re-collapses — the reason api.run_flow_vi_inversion defaults
    refinement OFF after SMC pretraining."""
    misfit, prior, particles, mode_fracs, _ = _bimodal()

    # (a) annealed reverse KL: one basin takes (essentially) everything
    res_rkl = run_flow_vi(
        misfit, prior, jax.random.PRNGKey(0),
        n_couplings=6, hidden=32, n_steps=3000, n_mc=64, lr=0.01,
        anneal_steps=1500, lambda0=0.05, batched=True,
    )
    f1, f2 = mode_fracs(flow_sample(res_rkl, jax.random.PRNGKey(1), (8000,)))
    assert max(f1, f2) > 0.95 and min(f1, f2) < 0.05

    # (b) forward-KL MLE on particles: both basins, balanced
    pts = particles(jax.random.PRNGKey(2), 2048)
    res_mle = fit_flow_mle(
        pts, prior, jax.random.PRNGKey(3),
        n_couplings=6, hidden=32, n_steps=2000, n_batch=256, lr=0.01,
    )
    g1, g2 = mode_fracs(flow_sample(res_mle, jax.random.PRNGKey(4), (8000,)))
    assert 0.4 < g1 < 0.6 and 0.4 < g2 < 0.6

    # (c) reverse-KL refinement from the covering fit re-collapses — a slow
    # leak whose onset varies with the warm start (500-2000 steps only
    # drift the split, which is why no "short polish" default is safe);
    # complete by 8000 steps at lr 0.01 on every (warm start, seed) tried
    res_ref = run_flow_vi(
        misfit, prior, jax.random.PRNGKey(5),
        n_couplings=6, hidden=32, n_steps=8000, n_mc=128, lr=0.01,
        anneal_steps=0, batched=True, params=res_mle.params,
    )
    h1, h2 = mode_fracs(flow_sample(res_ref, jax.random.PRNGKey(6), (8000,)))
    assert max(h1, h2) > 0.9 and min(h1, h2) < 0.1


def test_psis_mode_missing_blind_spot():
    """PSIS's documented blind spot (infer/flow.py docstring): a Gaussian
    fit sitting cleanly in ONE basin passes the k-hat gate — the weights on
    its own support are perfectly tame — while its corrected mean misses
    the true mean by the full mode offset. The covering flow passes the
    SAME gate and actually corrects the mean. k-hat certifies coverage
    where q has support; it cannot see a basin q never visits."""
    from bayesianinferencedl_tpu.infer.psis import psis_correct

    misfit, prior, particles, mode_fracs, (m1, _) = _bimodal()

    # single-basin Gaussian q (what mode-seeking ADVI converges to)
    q_mean = m1
    q_chol = S_MODE * jnp.eye(2, dtype=jnp.float64)
    cert_g = psis_correct(
        misfit, prior, q_mean, q_chol, jax.random.PRNGKey(0),
        n_draws=4096, batched=True,
    )
    assert cert_g.reliable  # the gate PASSES...
    assert np.linalg.norm(cert_g.mean - 0.0) > 1.0  # ...and the mean is wrong

    # the covering flow: same gate, correct mean (truth = 0 by symmetry)
    pts = particles(jax.random.PRNGKey(1), 2048)
    res = fit_flow_mle(pts, prior, jax.random.PRNGKey(2), n_steps=2000)
    cert_f = flow_psis_certify(
        misfit, prior, res, jax.random.PRNGKey(3), n_draws=8192, batched=True
    )
    assert cert_f.reliable
    assert np.linalg.norm(cert_f.mean) < 0.15
    # the blind spot is visible in the EVIDENCE leg too, quantitatively:
    # finite draws from the single-basin proposal only ever see that basin's
    # mass, so its log Z estimate sits ~log 2 BELOW the covering flow's
    # (the estimator is unbiased only on q's effective support)
    gap = cert_f.log_evidence - cert_g.log_evidence
    assert 0.4 < gap < 1.0, gap


def test_neutra_pcn_crosses_modes_where_plain_pcn_strands():
    """Flow-preconditioned pCN with the covering MLE flow: EVERY chain
    visits both basins and split-R-hat certifies convergence; plain pCN at
    the same budget never crosses (chains keep their initial basin)."""
    from bayesianinferencedl_tpu.infer.diagnostics import rhat
    from bayesianinferencedl_tpu.infer.pcn import run_pcn

    misfit, prior, particles, mode_fracs, (m1, m2) = _bimodal()
    pts = particles(jax.random.PRNGKey(0), 2048)
    res = fit_flow_mle(pts, prior, jax.random.PRNGKey(1), n_steps=2000)

    out = run_neutra_pcn(
        res, misfit, prior, jax.random.PRNGKey(2),
        n_chains=64, n_steps=2000, n_burn=500, beta=0.3, batched=True,
    )
    samp = np.asarray(out.samples)
    near1 = ((samp - np.asarray(m1)) ** 2).sum(-1) < (4 * S_MODE) ** 2
    near2 = ((samp - np.asarray(m2)) ** 2).sum(-1) < (4 * S_MODE) ** 2
    frac_both = (near1.any(0) & near2.any(0)).mean()
    assert frac_both > 0.9
    assert 0.4 < near1.mean() < 0.6
    assert float(jnp.max(rhat(out.samples))) < 1.05

    # plain pCN, matched budget: zero chains cross the 17-sigma gap
    th0 = prior.sample(jax.random.PRNGKey(3), (64,))
    outp = run_pcn(
        misfit, prior, th0, jax.random.PRNGKey(4),
        n_steps=2000, n_burn=500, beta=0.3,
    )
    sp = np.asarray(outp.samples)
    p1 = ((sp - np.asarray(m1)) ** 2).sum(-1) < (4 * S_MODE) ** 2
    p2 = ((sp - np.asarray(m2)) ** 2).sum(-1) < (4 * S_MODE) ** 2
    assert (p1.any(0) & p2.any(0)).mean() < 0.05


def test_neutra_identity_flow_is_plain_whitened_kernel():
    """With the identity flow the NeuTra potential equals the plain misfit
    at the pushed-forward point EXACTLY — the reduction the docstring
    promises (logdet = 0 and the base/prior quadratics cancel)."""
    misfit, prior, mu, Cpost = _linear_gaussian(d=4, seed=2)
    flow = CouplingFlow(dim=4, n_couplings=4, hidden=8)
    params = flow.init(jax.random.PRNGKey(0), jnp.float64)
    from bayesianinferencedl_tpu.infer.flow import FlowVIResult

    res = FlowVIResult(
        flow=flow, params=params, ref_mean=prior.mean, ref_chol=prior.chol,
        elbo_trace=jnp.zeros(1), theta_mean=prior.mean,
        theta_cov=jnp.eye(4, dtype=jnp.float64), n_forward=0,
    )
    misfit_Z, base, to_theta = neutra_misfit(res, misfit, prior, batched=True)
    Z = jax.random.normal(jax.random.PRNGKey(1), (128, 4), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(misfit_Z(Z)), np.asarray(misfit(to_theta(Z))), atol=1e-10
    )
    assert float(jnp.max(jnp.abs(base.chol - jnp.eye(4, dtype=base.chol.dtype)))) == 0.0


def test_flow_mle_survives_degenerate_population():
    """The Liu-West smoothing kernel makes MLE safe on ATOM populations:
    a resampled SMC population at tight noise can carry only dozens of
    unique points, and exact MLE on atoms is degenerate — measured (f32,
    the fin posterior's anisotropy): 32 unique points tiled to 4096 drove
    the sample std up to 1.8e4x truth without the kernel; with it the fit
    stays at ~1x with zero covariance bias by construction."""
    mean = jnp.array([0.5845, -0.4843, -0.1081, -0.0761, -0.5730], jnp.float32)
    std = jnp.array([0.0118, 0.1007, 0.3028, 0.5778, 0.0664], jnp.float32)
    prior = GaussianPrior.iid(5, sigma=0.6, dtype=jnp.float32)
    uniq = mean + std * jax.random.normal(jax.random.PRNGKey(0), (32, 5), jnp.float32)
    pts = jnp.tile(uniq, (128, 1))
    res = fit_flow_mle(
        pts, prior, jax.random.PRNGKey(1),
        n_couplings=6, hidden=32, n_steps=3000, n_batch=256, lr=0.01,
    )
    th = np.asarray(flow_sample(res, jax.random.PRNGKey(2), (8192,)))
    ratio = th.std(0) / np.asarray(uniq).std(0)
    assert np.all(ratio < 2.0) and np.all(ratio > 0.5), ratio
    # and the fit tracks the POPULATION moments (truth to MC error of 32)
    assert np.abs(th.mean(0) - np.asarray(uniq).mean(0)).max() < 0.3


def test_flow_psis_base_scale_widening_rescues_underdispersed_fit():
    """base_scale > 1 (defensive IS): a flow fit trained on UNDER-dispersed
    particles under-covers the posterior tails and k-hat flags it; the same
    fit certified through a base-widened proposal passes the gate AND its
    corrected mean matches the truth — exactly the production move the fin
    experiment needed (artifacts/flow_r3.json, k-hat 0.811)."""
    misfit, prior, mu, Cpost = _linear_gaussian(d=4, seed=9)
    # particles deliberately 0.65x too narrow around the true mean
    L = jnp.asarray(np.linalg.cholesky(Cpost))
    eps = jax.random.normal(jax.random.PRNGKey(0), (4096, 4), jnp.float64)
    pts = jnp.asarray(mu) + 0.65 * eps @ L.T
    res = fit_flow_mle(pts, prior, jax.random.PRNGKey(1), n_steps=2000)
    cert_narrow = flow_psis_certify(
        misfit, prior, res, jax.random.PRNGKey(2), n_draws=4096, batched=True
    )
    cert_wide = flow_psis_certify(
        misfit, prior, res, jax.random.PRNGKey(2), n_draws=4096,
        batched=True, base_scale=1.8,
    )
    assert cert_wide.k_hat < cert_narrow.k_hat
    assert cert_wide.reliable, (cert_narrow.k_hat, cert_wide.k_hat)
    np.testing.assert_allclose(cert_wide.mean, mu, atol=0.06)


def test_flow_mle_respects_weights():
    """Weighted MLE: an importance-weighted population (e.g. an SMC one)
    reproduces the WEIGHTED mass split, not the raw particle count's."""
    misfit, prior, particles, mode_fracs, (m1, m2) = _bimodal()
    pts = particles(jax.random.PRNGKey(0), 4096)
    near1 = jnp.sum((pts - m1) ** 2, axis=-1) < (4 * S_MODE) ** 2
    w = jnp.where(near1, 3.0, 1.0)  # re-weight basin 1 to 75/25
    res = fit_flow_mle(
        pts, prior, jax.random.PRNGKey(1), weights=w, n_steps=2000
    )
    f1, f2 = mode_fracs(flow_sample(res, jax.random.PRNGKey(2), (8000,)))
    assert 0.65 < f1 < 0.85 and 0.15 < f2 < 0.35


def test_sharded_flow_vi_matches_posterior():
    """sharded_flow_vi: MC axis sharded over the mesh, replicated flow
    params (vma grad convention) — fit matches the exact posterior like the
    single-device path."""
    from bayesianinferencedl_tpu.parallel.mesh import device_mesh
    from bayesianinferencedl_tpu.parallel.sharding import sharded_flow_vi

    misfit, prior, mu, Cpost = _linear_gaussian(seed=7)
    mesh = device_mesh()
    res = sharded_flow_vi(
        mesh, misfit, prior, jax.random.PRNGKey(8),
        n_couplings=4, hidden=16, n_steps=4000, n_mc=64, lr=0.01,
        anneal_steps=0, batched=True,
    )
    np.testing.assert_allclose(np.asarray(res.theta_mean), mu, atol=0.06)
    np.testing.assert_allclose(np.asarray(res.theta_cov), Cpost, atol=0.08)
    assert np.isfinite(np.asarray(res.elbo_trace)).all()


def test_api_flow_pipeline_end_to_end():
    """api.run_flow_vi_inversion (SMC pretrain -> MLE) + psis_certify_flow
    + run_neutra_inversion on a tiny five-param pipeline: the full
    production composition runs, certifies at the near-Gaussian 1e-2
    regime, and NeuTra's posterior agrees with the PSIS-corrected one."""
    import bayesianinferencedl_tpu.api as api
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
        SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=48, basis_size=16),
        surrogate=SurrogateConfig(hidden=(24, 24), n_train=128, epochs=60),
        mcmc=MCMCConfig(noise_sigma=1e-2),
    )
    pipe = api.build_pipeline(cfg, dtype=jnp.float64)
    # default pretrain strength: 512 particles / 800 steps measured k-hat
    # 0.83 (FAIL) on this pipeline vs 0.52 (pass) at the 2048/2000 defaults
    res, theta_true, data, wall = api.run_flow_vi_inversion(
        pipe, "rom_nn", n_couplings=4, hidden=16,
        key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(res.theta_mean)).all()
    cert = api.psis_certify_flow(
        pipe, res, data, "rom_nn", n_draws=2048, key=jax.random.PRNGKey(1)
    )
    assert cert.reliable, cert.k_hat
    inv = api.run_neutra_inversion(
        pipe, res, data, "rom_nn", theta_true=theta_true,
        n_chains=32, n_steps=400, n_burn=200, key=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(inv.result.samples)).all()
    assert float(jnp.max(inv.rhat)) < 1.2
    post_mean = np.asarray(inv.result.samples).reshape(-1, 5).mean(0)
    np.testing.assert_allclose(post_mean, cert.mean, atol=0.2)


def test_ff_flow_pipeline_end_to_end():
    """run_flow_vi_inversion_ff + psis_certify_flow_ff + the NeuTra ff
    route: the flow layer extends to the full-field (RFF coefficient)
    stack with the same contracts — a d=8 smoke at an easy noise level."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, psis_certify_flow_ff,
        run_flow_vi_inversion_ff, run_neutra_inversion_ff,
    )

    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=8, n_snapshots=24,
        basis_size=6, k_basis_size=16, n_train=96, surrogate_hidden=(16,),
        surrogate_steps=300, cg_tol=1e-10, cg_maxiter=2000, use_pallas=False,
    )
    res, z_true, data, wall = run_flow_vi_inversion_ff(
        pipe, "rom_nn", noise_sigma=1e-2, n_couplings=4, hidden=16,
        pretrain_particles=1024, pretrain_steps=1200,
        key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(res.theta_mean)).all()
    assert res.theta_mean.shape == (8,)
    cert = psis_certify_flow_ff(
        pipe, res, data, "rom_nn", noise_sigma=1e-2, n_draws=2048,
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(cert.k_hat)
    inv = run_neutra_inversion_ff(
        pipe, res, data, "rom_nn", noise_sigma=1e-2, z_true=z_true,
        n_chains=32, n_steps=600, n_burn=300, key=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(inv.result.samples)).all()
    assert float(jnp.max(inv.rhat)) < 1.3
    # NeuTra's posterior mean agrees with the flow fit's at this easy noise
    nm = np.asarray(inv.result.samples).reshape(-1, 8).mean(0)
    assert float(np.abs(nm - np.asarray(res.theta_mean)).mean()) < 0.3
