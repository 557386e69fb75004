"""Parallel-tempered pCN correctness (infer/tempering.py).

Gates: (1) with zero misfit every level keeps the prior invariant and all
swaps accept; (2) on a unimodal linear-Gaussian target the cold level matches
the analytic posterior (tempering machinery adds no bias); (3) on a bimodal
target PT recovers the exact mode masses from a quadrature oracle while
single-temperature pCN with the same budget provably fails (the measured
round-2 failure mode of the fin posterior at 1e-3 noise).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.tempering import run_pt_pcn


def test_pt_invariance_no_data():
    prior = GaussianPrior.iid(2, mean=1.0, sigma=0.7, dtype=jnp.float64)
    misfit = lambda t: jnp.asarray(0.0, jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=4000, n_burn=500, beta=0.6, n_temps=3,
    )
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)  # Phi diff = 0
    np.testing.assert_allclose(np.asarray(res.swap_rate), 1.0)  # log ratio = 0
    np.testing.assert_allclose(samples.mean(0), 1.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 0.7, atol=0.05)


def test_pt_matches_analytic_posterior_unimodal():
    d, m, sigma, prior_sigma = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2

    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, beta=0.4, n_temps=4, lambda_min=0.1,
    )
    samples = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)
    # the ladder actually exchanges
    assert np.asarray(res.swap_rate).min() > 0.2


def _bimodal_setup():
    """Posterior ∝ exp(-Phi) N(0,1) with two wells at ±a of unequal depth;
    oracle mass and moments by dense 1-D quadrature."""
    a, s, depth = 1.6, 0.12, 0.5

    def misfit(t):
        q1 = (t[..., 0] - a) ** 2 / (2 * s**2)
        q2 = (t[..., 0] + a) ** 2 / (2 * s**2) + depth
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    g = np.linspace(-4, 4, 20001)
    q1 = (g - a) ** 2 / (2 * s**2)
    q2 = (g + a) ** 2 / (2 * s**2) + depth
    logp = np.logaddexp(-q1, -q2) - 0.5 * g**2
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mass_right = w[g > 0].sum()
    mean = w @ g
    return misfit, float(mass_right), float(mean)


def test_pt_recovers_bimodal_masses_where_pcn_fails():
    misfit, mass_right, mean = _bimodal_setup()
    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))

    res_pt = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, beta=0.3, n_temps=5, lambda_min=0.02,
    )
    s_pt = np.asarray(res_pt.samples).reshape(-1)
    est_mass = float((s_pt > 0).mean())
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(s_pt.mean() - mean) < 0.1

    # single-temperature pCN with the same per-chain budget: chains freeze in
    # whichever well burn-in left them (the wells are ~13 sigma_well apart),
    # so the cross-chain mass estimate stays at the initialization split and
    # per-chain traces never cross. Assert essentially no chain crosses.
    res_1t = run_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, beta=0.3,
    )
    s_1t = np.asarray(res_1t.samples)[..., 0]  # (n_kept, G)
    sign_flips = (np.sign(s_1t[1:]) != np.sign(s_1t[:-1])).mean()
    assert sign_flips < 1e-3  # no within-chain mode hops
    # PT cold chains DO hop (that's where the mixing comes from)
    s_pt_chain = np.asarray(res_pt.samples)[..., 0]
    assert (np.sign(s_pt_chain[1:]) != np.sign(s_pt_chain[:-1])).mean() > 1e-3


# --- tempered delayed acceptance (run_pt_da) --------------------------------


def test_pt_da_identity_coarse_matches_analytic():
    """With coarse == fine every outer correction accepts and PT-DA reduces
    to (outer-subsampled) PT — the cold level must match the analytic
    posterior of the unimodal linear-Gaussian target."""
    from bayesianinferencedl_tpu.infer.tempering import run_pt_da

    d, m, sigma, prior_sigma = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2

    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_da(
        misfit, misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=2500, n_burn=500, beta=0.4, subchain=4, n_temps=3, lambda_min=0.1,
    )
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)  # identical potentials
    samples = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.07)
    assert np.asarray(res.swap_rate).min() > 0.2


def test_pt_da_exact_bimodal_masses_despite_biased_coarse():
    """Fine target: unequal-depth bimodal. Coarse surrogate: the SAME wells
    but with the depth asymmetry removed — its mode masses are badly wrong
    (~50/50). Tempered DA must recover the FINE quadrature masses: tempering
    supplies the mode hops, the fine correction fixes the mass bias."""
    from bayesianinferencedl_tpu.infer.tempering import run_pt_da

    misfit_f, mass_right, mean = _bimodal_setup()

    a, s = 1.6, 0.12  # same wells, depth 0 -> wrong relative mass

    def misfit_c(t):
        q1 = (t[..., 0] - a) ** 2 / (2 * s**2)
        q2 = (t[..., 0] + a) ** 2 / (2 * s**2)
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pt_da(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(3),
        n_steps=4000, n_burn=1000, beta=0.3, subchain=4, n_temps=5, lambda_min=0.02,
    )
    s_da = np.asarray(res.samples).reshape(-1)
    est_mass = float((s_da > 0).mean())
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(s_da.mean() - mean) < 0.1
    # the equal-depth coarse target's right-mode mass is ~0.5 — far from the
    # fine one — so matching the fine mass demonstrates the correction works
    assert abs(0.5 - mass_right) > 0.1
    # cold chains hop modes (tempering active) and corrections are non-vacuous
    s_chain = np.asarray(res.samples)[..., 0]
    assert (np.sign(s_chain[1:]) != np.sign(s_chain[:-1])).mean() > 1e-3
    out_acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.15 < out_acc < 0.9999


def test_pt_da_segmented_carries_state():
    from bayesianinferencedl_tpu.infer.tempering import run_pt_da_segmented

    misfit_f, mass_right, mean = _bimodal_setup()
    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(4), (32,))
    res = run_pt_da_segmented(
        misfit_f, misfit_f, prior, theta0, jax.random.PRNGKey(5),
        n_steps=1200, n_burn=400, beta=0.3, subchain=4, n_temps=4,
        lambda_min=0.05, segment=500,
    )
    assert res.samples.shape == (800, 32, 1)
    assert res.theta.shape == (4, 32, 1)
    np.testing.assert_allclose(np.asarray(res.accept_rate), 1.0)
    assert abs(float((np.asarray(res.samples).reshape(-1) > 0).mean()) - mass_right) < 0.07


# --- gradient-informed tempering (run_pt_mala) -------------------------------


def test_pt_mala_matches_analytic_posterior_unimodal():
    """Cold level of the MALA ladder matches the analytic linear-Gaussian
    posterior — the tempering + Langevin + drift-clip machinery adds no bias
    (same oracle as test_pt_matches_analytic_posterior_unimodal)."""
    from bayesianinferencedl_tpu.infer.tempering import run_pt_mala

    d, m, sigma, prior_sigma = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2

    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_mala(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1000, step=0.2, n_temps=4, lambda_min=0.1,
    )
    samples = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)
    # every level adapted toward the MALA target acceptance and exchanges
    acc = np.asarray(res.accept_rate)
    assert (np.abs(acc.mean(axis=1) - 0.574) < 0.08).all(), acc.mean(axis=1)
    assert np.asarray(res.swap_rate).min() > 0.2


def test_pt_mala_recovers_bimodal_masses():
    """Exact mode masses on the unequal-depth bimodal target (quadrature
    oracle) — swaps move states across basins while the within-level moves
    are Langevin; the drift clip keeps hot-level drifts bounded."""
    from bayesianinferencedl_tpu.infer.tempering import run_pt_mala

    misfit, mass_right, mean = _bimodal_setup()
    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pt_mala(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=8000, n_burn=2000, step=0.05, n_temps=5, lambda_min=0.02,
    )
    s = np.asarray(res.samples).reshape(-1)
    est_mass = float((s > 0).mean())
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(s.mean() - mean) < 0.1
    # cold chains hop modes (that's the tempering, not the Langevin drift)
    s_chain = np.asarray(res.samples)[..., 0]
    assert (np.sign(s_chain[1:]) != np.sign(s_chain[:-1])).mean() > 1e-3


def test_pt_mala_resume_shape_contract():
    from bayesianinferencedl_tpu.infer.tempering import run_pt_mala

    prior = GaussianPrior.iid(2, dtype=jnp.float64)
    misfit = lambda t: 0.5 * jnp.sum(t * t, -1)
    theta0 = prior.sample(jax.random.PRNGKey(0), (8,))
    res = run_pt_mala(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=50, n_burn=10, n_temps=3, batched=True,
    )
    assert res.theta.shape == (3, 8, 2)
    assert res.step.shape == (3, 8)
    # resume with the saved ladder: accepted
    res2 = run_pt_mala(
        misfit, prior, res.theta, jax.random.PRNGKey(2),
        n_steps=20, n_burn=0, step=res.step, n_temps=3, batched=True,
    )
    assert res2.samples.shape == (20, 8, 2)
    # wrong ladder size: clear error naming the contract
    import pytest

    with pytest.raises(ValueError, match="resumed with the ladder size"):
        run_pt_mala(
            misfit, prior, res.theta, jax.random.PRNGKey(2),
            n_steps=20, n_burn=0, n_temps=4, batched=True,
        )


def test_sharded_pt_mala_custom_linear_solve_likelihood():
    """Mesh path with a custom_linear_solve likelihood (the production
    differentiable forward) — must run with vma checking disabled, like
    sharded_mala (tests/test_mala.py)."""
    from jax.sharding import Mesh

    from bayesianinferencedl_tpu.parallel.sharding import sharded_pt_mala

    mesh = Mesh(np.array(jax.devices()), ("devices",))
    rng = np.random.default_rng(3)
    M = jnp.asarray(rng.standard_normal((4, 4)))
    A0 = M @ M.T + 4.0 * jnp.eye(4)
    data = jnp.asarray(rng.standard_normal(4))
    prior = GaussianPrior.iid(4, sigma=0.8, dtype=jnp.float64)

    def fwd(t):
        A = A0 + jnp.diag(jnp.exp(t))
        solve = lambda mv, b: jnp.linalg.solve(A, b)
        return jax.lax.custom_linear_solve(
            lambda v: A @ v, jnp.ones(4, jnp.float64), solve=solve, symmetric=True
        )

    misfit = gaussian_misfit(fwd, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    res = sharded_pt_mala(
        mesh, misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=300, n_burn=100, n_temps=3,
    )
    assert res.samples.shape == (200, 32, 4)
    assert np.isfinite(np.asarray(res.samples)).all()
    assert res.swap_rate.shape == (2,)
    assert 0.2 < float(np.mean(np.asarray(res.accept_rate))) <= 1.0


def test_pt_da_mala_inner_exact_bimodal_masses():
    """Tempered DA with GRADIENT-INFORMED subchains (inner='mala'): same
    biased-coarse bimodal oracle as the pCN-inner test — the tempered MALA
    subchain kernel is reversible w.r.t. each level's coarse target, so the
    fine correction still recovers the exact fine masses."""
    from bayesianinferencedl_tpu.infer.tempering import run_pt_da

    misfit_f, mass_right, mean = _bimodal_setup()

    a, s = 1.6, 0.12  # same wells, depth 0 -> wrong relative mass

    def misfit_c(t):
        q1 = (t[..., 0] - a) ** 2 / (2 * s**2)
        q2 = (t[..., 0] + a) ** 2 / (2 * s**2)
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))
    res = run_pt_da(
        misfit_f, misfit_c, prior, theta0, jax.random.PRNGKey(3),
        n_steps=4000, n_burn=1000, beta=0.05, subchain=4, n_temps=5,
        lambda_min=0.02, inner="mala",
    )
    s_da = np.asarray(res.samples).reshape(-1)
    est_mass = float((s_da > 0).mean())
    assert abs(est_mass - mass_right) < 0.05, (est_mass, mass_right)
    assert abs(s_da.mean() - mean) < 0.1
    s_chain = np.asarray(res.samples)[..., 0]
    assert (np.sign(s_chain[1:]) != np.sign(s_chain[:-1])).mean() > 1e-3
    out_acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.15 < out_acc < 0.9999


# --- adaptive temperature ladder (adapt_ladder) ------------------------------


def test_adaptive_ladder_repairs_bad_ladder():
    """Start from a deliberately too-narrow ladder (lambda_min=0.5: every
    level nearly cold). On a 2-D unequal-depth bimodal target — where a pCN
    proposal cannot tunnel directly (it must land in a (0.1)^2 basin 5 sigma
    away in BOTH coordinates, unlike the 1-D toy where beta ~ 0.5 proposals
    reach the other well) — the fixed bad ladder keeps the initialization
    mode split while adapt_ladder deepens the ladder during burn-in and
    recovers the quadrature-oracle mass."""
    a, s, depth = 2.5, 0.15, 1.0

    def misfit(t):
        q1 = jnp.sum((t - a) ** 2, -1) / (2 * s**2)
        q2 = jnp.sum((t + a) ** 2, -1) / (2 * s**2) + depth
        return -jax.scipy.special.logsumexp(jnp.stack([-q1, -q2], -1), axis=-1)

    # oracle mass of the +a mode: by symmetry of the two Gaussian wells,
    # posterior mode weights are w1 : w2 = 1 : exp(-depth) exactly (equal
    # covariances, centers mirror-imaged through the prior mean)
    mass_right = 1.0 / (1.0 + np.exp(-depth))

    prior = GaussianPrior.iid(2, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (64,))

    res_ad = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=9000, n_burn=4000, beta=0.3, n_temps=6, lambda_min=0.5,
        adapt_ladder=True, batched=True,
    )
    s_ad = np.asarray(res_ad.samples)[..., 0].reshape(-1)
    est = float((s_ad > 0).mean())
    assert abs(est - mass_right) < 0.08, (est, mass_right)
    lam = np.asarray(res_ad.lambdas)
    # the ladder deepened by an order of magnitude and stays sorted, cold=1
    assert lam[0].max() < 0.1
    np.testing.assert_allclose(lam[-1], 1.0)
    assert (np.diff(lam, axis=0) > 0).all()

    res_fx = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=9000, n_burn=4000, beta=0.3, n_temps=6, lambda_min=0.5,
        batched=True,
    )
    # fixed bad ladder: every level is essentially cold, so no state ever
    # CHANGES modes after the burn-in descent — swaps only shuttle the
    # frozen ~50/50 pool of initialization-assigned states up and down the
    # ladder (cold-chain sign flips happen, but the kept mass stays at the
    # descent split, far from the 0.73 oracle). This is exactly the failure
    # the adapted run above repairs.
    s_fx = np.asarray(res_fx.samples)[..., 0].reshape(-1)
    est_fx = float((s_fx > 0).mean())
    assert abs(est_fx - mass_right) > 0.12, (est_fx, mass_right)


def test_adaptive_ladder_unimodal_unbiased():
    """Ladder adaptation freezes after burn-in, so the cold level still
    matches the analytic posterior exactly (no adaptation bias leaks in)."""
    d, m, sigma, prior_sigma = 3, 4, 0.5, 1.0
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((m, d)))
    data = jnp.asarray(rng.standard_normal(m))
    prior = GaussianPrior.iid(d, mean=0.0, sigma=prior_sigma, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(H.T @ H) / sigma**2 + np.eye(d) / prior_sigma**2)
    mu = Cpost @ np.asarray(H.T @ data) / sigma**2

    misfit = gaussian_misfit(lambda t: H @ t, data, sigma)
    theta0 = prior.sample(jax.random.PRNGKey(0), (64,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(1),
        n_steps=6000, n_burn=1500, beta=0.4, n_temps=4, lambda_min=0.1,
        adapt_ladder=True,
    )
    samples = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), Cpost, atol=0.06)


def test_adaptive_ladder_resume_roundtrip():
    """PTResult.lambdas feeds back through ladder= and the resumed run keeps
    the adapted ladder (per-group (K, G) shapes all the way through)."""
    misfit, _, _ = _bimodal_setup()
    prior = GaussianPrior.iid(1, mean=0.0, sigma=1.0, dtype=jnp.float64)
    theta0 = prior.sample(jax.random.PRNGKey(2), (16,))
    res = run_pt_pcn(
        misfit, prior, theta0, jax.random.PRNGKey(3),
        n_steps=600, n_burn=400, n_temps=4, lambda_min=0.5, adapt_ladder=True,
    )
    assert res.lambdas.shape == (4, 16)
    res2 = run_pt_pcn(
        misfit, prior, res.theta, jax.random.PRNGKey(4),
        n_steps=100, n_burn=0, n_temps=4, ladder=res.lambdas,
    )
    np.testing.assert_allclose(np.asarray(res2.lambdas), np.asarray(res.lambdas))
    assert res2.samples.shape == (100, 16, 1)
