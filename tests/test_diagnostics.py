"""Rank-normalized split diagnostics (Vehtari et al. 2021; SURVEY.md §4
posterior-quality oracles — the estimators that do NOT flatter a multimodal
posterior, unlike plain Gelman-Rubin / per-chain-summed ESS)."""

import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.diagnostics import (
    effective_sample_size,
    ess_bulk,
    rhat,
    split_rhat,
)


def _rng():
    return np.random.default_rng(0)


def test_iid_chains_ess_near_total_and_rhat_one():
    x = jnp.asarray(_rng().standard_normal((1000, 8, 3)))
    ess = np.asarray(ess_bulk(x))
    assert np.all(ess > 0.6 * 8000) and np.all(ess < 2.0 * 8000)
    r = np.asarray(split_rhat(x))
    assert np.all(np.abs(r - 1.0) < 0.01)


def test_stuck_chains_expose_per_chain_ess_flattery():
    """Chains parked in two separated modes: the per-chain-summed estimator
    reports near-full ESS (each chain looks white), the combined
    between-chain estimator must collapse it."""
    rng = _rng()
    modes = np.repeat([[-3.0], [3.0]], 4, axis=0).T  # (1, 8)
    y = jnp.asarray(
        modes[None].repeat(1000, 0).reshape(1000, 8, 1)
        + 0.1 * rng.standard_normal((1000, 8, 1))
    )
    ess_old = float(effective_sample_size(y)[0])
    ess_new = float(ess_bulk(y)[0])
    assert ess_old > 4000  # the flattery
    assert ess_new < 100  # the honest figure
    assert float(split_rhat(y)[0]) > 1.1


def test_split_rhat_catches_within_chain_drift():
    """Identical trending chains: cross-chain variance is zero so plain
    Gelman-Rubin sees nothing; splitting makes the drift visible."""
    rng = _rng()
    t = np.linspace(-3, 3, 1000)[:, None, None].repeat(8, 1)
    z = jnp.asarray(t + 0.1 * rng.standard_normal((1000, 8, 1)))
    assert float(rhat(z)[0]) < 1.01  # blind
    assert float(split_rhat(z)[0]) > 1.1  # caught


def test_ar1_ess_matches_theory():
    """AR(1) with rho=0.9: ESS = N (1-rho)/(1+rho) within ~25%."""
    rho = 0.9
    rng = _rng()
    e = rng.standard_normal((2000, 8))
    ar = np.zeros((2000, 8))
    for i in range(1, 2000):
        ar[i] = rho * ar[i - 1] + np.sqrt(1 - rho**2) * e[i]
    ess = float(ess_bulk(jnp.asarray(ar)))
    expect = 16000 * (1 - rho) / (1 + rho)
    assert 0.75 * expect < ess < 1.35 * expect


def test_production_scale_draws_stay_finite():
    """~16.8M pooled draws: above ~1e7 the top-rank blom quantile
    (r + 0.625)/(N + 0.25) rounds to 1.0 in f32 and ndtri(1.0) = +inf
    NaN'd every production R-hat/ESS (round-3 bench regression). The
    complementary-rank formulation must stay finite and calibrated."""
    x = jnp.asarray(
        _rng().standard_normal((4096, 4096, 1)).astype(np.float32)
    )
    r = float(split_rhat(x)[0])
    assert np.isfinite(r) and abs(r - 1.0) < 0.01
    ess = float(ess_bulk(x)[0])
    n_total = 4096 * 4096
    assert np.isfinite(ess) and 0.5 * n_total < ess < 2.0 * n_total


def test_rank_normalize_complement_matches_f64_oracle():
    """The two-branch (lower/complementary) rank map must agree with a
    straight f64 blom + ndtri computation."""
    from scipy.special import ndtri as ndtri64

    from bayesianinferencedl_tpu.infer.diagnostics import _rank_normalize_2d

    x = _rng().standard_normal((313, 7))
    z = np.asarray(_rank_normalize_2d(jnp.asarray(x)))
    flat = x.reshape(-1)
    ranks = np.argsort(np.argsort(flat))
    u = (ranks + 1.0 - 0.375) / (flat.size + 0.25)
    z_ref = ndtri64(u).reshape(313, 7)
    np.testing.assert_allclose(z, z_ref, rtol=0, atol=5e-5)


def test_heavy_tail_robustness():
    """Cauchy chains: rank normalization keeps the estimators finite and
    calibrated where moment-based ones blow up."""
    x = jnp.asarray(_rng().standard_t(df=1, size=(1000, 8, 2)))
    r = np.asarray(split_rhat(x))
    assert np.all(np.isfinite(r)) and np.all(r < 1.02)
    ess = np.asarray(ess_bulk(x))
    assert np.all(np.isfinite(ess)) and np.all(ess > 0.3 * 8000)


def test_ess_tail_iid_near_total():
    from bayesianinferencedl_tpu.infer.diagnostics import ess_tail

    x = jnp.asarray(_rng().standard_normal((1000, 8, 2)))
    et = np.asarray(ess_tail(x))
    assert et.shape == (2,)
    # indicator series of iid draws are iid: tail ESS ~ total draws
    assert np.all(et > 0.4 * 8000) and np.all(et < 2.0 * 8000)
    # (n, c) squeeze contract
    assert np.asarray(ess_tail(x[..., 0])).shape == ()


def test_ess_tail_catches_slow_tails_bulk_misses():
    """Center mixes white, but tail excursions arrive in rare PERSISTENT
    bursts (Markov regime: enter w.p. 5e-4, exit w.p. 0.02 -> ~2% occupancy,
    mean burst length 50). The burst mass sits above the 95% pooled
    quantile, so the exceedance indicator is persistently pinned during a
    burst while the bulk ranks barely move — tail ESS must collapse well
    below bulk ESS (the regime interval estimates care about; Vehtari et
    al. 2021 §4.3)."""
    from bayesianinferencedl_tpu.infer.diagnostics import ess_tail

    rng = _rng()
    n, c = 2000, 8
    x = rng.standard_normal((n, c))
    u = rng.random((n, c))
    state = np.zeros((n, c), bool)
    s = np.zeros(c, bool)
    for t in range(n):
        s = np.where(s, u[t] > 0.02, u[t] < 5e-4)
        state[t] = s
    x = np.where(state, 6.0 + rng.standard_normal((n, c)), x)
    xj = jnp.asarray(x[..., None])
    eb = float(ess_bulk(xj)[0])  # ~1400: the center is nearly white
    et = float(ess_tail(xj)[0])  # ~440: the tail is burst-limited
    assert et < 0.4 * eb, (eb, et)
    assert et < 600


def test_ess_tail_stuck_chains_collapse():
    from bayesianinferencedl_tpu.infer.diagnostics import ess_tail

    rng = _rng()
    modes = np.repeat([[-3.0], [3.0]], 4, axis=0).T
    y = jnp.asarray(
        modes[None].repeat(1000, 0).reshape(1000, 8, 1)
        + 0.1 * rng.standard_normal((1000, 8, 1))
    )
    # chains never exchange tail mass: < 5% of the nominal 8000
    assert float(ess_tail(y)[0]) < 400
