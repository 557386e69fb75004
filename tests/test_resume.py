"""Fault-injection test: kill a checkpointed pCN run mid-way and resume; the
resumed samples must be bit-identical to an uninterrupted run
(SURVEY.md §5 'Failure detection / elastic recovery')."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api import run_pcn_checkpointed
from bayesianinferencedl_tpu.infer import GaussianPrior
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit


def _setup():
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((4, 3)))
    data = jnp.asarray(rng.standard_normal(4))
    prior = GaussianPrior.iid(3, sigma=1.0, dtype=jnp.float64)
    misfit = gaussian_misfit(lambda t: H @ t, data, 0.5)
    theta0 = prior.sample(jax.random.PRNGKey(0), (16,))
    return misfit, prior, theta0


def test_resume_bit_identical(tmp_path):
    misfit, prior, theta0 = _setup()
    key = jax.random.PRNGKey(42)

    # uninterrupted run: 1000 steps in 400-step segments, 200 burn
    full = run_pcn_checkpointed(
        misfit, prior, theta0, key,
        n_steps=1000, n_burn=200, segment=400,
        ckpt_path=str(tmp_path / "full.npz"), resume=False,
    )

    # 'crashed' run: dies after the first segment (simulated by asking for
    # only 400 steps), then a second process resumes to 1000
    run_pcn_checkpointed(
        misfit, prior, theta0, key,
        n_steps=400, n_burn=200, segment=400,
        ckpt_path=str(tmp_path / "crash.npz"), resume=False,
    )
    resumed = run_pcn_checkpointed(
        misfit, prior, theta0, key,
        n_steps=1000, n_burn=200, segment=400,
        ckpt_path=str(tmp_path / "crash.npz"), resume=True,
    )

    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.theta), np.asarray(resumed.state.theta))
    np.testing.assert_array_equal(np.asarray(full.beta), np.asarray(resumed.beta))


def test_checkpointed_matches_statistics():
    """Sanity: the segmented sampler still targets the right posterior."""
    misfit, prior, theta0 = _setup()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        res = run_pcn_checkpointed(
            misfit, prior, theta0, jax.random.PRNGKey(1),
            n_steps=3000, n_burn=500, segment=1000,
            ckpt_path=os.path.join(d, "c.npz"), resume=False,
        )
    assert res.samples.shape[0] == 2500
    acc = float(jnp.mean(res.accept_rate))
    assert 0.1 < acc < 0.6  # adapted toward 0.234


def test_da_resume_bit_identical(tmp_path):
    """Same fault-injection contract for the delayed-acceptance sampler: a
    killed run resumed from its checkpoint reproduces the uninterrupted
    run's samples bit-for-bit."""
    from bayesianinferencedl_tpu.api import run_da_checkpointed

    misfit, prior, theta0 = _setup()
    misfit_c = lambda t: misfit(t) * 0.97  # slightly-off surrogate
    key = jax.random.PRNGKey(7)

    full = run_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        n_steps=600, n_burn=150, subchain=4, segment=250,
        ckpt_path=str(tmp_path / "da_full.npz"), resume=False,
    )
    run_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        n_steps=250, n_burn=150, subchain=4, segment=250,
        ckpt_path=str(tmp_path / "da_crash.npz"), resume=False,
    )
    resumed = run_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        n_steps=600, n_burn=150, subchain=4, segment=250,
        ckpt_path=str(tmp_path / "da_crash.npz"), resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.theta), np.asarray(resumed.state.theta))
    np.testing.assert_array_equal(np.asarray(full.beta), np.asarray(resumed.beta))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )


def test_mlda_resume_bit_identical(tmp_path):
    """Same fault-injection contract for the multilevel-DA sampler: a
    killed run resumed from its checkpoint reproduces the uninterrupted
    run's samples bit-for-bit (every rung's misfits re-derive from the
    carried theta, so only theta/beta/key/accumulators hit the disk)."""
    from bayesianinferencedl_tpu.api import run_mlda_checkpointed

    misfit, prior, theta0 = _setup()
    misfit_mid = lambda t: misfit(t) * 0.97
    misfit_base = lambda t: misfit(t) * 0.9
    misfits = (misfit_base, misfit_mid, misfit)
    key = jax.random.PRNGKey(7)

    full = run_mlda_checkpointed(
        misfits, prior, theta0, key,
        n_steps=600, n_burn=150, subchains=(3, 2), segment=250,
        ckpt_path=str(tmp_path / "mlda_full.npz"), resume=False,
    )
    run_mlda_checkpointed(
        misfits, prior, theta0, key,
        n_steps=250, n_burn=150, subchains=(3, 2), segment=250,
        ckpt_path=str(tmp_path / "mlda_crash.npz"), resume=False,
    )
    resumed = run_mlda_checkpointed(
        misfits, prior, theta0, key,
        n_steps=600, n_burn=150, subchains=(3, 2), segment=250,
        ckpt_path=str(tmp_path / "mlda_crash.npz"), resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.theta), np.asarray(resumed.state.theta))
    np.testing.assert_array_equal(np.asarray(full.beta), np.asarray(resumed.beta))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )
    np.testing.assert_allclose(
        np.asarray(full.level_rates), np.asarray(resumed.level_rates)
    )


def test_pt_resume_bit_identical(tmp_path):
    """Kill/resume contract for the HEADLINE parallel-tempered sampler
    (VERDICT r2 item 4): cold-level samples, final (K, G, d) ladder states,
    and adapted per-level betas must be bit-identical to an uninterrupted
    run."""
    from bayesianinferencedl_tpu.api import run_pt_checkpointed

    misfit, prior, theta0 = _setup()
    key = jax.random.PRNGKey(3)
    kw = dict(n_steps=800, n_burn=200, n_temps=3, lambda_min=0.1, segment=200)

    full = run_pt_checkpointed(
        misfit, prior, theta0, key,
        ckpt_path=str(tmp_path / "pt_full.npz"), resume=False, **kw,
    )
    run_pt_checkpointed(
        misfit, prior, theta0, key,
        n_steps=400, n_burn=200, n_temps=3, lambda_min=0.1, segment=200,
        ckpt_path=str(tmp_path / "pt_crash.npz"), resume=False,
    )
    resumed = run_pt_checkpointed(
        misfit, prior, theta0, key,
        ckpt_path=str(tmp_path / "pt_crash.npz"), resume=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.theta), np.asarray(resumed.theta))
    np.testing.assert_array_equal(np.asarray(full.beta), np.asarray(resumed.beta))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )
    np.testing.assert_allclose(np.asarray(full.swap_rate), np.asarray(resumed.swap_rate))


def test_pt_da_resume_bit_identical(tmp_path):
    """Kill/resume for tempered delayed acceptance (the expensive
    exact-FOM-posterior runs are the ones worth protecting)."""
    from bayesianinferencedl_tpu.api import run_pt_da_checkpointed

    misfit, prior, theta0 = _setup()
    misfit_c = lambda t: misfit(t) * 0.95
    key = jax.random.PRNGKey(9)
    kw = dict(n_steps=300, n_burn=100, subchain=3, n_temps=3, lambda_min=0.1, segment=100)

    full = run_pt_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        ckpt_path=str(tmp_path / "ptda_full.npz"), resume=False, **kw,
    )
    run_pt_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        n_steps=100, n_burn=100, subchain=3, n_temps=3, lambda_min=0.1, segment=100,
        ckpt_path=str(tmp_path / "ptda_crash.npz"), resume=False,
    )
    resumed = run_pt_da_checkpointed(
        misfit, misfit_c, prior, theta0, key,
        ckpt_path=str(tmp_path / "ptda_crash.npz"), resume=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.theta), np.asarray(resumed.theta))
    np.testing.assert_array_equal(np.asarray(full.beta), np.asarray(resumed.beta))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )
    assert full.n_fine_evals == resumed.n_fine_evals


def test_mala_resume_bit_identical(tmp_path):
    """Kill/resume contract for the gradient-based sampler: samples, final
    working-coordinate states, and adapted per-chain step sizes must be
    bit-identical to an uninterrupted run."""
    from bayesianinferencedl_tpu.api import run_mala_checkpointed

    misfit, prior, theta0 = _setup()
    key = jax.random.PRNGKey(13)
    kw = dict(n_steps=1000, n_burn=200, segment=400)

    full = run_mala_checkpointed(
        misfit, prior, theta0, key,
        ckpt_path=str(tmp_path / "m_full.npz"), resume=False, **kw,
    )
    run_mala_checkpointed(
        misfit, prior, theta0, key,
        n_steps=400, n_burn=200, segment=400,
        ckpt_path=str(tmp_path / "m_crash.npz"), resume=False,
    )
    resumed = run_mala_checkpointed(
        misfit, prior, theta0, key,
        ckpt_path=str(tmp_path / "m_crash.npz"), resume=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.state.y), np.asarray(resumed.state.y))
    np.testing.assert_array_equal(np.asarray(full.step), np.asarray(resumed.step))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )


def test_pt_checkpointed_rejects_odd_segment(tmp_path):
    from bayesianinferencedl_tpu.api import run_pt_checkpointed

    misfit, prior, theta0 = _setup()
    import pytest

    with pytest.raises(ValueError, match="even"):
        run_pt_checkpointed(
            misfit, prior, theta0, jax.random.PRNGKey(0),
            n_steps=10, segment=5, ckpt_path=str(tmp_path / "x.npz"),
        )


def test_checkpointed_burn_only_returns_empty_arrays(tmp_path):
    """A burn-only run (n_steps == n_burn) must return well-formed empty
    sample arrays, not None — downstream consumers call .shape on them."""
    from bayesianinferencedl_tpu.api import run_da_checkpointed, run_pcn_checkpointed

    misfit, prior, theta0 = _setup()
    res = run_pcn_checkpointed(
        misfit, prior, theta0, jax.random.PRNGKey(0),
        n_steps=100, n_burn=100, segment=50,
        ckpt_path=str(tmp_path / "b.npz"), resume=False,
    )
    assert res.samples.shape == (0, 16, 3)
    assert res.phi_trace.shape == (0, 16)
    res_da = run_da_checkpointed(
        misfit, lambda t: misfit(t) * 0.9, prior, theta0, jax.random.PRNGKey(1),
        n_steps=60, n_burn=60, subchain=2, segment=30,
        ckpt_path=str(tmp_path / "bd.npz"), resume=False,
    )
    assert res_da.samples.shape == (0, 16, 3)


def test_hmc_resume_bit_identical(tmp_path):
    """Same fault-injection contract for the trajectory sampler: a killed
    HMC run resumed from its checkpoint reproduces the uninterrupted run's
    samples bit-for-bit (shared _gradient_checkpointed driver)."""
    from bayesianinferencedl_tpu.api import run_hmc_checkpointed

    misfit, prior, theta0 = _setup()
    key = jax.random.PRNGKey(11)

    full = run_hmc_checkpointed(
        misfit, prior, theta0, key,
        n_steps=600, n_burn=150, n_leap=4, segment=250,
        ckpt_path=str(tmp_path / "hmc_full.npz"), resume=False,
    )
    run_hmc_checkpointed(
        misfit, prior, theta0, key,
        n_steps=250, n_burn=150, n_leap=4, segment=250,
        ckpt_path=str(tmp_path / "hmc_crash.npz"), resume=False,
    )
    resumed = run_hmc_checkpointed(
        misfit, prior, theta0, key,
        n_steps=600, n_burn=150, n_leap=4, segment=250,
        ckpt_path=str(tmp_path / "hmc_crash.npz"), resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))
    np.testing.assert_array_equal(np.asarray(full.step), np.asarray(resumed.step))
    np.testing.assert_allclose(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )
