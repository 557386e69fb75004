"""SVGD (infer/svgd.py): posterior recovery on linear-Gaussian targets,
segmentation invariance, the annealed multi-basin contract (and the classic
kernel's documented one-basin collapse from a biased start), and the
particle-sharded mesh path (parallel/sharding.sharded_svgd)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.infer.svgd import run_svgd
from bayesianinferencedl_tpu.parallel import device_mesh
from bayesianinferencedl_tpu.parallel.sharding import sharded_svgd


def _linear_gaussian(d=6, sigma=0.5, seed=0, cond=20.0):
    """Anisotropic correlated linear-Gaussian problem + exact posterior
    (the same construction tests/test_vi.py uses)."""
    rng = np.random.default_rng(seed)
    A = jnp.asarray(
        rng.standard_normal((d, d)) * np.geomspace(1.0, cond, d)[None, :],
        jnp.float64,
    )
    data = jnp.asarray(rng.standard_normal(d))
    prior = GaussianPrior.iid(d, sigma=1.0, dtype=jnp.float64)
    Cpost = np.linalg.inv(np.asarray(A.T @ A) / sigma**2 + np.eye(d))
    mu = Cpost @ np.asarray(A.T @ data) / sigma**2

    def misfit(th):  # batched over leading axes
        r = th @ A.T - data
        return 0.5 / sigma**2 * jnp.sum(r * r, axis=-1)

    return misfit, prior, mu, Cpost


def test_svgd_recovers_linear_gaussian_posterior():
    """The ensemble mean lands on the posterior mean and the marginal
    spreads track the exact posterior stds — the particle method's
    moment-level contract (mildly biased spread at finite J is the
    documented behavior; the band below is what J=512 actually delivers)."""
    misfit, prior, mu, Cpost = _linear_gaussian()
    res = run_svgd(
        misfit, prior, jax.random.PRNGKey(1),
        n_particles=512, n_steps=1500, lr=0.05, batched=True,
    )
    np.testing.assert_allclose(np.asarray(res.mean), mu, atol=0.05)
    ratio = np.asarray(res.std) / np.sqrt(np.diag(Cpost))
    assert np.all(ratio > 0.7) and np.all(ratio < 1.3), ratio
    # transport actually happened: data misfit dropped and flattened
    tr = np.asarray(res.misfit_trace)
    assert tr[-1] < 0.2 * tr[0]


def test_svgd_segment_invariant():
    """Segmented execution (the watchdog rule) replays the identical
    trajectory: annealing and lr decay run on the GLOBAL step index."""
    misfit, prior, _, _ = _linear_gaussian(seed=2)
    kw = dict(n_particles=64, n_steps=200, lr=0.05, batched=True)
    a = run_svgd(misfit, prior, jax.random.PRNGKey(3), **kw)
    b = run_svgd(misfit, prior, jax.random.PRNGKey(3), segment=48, **kw)
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(a.misfit_trace), np.asarray(b.misfit_trace), atol=1e-9
    )


def _bimodal_1d(a=2.0, s=0.6, prior_sigma=3.0):
    """G(theta) = theta^2 observed at a^2: exact posterior has symmetric
    modes at +-a under the zero-mean prior."""
    prior = GaussianPrior.iid(1, sigma=prior_sigma, dtype=jnp.float64)

    def misfit(th):
        r = th[..., 0] ** 2 - a * a
        return 0.5 / s**2 * r * r

    return misfit, prior


def test_annealed_svgd_keeps_both_basins():
    """With the likelihood ramp on, particles spread over the prior first
    (repulsion spaces them) and split into BOTH basins as the data term
    switches on — the multimodal contract plain Gaussian fits (ADVI/EKI/
    Laplace) cannot offer."""
    misfit, prior = _bimodal_1d()
    res = run_svgd(
        misfit, prior, jax.random.PRNGKey(5),
        n_particles=128, n_steps=800, lr=0.05, anneal_steps=400, batched=True,
    )
    th = np.asarray(res.particles)[:, 0]
    frac_pos = float((th > 0).mean())
    assert 0.25 < frac_pos < 0.75, frac_pos
    # particles sit AT the modes, not between them
    assert np.abs(np.abs(th) - 2.0).mean() < 0.35


def test_classic_svgd_collapses_from_biased_start():
    """anneal_steps=0 from an ensemble seeded in one basin stays there —
    the documented mode-collapse failure the annealing exists to fix
    (docs/SAMPLERS.md honest contract, measured not assumed)."""
    misfit, prior = _bimodal_1d()
    theta0 = 2.0 + 0.3 * jax.random.normal(
        jax.random.PRNGKey(6), (128, 1), jnp.float64
    )
    res = run_svgd(
        misfit, prior, jax.random.PRNGKey(7),
        n_particles=128, n_steps=800, lr=0.05, anneal_steps=0,
        theta0=theta0, batched=True,
    )
    th = np.asarray(res.particles)[:, 0]
    assert (th > 0).all()


def test_sharded_svgd_matches_single_device():
    """The particle-sharded path (local scores + all-gathered Stein
    direction) reproduces the single-device arithmetic exactly — the
    sharding buys forward-pass FLOPs, never changes the estimator."""
    misfit, prior, _, _ = _linear_gaussian(seed=4)
    mesh = device_mesh()
    kw = dict(n_particles=64, n_steps=150, lr=0.05, batched=True)
    a = run_svgd(misfit, prior, jax.random.PRNGKey(8), **kw)
    b = sharded_svgd(mesh, misfit, prior, jax.random.PRNGKey(8), **kw)
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(a.misfit_trace), np.asarray(b.misfit_trace), atol=1e-8
    )
    assert b.n_forward == a.n_forward
