"""Aux-carrying pCN (run_pcn_aux): correctness against run_pcn on a target
where the aux is just the forward value."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer import GaussianPrior
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn, run_pcn_aux


def test_run_pcn_aux_matches_statistics():
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((4, 3)))
    data = jnp.asarray(rng.standard_normal(4))
    prior = GaussianPrior.iid(3, sigma=1.0, dtype=jnp.float64)
    sigma = 0.5

    def mis_aux(props, aux):
        y = props @ H.T
        r = y - data
        return 0.5 * jnp.sum(r * r, axis=-1) / sigma**2, y  # aux = forward values

    theta0 = prior.sample(jax.random.PRNGKey(0), (32,))
    aux0 = jnp.zeros((32, 4), jnp.float64)
    res, aux = run_pcn_aux(
        mis_aux, prior, theta0, aux0, jax.random.PRNGKey(1),
        n_steps=4000, n_burn=1000, beta=0.4,
    )
    # aux tracks the accepted states' forward values exactly
    np.testing.assert_allclose(
        np.asarray(aux), np.asarray(res.state.theta @ H.T), atol=1e-12
    )
    # same posterior as the plain sampler
    mis = gaussian_misfit(lambda t: H @ t, data, sigma)
    ref = run_pcn(mis, prior, theta0, jax.random.PRNGKey(2), n_steps=4000, n_burn=1000, beta=0.4)
    m1 = np.asarray(res.samples).reshape(-1, 3).mean(0)
    m2 = np.asarray(ref.samples).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(m1, m2, atol=0.08)
    assert 0.1 < float(res.accept_rate.mean()) < 0.6
