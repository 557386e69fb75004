"""Prior-hyperparameter selection by model evidence
(api_full_field.select_correlation_length): the RFF correlation length
becomes a measured quantity — SMC evidence per candidate ell on the same
observations, Bayes factors over the hyperparameter."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api_full_field import (
    build_full_field_pipeline,
    select_correlation_length,
)


def test_forward_only_pipeline_builds_fast_and_solves():
    """forward_only=True: no ROM/surrogate (None), but the exact-FOM
    forward, prior, and field map all work."""
    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=8, forward_only=True,
        cg_tol=1e-10, cg_maxiter=2000, use_pallas=False,
    )
    assert pipe.rom is None and pipe.surrogate is None
    z = pipe.prior.sample(jax.random.PRNGKey(0))
    y = pipe.forward_fn("fom")(z)
    assert y.shape == (pipe.op.n_obs,)
    assert bool(jnp.isfinite(y).all())
    yb = pipe.batched_forward_fn("fom")(z[None])
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(y), rtol=1e-8)


def test_select_correlation_length_recovers_truth_pooled():
    """Simulate independent experiments from ell_true and ask the POOLED
    evidence to pick the prior. A single fin dataset (5 scalar obs) cannot
    identify ell — measured: one seed preferred the 5x-too-short candidate
    by 2 nats with a +-4.8 per-dataset spread — but 8 pooled experiments
    pick the truth decisively (measured margins: 12 nats over ell=5.0,
    77 over ell=0.2)."""
    ells = [0.2, 1.0, 5.0]
    out = select_correlation_length(
        ells,
        resolution=1, dtype=jnp.float64, n_features=8,
        noise_sigma=1e-2, ell_true=1.0, n_datasets=8,
        n_particles=512, n_groups=4, n_mutations=5, max_stages=64,
        cg_tol=1e-10, cg_maxiter=2000, seed=0,
    )
    lz = np.asarray(out["log_z"])
    err = np.asarray(out["log_z_std"])
    assert np.isfinite(lz).all()
    i_true = ells.index(1.0)
    # the true model wins by more than the combined error bars
    for i in range(len(ells)):
        if i == i_true:
            continue
        margin = 2.0 * np.sqrt(err[i] ** 2 + err[i_true] ** 2)
        assert lz[i_true] > lz[i] + margin, (lz, err)
    assert out["ell_map"] == 1.0
    post = np.asarray(out["posterior"])
    assert post[i_true] > 0.95, post
