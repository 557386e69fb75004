"""Reduced-space PCG online solve (the MCMC hot-loop path) vs Cholesky."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.rom import ReducedOperator, generate_snapshots, pod_basis
from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform


@pytest.fixture(scope="module")
def rom(op_r1_f64):
    ks = sample_log_uniform(jax.random.PRNGKey(0), 48)
    S = generate_snapshots(op_r1_f64, ks, tol=1e-12)
    return ReducedOperator.project(op_r1_f64, pod_basis(S, 20).V)


def test_solve_pcg_matches_cholesky(rom):
    P0 = rom.preconditioner()
    ks = jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (32, 5)) * 0.6)
    y_cho = rom.forward_batch(ks)
    ff = rom.fast_forward(P0, 25)
    y_pcg = jax.vmap(ff)(ks)
    rel = float(jnp.linalg.norm(y_pcg - y_cho) / jnp.linalg.norm(y_cho))
    assert rel < 1e-9  # f64 on CPU: PCG converges essentially exactly


def test_solve_pcg_iteration_accuracy_monotone(rom):
    P0 = rom.preconditioner()
    k = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (5,)) * 0.6)
    y_ref = rom.forward(k)
    errs = [
        float(jnp.linalg.norm(rom.fast_forward(P0, it)(k) - y_ref)) for it in [3, 8, 15]
    ]
    assert errs[0] > errs[2]
    assert errs[2] < 1e-10


def test_preconditioner_at_reference_is_exact(rom):
    """At k = k_ref a single application of P0 solves the system exactly."""
    P0 = rom.preconditioner()
    y1 = rom.fast_forward(P0, 1)(jnp.ones(5))
    y_ref = rom.forward(jnp.ones(5))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_ref), rtol=1e-10)


def test_fast_forward_differentiable(rom):
    P0 = rom.preconditioner()
    ff = rom.fast_forward(P0, 20)
    g = jax.grad(lambda t: jnp.sum(ff(jnp.exp(t))))(jnp.zeros(5))
    assert np.isfinite(np.asarray(g)).all()


def test_fast_forward_precision_plumbing(rom):
    """precision argument threads through (on CPU both give f64-exact
    results; this pins the API, the TPU behavior is measured in docs)."""
    import jax as _jax

    P0 = rom.preconditioner()
    y_hi = rom.fast_forward(P0, 25, None)(jnp.ones(5))
    y_fast = rom.fast_forward(P0, 25, _jax.lax.Precision.DEFAULT)(jnp.ones(5))
    np.testing.assert_allclose(np.asarray(y_hi), np.asarray(y_fast), rtol=1e-10)


def test_online_precision_ladder_plumbing():
    """ROMConfig.online_precision maps to the right matmul precision tier and
    reaches the Pipeline (the measured 1x/1.9x/2.6x ladder is TPU-only; on
    CPU all tiers compute identically, so this pins the plumbing)."""
    import jax

    from bayesianinferencedl_tpu.api import _online_precision

    assert _online_precision("highest") is None
    assert _online_precision("high") is jax.lax.Precision.HIGH
    assert _online_precision("fast") is jax.lax.Precision.DEFAULT
