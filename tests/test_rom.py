"""ROM subsystem tests (SURVEY.md §4: 'ROM vs FOM' oracle rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem.solve import forward, solve_fom
from bayesianinferencedl_tpu.rom import ReducedOperator, generate_snapshots, greedy_basis, pod_basis
from bayesianinferencedl_tpu.rom.pod import orthonormality_error
from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform


@pytest.fixture(scope="module")
def rom_setup(op_r1_f64):
    op = op_r1_f64
    key = jax.random.PRNGKey(42)
    ks = sample_log_uniform(key, 64)
    S = generate_snapshots(op, ks, tol=1e-12)
    return op, ks, S


def test_snapshots_batch_matches_single(rom_setup):
    op, ks, S = rom_setup
    u0 = solve_fom(op, ks[0], tol=1e-12, maxiter=3000)
    np.testing.assert_allclose(np.asarray(S[0]), np.asarray(u0), rtol=1e-10, atol=1e-12)


def test_snapshot_chunking(rom_setup):
    op, ks, S = rom_setup
    S2 = generate_snapshots(op, ks[:10], tol=1e-12, chunk=4)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S[:10]), rtol=1e-9, atol=1e-11)


def test_pod_orthonormal(rom_setup):
    _, _, S = rom_setup
    V = pod_basis(S, 20).V
    assert float(orthonormality_error(V)) < 1e-10


def test_pod_reconstruction_improves_with_r(rom_setup):
    _, _, S = rom_setup
    errs = []
    for r in [2, 5, 10, 20]:
        V = pod_basis(S, r).V
        proj = (S @ V) @ V.T
        errs.append(float(jnp.linalg.norm(S - proj) / jnp.linalg.norm(S)))
    assert all(a > b for a, b in zip(errs, errs[1:]))
    # wide log-uniform [0.1,10]^5 parameter range -> moderate Kolmogorov decay
    assert errs[-1] < 1e-3


def test_projection_matches_direct(rom_setup):
    """Galerkin-projected affine operators equal direct projection of the
    materialized matrix — affine-ROM vs dense-assembled ROM equality
    (SURVEY.md §4)."""
    op, _, S = rom_setup
    V = pod_basis(S, 8).V
    rom = ReducedOperator.project(op, V)
    k = jnp.asarray([0.7, 1.3, 2.0, 0.5, 1.1])
    A_dense = op.materialize(k)
    Ahat_ref = V.T @ (A_dense @ V)
    np.testing.assert_allclose(np.asarray(rom.assemble(k)), np.asarray(Ahat_ref), atol=1e-10)


def test_rom_error_decays_with_r(rom_setup):
    op, _, S = rom_setup
    key = jax.random.PRNGKey(7)
    k_test = sample_log_uniform(key, 16)
    y_fom = jax.vmap(lambda k: forward(op, k, tol=1e-12, maxiter=3000))(k_test)
    errs = []
    for r in [3, 8, 16, 32]:
        rom = ReducedOperator.project(op, pod_basis(S, r).V)
        y_rom = rom.forward_batch(k_test)
        rel = jnp.linalg.norm(y_rom - y_fom) / jnp.linalg.norm(y_fom)
        errs.append(float(rel))
    assert all(a >= b * 0.5 for a, b in zip(errs, errs[1:])), errs  # roughly decaying
    assert errs[-1] < 1e-4, errs


def test_residual_indicator_correlates(rom_setup):
    """Residual-norm indicator is (near) zero at snapshot parameters and
    positive away from them."""
    op, ks, S = rom_setup
    rom = ReducedOperator.project(op, pod_basis(S, 40).V)
    at_snap = float(rom.residual_norm(op, ks[0]))
    far = float(rom.residual_norm(op, jnp.asarray([9.9, 0.11, 9.7, 0.12, 5.0])))
    assert at_snap < far


def test_greedy_basis(rom_setup):
    op, ks, _ = rom_setup
    res = greedy_basis(op, ks, r=10, tol=1e-12)
    V = res.V
    assert V.shape[1] == 10
    assert float(orthonormality_error(V)) < 1e-8
    # indicators should broadly decrease
    assert res.indicators[-1] < res.indicators[1]
    # greedy ROM achieves decent accuracy
    rom = ReducedOperator.project(op, V)
    key = jax.random.PRNGKey(3)
    k_test = sample_log_uniform(key, 8)
    y_fom = jax.vmap(lambda k: forward(op, k, tol=1e-12, maxiter=3000))(k_test)
    y_rom = rom.forward_batch(k_test)
    rel = float(jnp.linalg.norm(y_rom - y_fom) / jnp.linalg.norm(y_fom))
    assert rel < 0.1


def test_rom_forward_differentiable(rom_setup):
    op, _, S = rom_setup
    rom = ReducedOperator.project(op, pod_basis(S, 16).V)
    d = rom.forward(jnp.ones(5))

    def J(k):
        return 0.5 * jnp.sum((rom.forward(k) - d) ** 2)

    k0 = jnp.asarray([0.8, 1.2, 1.0, 0.9, 1.1])
    g = np.asarray(jax.grad(J)(k0))
    eps = 1e-6
    for i in range(5):
        kp = np.asarray(k0).copy()
        km = np.asarray(k0).copy()
        kp[i] += eps
        km[i] -= eps
        fd = (float(J(jnp.asarray(kp))) - float(J(jnp.asarray(km)))) / (2 * eps)
        assert abs(g[i] - fd) < 1e-6 * max(1.0, abs(fd))
