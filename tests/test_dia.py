"""Stencil (DIA) operator tests: gather-free layout must match the ELL
operator and the SciPy oracle exactly (fem/dia.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem import oracle
from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.fem.solve import solve_fom

K_TEST = np.array([0.4, 1.7, 3.1, 0.9, 1.2])
BIOT = 0.1


@pytest.fixture(scope="module")
def dia_r1(mesh_r1):
    host = assemble_fin_dia(mesh_r1, pad_to=8)
    return host, StencilOperator.from_host(host, biot=BIOT, dtype=jnp.float64)


def test_stencil_matvec_matches_scipy(mesh_r1, dia_r1):
    host, op = dia_r1
    # map compacted-node vector into the full grid to compare
    n_res = mesh_r1.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj

    rng = np.random.default_rng(0)
    u_c = rng.standard_normal(mesh_r1.n_nodes)
    u_full = np.zeros(op.n)
    u_full[gid] = u_c

    A_ref = oracle.system_matrix(mesh_r1, K_TEST, BIOT)
    y_ref = A_ref @ u_c

    y = np.asarray(op.apply(jnp.asarray(K_TEST), jnp.asarray(u_full)))
    np.testing.assert_allclose(y[gid], y_ref, atol=1e-11)


def test_stencil_solve_matches_scipy(mesh_r1, dia_r1):
    host, op = dia_r1
    n_res = mesh_r1.resolution
    ny = 16 * n_res
    h = 0.25 / n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj

    u_ref = oracle.solve(mesh_r1, K_TEST, BIOT)
    u = np.asarray(solve_fom(op, jnp.asarray(K_TEST), tol=1e-12, maxiter=4000))
    rel = np.linalg.norm(u[gid] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-8
    # off-domain grid nodes stay exactly zero (identity rows, zero load)
    mask = np.ones(op.n, bool)
    mask[gid] = False
    np.testing.assert_allclose(u[mask], 0.0, atol=1e-14)


def test_stencil_qoi_matches_ell(mesh_r1, dia_r1, op_r1_f64):
    _, op = dia_r1
    k = jnp.asarray(K_TEST)
    u_dia = solve_fom(op, k, tol=1e-12, maxiter=4000)
    y_dia = np.asarray(op.observe(u_dia))
    from bayesianinferencedl_tpu.fem.solve import forward

    y_ell = np.asarray(forward(op_r1_f64, k, tol=1e-12, maxiter=4000))
    np.testing.assert_allclose(y_dia, y_ell, rtol=1e-9, atol=1e-12)


def test_stencil_spd(dia_r1):
    _, op = dia_r1
    A = np.asarray(op.materialize(jnp.asarray(K_TEST)))
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


def test_stencil_batched_and_differentiable(dia_r1):
    _, op = dia_r1
    ks = jnp.asarray(np.exp(np.random.default_rng(1).normal(0, 0.4, (4, 5))))
    us = jax.vmap(lambda k: solve_fom(op, k, tol=1e-11, maxiter=3000))(ks)
    assert np.isfinite(np.asarray(us)).all()

    d = op.observe(solve_fom(op, jnp.ones(5), tol=1e-11, maxiter=3000))
    g = jax.grad(
        lambda k: jnp.sum((op.observe(solve_fom(op, k, tol=1e-11, maxiter=3000)) - d) ** 2)
    )(jnp.asarray(K_TEST))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0
