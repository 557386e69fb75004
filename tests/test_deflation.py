"""Two-level deflation preconditioner (ops/deflation.py): Galerkin coarse
components against a dense oracle, and the deflated fused kernels against
SciPy with a measured iteration cut (SURVEY.md §2b PETSc row, §7 hard-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bayesianinferencedl_tpu.fem import oracle
from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.ops.deflation import DeflationBasis
from bayesianinferencedl_tpu.ops.pcg_stencil import solve_fom_stencil_pallas

BIOT = 0.1


@pytest.fixture(scope="module")
def setup(mesh_r1):
    host = assemble_fin_dia(mesh_r1, pad_to=128)
    op = StencilOperator.from_host(host, biot=BIOT, dtype=jnp.float32)
    defl = DeflationBasis.create(host, biot=BIOT, m=64)
    return host, op, defl


def test_coarse_matrices_match_dense_galerkin(setup):
    """B(k) assembled from the affine components must equal W^T A(k) W."""
    host, op, defl = setup
    k = jnp.asarray([0.5, 2.0, 1.3, 0.2, 3.1], jnp.float32)
    A = np.asarray(op.materialize(k), np.float64)
    W = np.asarray(defl.Wt, np.float64).T
    B_ref = W.T @ A @ W
    B = np.asarray(defl.coarse_matrices(k[None], BIOT)[0], np.float64)
    np.testing.assert_allclose(B, B_ref, rtol=2e-5, atol=2e-5)


def test_basis_orthonormal_and_domain_masked(setup):
    host, op, defl = setup
    W = np.asarray(defl.Wt, np.float64).T
    np.testing.assert_allclose(W.T @ W, np.eye(defl.m), atol=1e-5)
    # rows outside the stiffness domain are exactly zero
    As, _ = host.to_scipy_components()
    mask = sum(A.diagonal() for A in As) > 0
    assert np.all(W[~mask] == 0.0)


def test_deflated_kernels_match_scipy_with_fewer_iters(mesh_r1, setup):
    host, op, defl = setup
    ks = np.exp(np.random.default_rng(3).normal(0, 0.5, (4, 5))).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        u0, it0 = solve_fom_stencil_pallas(
            op, jnp.asarray(ks), tol=1e-6, maxiter=800, layout="sublanes",
            sample_tile=8,
        )
        u1, it1 = solve_fom_stencil_pallas(
            op, jnp.asarray(ks), tol=1e-6, maxiter=800, layout="sublanes",
            sample_tile=8, deflation=defl,
        )
        u2, it2 = solve_fom_stencil_pallas(
            op, jnp.asarray(ks), tol=1e-6, maxiter=800, layout="lanes",
            sample_tile=128, deflation=defl,
        )
    # >= 2x iteration cut (measured ~3x at res1, 3.3-5.6x at res4-8)
    assert int(it1[0]) * 2 <= int(it0[0])
    assert int(it2[0]) * 2 <= int(it0[0])

    n_res = mesh_r1.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj
    for u in (u1, u2):
        for b in range(4):
            u_ref = oracle.solve(mesh_r1, ks[b], BIOT)
            rel = np.linalg.norm(np.asarray(u[b])[gid] - u_ref) / np.linalg.norm(u_ref)
            assert rel < 5e-5, (b, rel)


def test_deflation_basis_cached_on_fin():
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin

    fin = FiveParamFin.create(resolution=1, biot=BIOT, dtype=jnp.float32)
    d1 = fin.deflation_basis()
    d2 = fin.deflation_basis()
    assert d1 is d2 and d1.m == 128


def test_eig_basis_beats_cosine_iterations(setup):
    """The default eig coarse space must converge in no more PCG iterations
    than the cosine space at equal m (measured ~1.4x fewer on the host,
    1.33x in-kernel at res4-8 — ops/deflation.py module docstring)."""
    import scipy.sparse as sp

    host, op, _ = setup
    As, Mext = host.to_scipy_components()
    mask = sum(A.diagonal() for A in As) > 0
    b = host.F_root.astype(np.float64)

    def pcg_iters(A, W, maxiter=2000, tol=1e-7):
        Dinv = 1.0 / A.diagonal()
        Binv = np.linalg.inv(W.T @ (A @ W))
        x = np.zeros_like(b)
        r = b.copy()
        tol2 = tol * tol * float(r @ r)
        z = Dinv * r + W @ (Binv @ (W.T @ r))
        p = z.copy()
        rz = float(r @ z)
        for it in range(maxiter):
            if float(r @ r) <= tol2:
                return it
            Ap = A @ p
            alpha = rz / float(p @ Ap)
            x += alpha * p
            r -= alpha * Ap
            z = Dinv * r + W @ (Binv @ (W.T @ r))
            rz_new = float(r @ z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        return maxiter

    bases = {
        name: np.asarray(
            DeflationBasis.create(host, biot=BIOT, m=64, basis=name).Wt, np.float64
        ).T
        for name in ("eig", "cosine")
    }
    ks = np.exp(np.random.default_rng(11).uniform(np.log(0.1), np.log(10), (6, 5)))
    its = {name: [] for name in bases}
    for k in ks:
        A = (sum(ki * Ai for ki, Ai in zip(k, As)) + BIOT * Mext
             + sp.diags(np.where(mask, 0.0, 1.0))).tocsr()
        for name, W in bases.items():
            its[name].append(pcg_iters(A, W))
    assert np.mean(its["eig"]) < np.mean(its["cosine"]), its


def test_nonaffine_coarse_projection_matches_dense(setup):
    """coarse_inverses_from_vals (the nodal-operator path) must agree with
    the affine assembly on an affine operator's vals."""
    host, op, defl = setup
    ks = jnp.asarray(
        np.exp(np.random.default_rng(5).normal(0, 0.5, (3, 5))), jnp.float32
    )
    Binv_affine = np.asarray(defl.coarse_inverses(ks, BIOT))
    vals = jax.vmap(op.vals)(ks)
    Binv_generic = np.asarray(defl.coarse_inverses_from_vals(op, vals))
    np.testing.assert_allclose(Binv_affine, Binv_generic, rtol=2e-3, atol=2e-4)


def test_newton_schulz_inverse_accuracy(setup):
    host, op, defl = setup
    ks = jnp.asarray(
        np.exp(np.random.default_rng(6).uniform(np.log(0.1), np.log(10), (4, 5))),
        jnp.float32,
    )
    Bk = np.asarray(defl.coarse_matrices(ks, BIOT), np.float64)
    Xi = np.asarray(defl.coarse_inverses(ks, BIOT), np.float64)
    for b in range(4):
        resid = np.abs(Bk[b] @ Xi[b] - np.eye(defl.m)).max()
        assert resid < 1e-3, resid  # preconditioner-grade is plenty
