"""Geometric multigrid FCG (experimental/multigrid.py): convergence and exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem import oracle
from bayesianinferencedl_tpu.experimental.multigrid import MGHierarchy, prolong, restrict, stencil_apply
from bayesianinferencedl_tpu.geometry import build_fin_mesh

K_TEST = np.array([0.4, 1.7, 3.1, 0.9, 1.2])


def test_transfer_operators():
    """Prolongation reproduces linear functions exactly; restriction is
    (up to scaling) its transpose-like full weighting."""
    Xc, Yc = 9, 7
    x = jnp.arange(Xc, dtype=jnp.float64)[:, None] * jnp.ones((1, Yc))
    fine = prolong(x, (2 * Xc - 1, 2 * Yc - 1))
    expect = 0.5 * jnp.arange(2 * Xc - 1, dtype=jnp.float64)[:, None] * jnp.ones((1, 2 * Yc - 1))
    np.testing.assert_allclose(np.asarray(fine), np.asarray(expect), atol=1e-14)
    # restriction preserves constants away from the boundary
    c = jnp.ones((2 * Xc - 1, 2 * Yc - 1), jnp.float64)
    rc = restrict(c)
    np.testing.assert_allclose(np.asarray(rc[1:-1, 1:-1]), 1.0, atol=1e-14)


@pytest.mark.parametrize("res", [2, 4])
def test_mg_fcg_matches_oracle(res):
    mg = MGHierarchy.create(res, biot=0.1, dtype=jnp.float64)
    u2d, it = mg.solve(jnp.asarray(K_TEST), tol=1e-11, maxiter=100)
    mesh = build_fin_mesh(res)
    h = 0.25 / res
    ny = 16 * res
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(int)
    u_ref = oracle.solve(mesh, K_TEST, 0.1)
    u_flat = np.asarray(u2d).reshape(-1)
    rel = np.linalg.norm(u_flat[gi * (ny + 1) + gj] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-9, (rel, int(it))
    # the point of MG: iteration count FAR below Jacobi-PCG's ~80*res
    assert int(it) < 60


def test_mg_iters_far_below_jacobi():
    """MG-FCG needs ~7x fewer iterations than Jacobi-PCG at each resolution
    (measured: 23 vs ~160 at res=2, 47 vs ~340 at res=4 — the masked fin
    domain costs textbook mesh-independence, but the reduction holds)."""
    for res, jacobi_iters in [(2, 160), (4, 340)]:
        mg = MGHierarchy.create(res, biot=0.1, dtype=jnp.float64)
        _, it = mg.solve(jnp.asarray(K_TEST), tol=1e-10, maxiter=200)
        assert int(it) < jacobi_iters / 4, (res, int(it))


def test_mg_batched_vmap():
    mg = MGHierarchy.create(2, biot=0.1, dtype=jnp.float64)
    ks = jnp.exp(jax.random.normal(jax.random.PRNGKey(0), (4, 5)) * 0.4)
    u, it = jax.vmap(lambda k: mg.solve(k, tol=1e-10, maxiter=100))(ks)
    assert u.shape[0] == 4
    assert np.isfinite(np.asarray(u)).all()
    # cross-check one against the dense oracle
    mesh = build_fin_mesh(2)
    h, ny = 0.125, 32
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(int)
    u_ref = oracle.solve(mesh, np.asarray(ks[0]), 0.1)
    rel = np.linalg.norm(np.asarray(u[0]).reshape(-1)[gi * (ny + 1) + gj] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-8
