"""Full-field (non-affine nodal conductivity) model tests (SURVEY.md §2a #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem import oracle
from bayesianinferencedl_tpu.models.full_field import ElementOperator, FullFieldFin, RandomField


def _fin(mesh, host):
    return FullFieldFin.create(mesh, host, biot=0.1, dtype=jnp.float64, cg_tol=1e-13, cg_maxiter=4000)


def test_element_apply_matches_affine(mesh_r1, host_r1, op_r1_f64):
    """With piecewise-constant nodal k (constant overall) the element apply
    equals the affine ELL apply."""
    fin = _fin(mesh_r1, host_r1)
    n_pad = host_r1.n
    u = jnp.asarray(np.random.default_rng(0).standard_normal(n_pad))
    u = u.at[host_r1.n_dof :].set(0.0)
    kval = 1.7
    k_nodal = jnp.full(n_pad, kval)
    got = fin.elem.apply(k_nodal, u)
    ref = sum(kval * op_r1_f64.apply_component(i, u) for i in range(5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_full_field_solve_constant_matches_affine(mesh_r1, host_r1, op_r1_f64):
    from bayesianinferencedl_tpu.fem.solve import solve_fom

    fin = _fin(mesh_r1, host_r1)
    theta = jnp.zeros(host_r1.n)  # k = 1 everywhere
    u_ff = fin.solve(theta)
    u_aff = solve_fom(op_r1_f64, jnp.ones(5), tol=1e-13, maxiter=4000)
    np.testing.assert_allclose(np.asarray(u_ff), np.asarray(u_aff), rtol=1e-8, atol=1e-10)


def test_full_field_vs_scipy_variable_field(mesh_r1, host_r1):
    """Variable nodal conductivity vs a SciPy assembly with per-element mean
    conductivity."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from bayesianinferencedl_tpu.fem import p1

    fin = _fin(mesh_r1, host_r1)
    n = mesh_r1.n_nodes
    rng = np.random.default_rng(3)
    theta_np = np.zeros(host_r1.n)
    theta_np[:n] = 0.3 * np.sin(mesh_r1.nodes[:, 0]) + 0.2 * mesh_r1.nodes[:, 1] / 4.0
    k_np = np.exp(theta_np)

    Ke, _ = p1.element_stiffness(mesh_r1.nodes, mesh_r1.triangles)
    ke = k_np[mesh_r1.triangles].mean(axis=1)
    rows = np.repeat(mesh_r1.triangles, 3, axis=1).reshape(-1)
    cols = np.tile(mesh_r1.triangles, (1, 3)).reshape(-1)
    A = sp.coo_matrix(((ke[:, None, None] * Ke).reshape(-1), (rows, cols)), shape=(n, n)).tocsr()
    A = A + 0.1 * oracle.boundary_mass(mesh_r1, "ext")
    F = oracle.root_load(mesh_r1)
    u_ref = spla.spsolve(A.tocsc(), F)

    u = np.asarray(fin.solve(jnp.asarray(theta_np)))
    rel = np.linalg.norm(u[:n] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-8


def test_random_field_statistics(mesh_r1, host_r1):
    field = RandomField.create(mesh_r1, host_r1.n, ell=1.0, sigma=0.5, n_features=512, dtype=jnp.float64)
    s = field.sample(jax.random.PRNGKey(0), 256)
    assert s.shape == (256, host_r1.n)
    vals = np.asarray(s[:, : mesh_r1.n_nodes])
    assert abs(vals.mean()) < 0.1
    assert abs(vals.std() - 0.5) < 0.1
    # padding nodes stay at the mean
    np.testing.assert_allclose(np.asarray(s[:, mesh_r1.n_nodes :]), 0.0, atol=1e-12)


def test_coeff_space_inversion_smoke(mesh_r1, host_r1):
    """Dimension-robust pCN on RFF coefficients: the full-field inverse
    problem runs end-to-end and the posterior mean fits the data better than
    the prior mean (SURVEY.md §2a #4 / A.5)."""
    from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn

    fin = FullFieldFin.create(
        mesh_r1, host_r1, biot=0.1, dtype=jnp.float64,
        n_features=32, sigma=0.4, cg_tol=1e-10, cg_maxiter=1500,
    )
    prior = fin.coeff_prior()
    z_true = prior.sample(jax.random.PRNGKey(0))
    data = fin.forward_coeff(z_true)
    noise = 1e-3
    misfit = gaussian_misfit(fin.forward_coeff, data, noise)
    z0 = prior.sample(jax.random.PRNGKey(1), (8,))
    res = run_pcn(misfit, prior, z0, jax.random.PRNGKey(2), n_steps=300, n_burn=150, beta=0.3)
    z_post = res.samples.mean(axis=(0, 1))
    fit_post = float(jnp.linalg.norm(fin.forward_coeff(z_post) - data))
    fit_prior = float(jnp.linalg.norm(fin.forward_coeff(jnp.zeros_like(z_post)) - data))
    assert fit_post < fit_prior


def test_full_field_forward_differentiable(mesh_r1, host_r1):
    fin = _fin(mesh_r1, host_r1)
    theta = jnp.zeros(host_r1.n)
    g = jax.grad(lambda t: jnp.sum(fin.forward(t)))(theta)
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr[: mesh_r1.n_nodes]).max() > 0
