"""The full-field prior must mean the SAME physical field in every layout.

Regression tests for a round-3 correctness fix: the dia/stencil full-field
pipeline consumed the nodal conductivity in GRID numbering while the
RandomField placed its features in mesh-node numbering — the PDE then ran on
a node-scrambled, partially-constant field that disagreed with what
``pipe.theta(z)`` (and every plot built on it) claimed. These tests pin the
three invariants that make the field physically meaningful:

1. the stencil pipeline's field, read back per mesh node, equals the
   continuum random field evaluated at the node coordinates (== the ELL
   layout's field, which was always node-indexed);
2. the two operator layouts produce identical observables for the same z
   (the forward map is a property of the continuum problem, not the layout);
3. the SAME z means the same continuum field across mesh resolutions — the
   contract coarse_fom_forward (mlda_pcn's mid rung) states for level
   transfer (api_full_field.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem.assemble import assemble_fin
from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.fem.dia_nonaffine import (
    NodalStencilOperator,
    assemble_nodal_coeff,
)
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh
from bayesianinferencedl_tpu.infer.oed import mesh_node_grid_ids
from bayesianinferencedl_tpu.models.full_field import FullFieldFin, RandomField

SEED, ELL, SIGMA, M = 3, 0.8, 0.4, 24


@pytest.fixture(scope="module")
def mesh():
    return build_fin_mesh(1)


@pytest.fixture(scope="module")
def stencil_setup(mesh):
    host = assemble_fin_dia(mesh, pad_to=128)
    op = NodalStencilOperator(
        base=StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64),
        G=jnp.asarray(assemble_nodal_coeff(mesh, host), jnp.float64),
    )
    gid = mesh_node_grid_ids(mesh)
    field = RandomField.create(
        mesh, host.n, ell=ELL, sigma=SIGMA, n_features=M, seed=SEED,
        dtype=jnp.float64, node_ids=gid,
    )
    return op, field, gid


@pytest.fixture(scope="module")
def ell_fin(mesh):
    host = assemble_fin(mesh, pad_to=128)
    return FullFieldFin.create(
        mesh, host, biot=0.1, dtype=jnp.float64, ell=ELL, sigma=SIGMA,
        n_features=M, seed=SEED, cg_tol=1e-12, cg_maxiter=3000,
    )


def test_grid_field_matches_node_field(mesh, stencil_setup, ell_fin):
    """theta in grid layout, read at each node's grid row, must equal the
    ELL layout's node-indexed theta — both are the continuum GP at the node
    coordinates (same seed => same W, b)."""
    op, field, gid = stencil_setup
    z = jax.random.normal(jax.random.PRNGKey(7), (M,), jnp.float64)
    theta_grid = field.mean + field.sigma * field.features @ z
    theta_node = ell_fin.theta_from_coeff(z)
    np.testing.assert_allclose(
        np.asarray(theta_grid)[np.asarray(gid)],
        np.asarray(theta_node)[: mesh.n_nodes],
        rtol=1e-12,
    )
    # rows owned by no mesh node carry the prior mean (operator never reads
    # them; plots must never read them either)
    mask = np.ones(field.features.shape[0], bool)
    mask[np.asarray(gid)] = False
    np.testing.assert_allclose(
        np.asarray(theta_grid)[mask], field.mean, atol=1e-12
    )


def test_layouts_agree_on_observables(mesh, stencil_setup, ell_fin):
    """Same z -> same subfin observables through either operator layout."""
    op, field, gid = stencil_setup
    zs = jax.random.normal(jax.random.PRNGKey(11), (3, M), jnp.float64)

    def fwd_stencil(z):
        theta = field.mean + field.sigma * field.features @ z
        u = solve_fom(op, jnp.exp(theta), tol=1e-12, maxiter=4000)
        return op.observe(u)

    y_s = jnp.stack([fwd_stencil(z) for z in zs])
    y_e = jnp.stack([ell_fin.forward_coeff(z) for z in zs])
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_e), rtol=2e-9)


def test_cross_resolution_field_consistency():
    """z means the same continuum field on a coarse and a fine mesh: at the
    shared lattice points the two RandomFields agree exactly (the mlda_pcn
    level-transfer contract, api_full_field.coarse_fom_forward)."""
    mc, mf = build_fin_mesh(1), build_fin_mesh(2)
    hc, hf = assemble_fin_dia(mc, pad_to=128), assemble_fin_dia(mf, pad_to=128)
    fc = RandomField.create(
        mc, hc.n, ell=ELL, sigma=SIGMA, n_features=M, seed=SEED,
        dtype=jnp.float64, node_ids=mesh_node_grid_ids(mc),
    )
    ff = RandomField.create(
        mf, hf.n, ell=ELL, sigma=SIGMA, n_features=M, seed=SEED,
        dtype=jnp.float64, node_ids=mesh_node_grid_ids(mf),
    )
    z = jax.random.normal(jax.random.PRNGKey(5), (M,), jnp.float64)
    tc = np.asarray(fc.mean + fc.sigma * fc.features @ z)[mesh_node_grid_ids(mc)]
    tf = np.asarray(ff.mean + ff.sigma * ff.features @ z)[mesh_node_grid_ids(mf)]

    # match coarse nodes to fine nodes by coordinates (nested lattices)
    key_c = np.round(np.asarray(mc.nodes) * 1e6).astype(np.int64)
    key_f = np.round(np.asarray(mf.nodes) * 1e6).astype(np.int64)
    lut = {tuple(p): i for i, p in enumerate(key_f)}
    match = np.array([lut[tuple(p)] for p in key_c])
    np.testing.assert_allclose(tc, tf[match], rtol=1e-12)
