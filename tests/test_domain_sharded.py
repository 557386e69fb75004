"""Domain-decomposed (spatially sharded) FOM solve vs the single-device
solver, on the 8-virtual-device CPU mesh (SURVEY.md §2c model parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.parallel import device_mesh
from bayesianinferencedl_tpu.parallel.domain import solve_fom_domain_sharded

K_TEST = np.array([0.4, 1.7, 3.1, 0.9, 1.2])


@pytest.fixture(scope="module")
def op64(mesh_r2):
    host = assemble_fin_dia(mesh_r2, pad_to=128)
    return StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64)


def test_domain_sharded_matches_single_device(op64):
    mesh = device_mesh()
    u_ref = solve_fom(op64, jnp.asarray(K_TEST), tol=1e-12, maxiter=4000)
    u_sh, iters = solve_fom_domain_sharded(mesh, op64, jnp.asarray(K_TEST), tol=1e-12, maxiter=4000)
    rel = float(jnp.linalg.norm(u_sh - u_ref) / jnp.linalg.norm(u_ref))
    assert rel < 1e-9, rel
    assert int(iters) > 0


def test_domain_sharded_nonaffine(mesh_r2):
    """Full-field operator through the same distributed solver."""
    from bayesianinferencedl_tpu.fem.dia_nonaffine import NodalStencilOperator, assemble_nodal_coeff

    host = assemble_fin_dia(mesh_r2, pad_to=128)
    G = assemble_nodal_coeff(mesh_r2, host)
    op = NodalStencilOperator(
        base=StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64),
        G=jnp.asarray(G),
    )
    rng = np.random.default_rng(0)
    theta = np.zeros(op.n)
    theta[: host.n_grid] = 0.2 * rng.standard_normal(host.n_grid) * 0  # smooth-ish: zeros
    theta[: host.n_grid] += 0.3
    k = jnp.exp(jnp.asarray(theta))
    u_ref = solve_fom(op, k, tol=1e-12, maxiter=4000)
    mesh = device_mesh()
    u_sh, _ = solve_fom_domain_sharded(mesh, op, k, tol=1e-12, maxiter=4000)
    rel = float(jnp.linalg.norm(u_sh - u_ref) / jnp.linalg.norm(u_ref))
    assert rel < 1e-9, rel
