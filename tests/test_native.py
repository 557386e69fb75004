"""Native C++ assembly vs the NumPy oracle (bit-for-bit in exact arithmetic;
we allow 1e-14 for summation-order differences)."""

import numpy as np
import pytest

from bayesianinferencedl_tpu.native import (
    assemble_fin_dia_native,
    build_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("res", [1, 2])
def test_native_matches_numpy(res, mesh_r1, mesh_r2):
    from bayesianinferencedl_tpu.fem.dia import assemble_fin_dia

    mesh = mesh_r1 if res == 1 else mesh_r2
    ref = assemble_fin_dia(mesh, pad_to=128)
    nat = assemble_fin_dia_native(res, pad_to=128)

    assert nat.n_grid == ref.n_grid
    np.testing.assert_array_equal(nat.offsets, ref.offsets)
    np.testing.assert_allclose(nat.comp_vals, ref.comp_vals, atol=1e-14)
    np.testing.assert_allclose(nat.ext_mass, ref.ext_mass, atol=1e-14)
    np.testing.assert_array_equal(nat.fixed, ref.fixed)
    np.testing.assert_allclose(nat.F_root, ref.F_root, atol=1e-14)
    np.testing.assert_allclose(nat.qoi, ref.qoi, atol=1e-14)
    np.testing.assert_allclose(nat.qoi_root, ref.qoi_root, atol=1e-14)


def test_native_build_idempotent():
    assert build_native()
    assert build_native()  # cached


def test_native_solve_end_to_end(mesh_r1):
    """Native-assembled operator drives a solve that matches SciPy."""
    import jax.numpy as jnp

    from bayesianinferencedl_tpu.fem import oracle
    from bayesianinferencedl_tpu.fem.dia import StencilOperator
    from bayesianinferencedl_tpu.fem.solve import solve_fom

    host = assemble_fin_dia_native(1, pad_to=128)
    op = StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64)
    k = np.array([0.4, 1.7, 3.1, 0.9, 1.2])
    u = np.asarray(solve_fom(op, jnp.asarray(k), tol=1e-12, maxiter=4000))

    h = 0.25
    ny = 16
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj
    u_ref = oracle.solve(mesh_r1, k, 0.1)
    rel = np.linalg.norm(u[gid] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-8
