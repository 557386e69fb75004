"""Host-side f64 POD + Galerkin projection (the offline-precision path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.rom.galerkin import ReducedOperator
from bayesianinferencedl_tpu.rom.pod import pod_basis_host
from bayesianinferencedl_tpu.rom.snapshots import generate_snapshots, sample_log_uniform


@pytest.fixture(scope="module")
def setup(mesh_r1):
    host = assemble_fin_dia(mesh_r1, pad_to=128)
    op = StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64)
    ks = sample_log_uniform(jax.random.PRNGKey(0), 48)
    S = generate_snapshots(op, ks, tol=1e-12, maxiter=4000)
    return host, op, S


def test_pod_host_orthonormal(setup):
    _, _, S = setup
    V, sv = pod_basis_host(np.asarray(S), 24)
    np.testing.assert_allclose(V.T @ V, np.eye(24), atol=1e-12)
    assert sv[0] > sv[10] > 0


def test_project_host_matches_device(setup):
    host, op, S = setup
    V, _ = pod_basis_host(np.asarray(S), 16)
    rom_h = ReducedOperator.project_host(host, 0.1, V, dtype=jnp.float64)
    rom_d = ReducedOperator.project(op, jnp.asarray(V))
    np.testing.assert_allclose(np.asarray(rom_h.Ahat), np.asarray(rom_d.Ahat), atol=1e-11)
    np.testing.assert_allclose(np.asarray(rom_h.Mhat), np.asarray(rom_d.Mhat), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rom_h.Fhat), np.asarray(rom_d.Fhat), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rom_h.Bhat), np.asarray(rom_d.Bhat), atol=1e-12)


def test_greedy_host_parity_with_pod(setup):
    """VERDICT.md round-1 item 8: the greedy builder gets the same offline-f64
    architecture as POD — orthonormalize_host + project_host — and reaches
    rel-err parity with the POD basis at equal r."""
    from bayesianinferencedl_tpu.rom.greedy import greedy_basis, orthonormalize_host

    host, op, S = setup
    r = 16
    ks = sample_log_uniform(jax.random.PRNGKey(0), 48)
    gres = greedy_basis(op, ks, r, tol=1e-12, maxiter=4000)
    Vg = orthonormalize_host(gres.snapshots)
    # host QR restores f64 orthonormality regardless of device dtype
    np.testing.assert_allclose(Vg.T @ Vg, np.eye(Vg.shape[1]), atol=1e-12)
    rom_g = ReducedOperator.project_host(host, 0.1, Vg, dtype=jnp.float64)

    Vp, _ = pod_basis_host(np.asarray(S), r)
    rom_p = ReducedOperator.project_host(host, 0.1, Vp, dtype=jnp.float64)

    k_test = sample_log_uniform(jax.random.PRNGKey(9), 16)
    y_fom = jax.vmap(lambda k: op.observe(solve_fom(op, k, tol=1e-12, maxiter=4000)))(k_test)

    def rel(rom):
        return float(jnp.linalg.norm(rom.forward_batch(k_test) - y_fom) / jnp.linalg.norm(y_fom))

    e_g, e_p = rel(rom_g), rel(rom_p)
    # greedy optimizes sup-error over candidates, POD mean-square energy —
    # parity here means the same order of accuracy, not identical numbers
    # (measured: e_g=7.7e-3 vs e_p=6.9e-3 at r=16 — 11% apart)
    assert e_g < 3 * e_p and e_g < 3e-2, (e_g, e_p)


def test_f64_offline_beats_f32_offline(setup):
    """The motivating case: with f32 snapshots, f64 offline algebra preserves
    ROM accuracy far beyond all-f32 offline processing."""
    host, op, S = setup
    S32 = np.asarray(S, np.float32)

    # all-f32 offline
    from bayesianinferencedl_tpu.rom.pod import pod_basis

    V32 = pod_basis(jnp.asarray(S32), 24).V
    op32 = StencilOperator.from_host(host, biot=0.1, dtype=jnp.float32)
    rom32 = ReducedOperator.project(op32, V32)

    # f64 offline from the same f32 snapshots, cast down after
    V64, _ = pod_basis_host(S32, 24)
    rom64 = ReducedOperator.project_host(host, 0.1, V64, dtype=jnp.float32)

    ks = sample_log_uniform(jax.random.PRNGKey(5), 16)
    y_fom = jax.vmap(lambda k: op.observe(solve_fom(op, k, tol=1e-12, maxiter=4000)))(ks)
    e32 = float(jnp.linalg.norm(rom32.forward_batch(ks.astype(jnp.float32)) - y_fom)
                / jnp.linalg.norm(y_fom))
    e64 = float(jnp.linalg.norm(rom64.forward_batch(ks.astype(jnp.float32)) - y_fom)
                / jnp.linalg.norm(y_fom))
    assert e64 < e32
    assert e64 < 5e-3, (e64, e32)
