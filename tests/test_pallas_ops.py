"""Pallas fused-PCG kernel tests, run in interpreter mode on CPU
(compiled-mode validation happens on the real chip; see bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bayesianinferencedl_tpu.fem import oracle
from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
from bayesianinferencedl_tpu.ops.pcg_stencil import solve_fom_stencil_pallas

BIOT = 0.1


@pytest.fixture(scope="module")
def op32(mesh_r1):
    host = assemble_fin_dia(mesh_r1, pad_to=128)
    return StencilOperator.from_host(host, biot=BIOT, dtype=jnp.float32)


def test_pallas_pcg_matches_scipy(mesh_r1, op32):
    ks = np.exp(np.random.default_rng(0).normal(0, 0.4, (4, 5))).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        u, iters = solve_fom_stencil_pallas(op32, jnp.asarray(ks), tol=1e-6, maxiter=800)
    assert (np.asarray(iters) > 0).all() and (np.asarray(iters) < 800).all()

    n_res = mesh_r1.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj
    for b in range(4):
        u_ref = oracle.solve(mesh_r1, ks[b], BIOT)
        rel = np.linalg.norm(np.asarray(u[b])[gid] - u_ref) / np.linalg.norm(u_ref)
        assert rel < 5e-5, (b, rel)


def test_pallas_lanes_kernel_matches_scipy(mesh_r1, op32):
    """The lane-tiled kernel (samples on the lane axis) against the SciPy
    oracle, interpret mode. B=4 is padded to the 128-lane tile internally."""
    ks = np.exp(np.random.default_rng(1).normal(0, 0.4, (4, 5))).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        u, iters = solve_fom_stencil_pallas(op32, jnp.asarray(ks), tol=1e-6, maxiter=800, sample_tile=128)
    assert (np.asarray(iters) > 0).all()

    n_res = mesh_r1.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj
    for b in range(4):
        u_ref = oracle.solve(mesh_r1, ks[b], BIOT)
        rel = np.linalg.norm(np.asarray(u[b])[gid] - u_ref) / np.linalg.norm(u_ref)
        assert rel < 5e-5, (b, rel)


def test_grid_roundtrip(op32):
    v = jnp.arange(op32.n, dtype=jnp.float32)
    a = op32.to_grid(v)
    v2 = op32.from_grid(a)
    np.testing.assert_array_equal(np.asarray(v2[: op32.n_grid]), np.asarray(v[: op32.n_grid]))


def test_vals_grid_matches_flat(op32):
    k = jnp.asarray([0.5, 1.5, 2.5, 0.8, 1.2], jnp.float32)
    planes = op32.vals_grid(k)
    vals = op32.vals(k)
    x0, y0 = op32.grid_shape0
    np.testing.assert_allclose(
        np.asarray(planes[:, :x0, :y0].reshape(7, -1).T),
        np.asarray(vals[: op32.n_grid]),
        atol=0,
    )


def test_pallas_sublanes_kernel_matches_scipy(mesh_r1, op32):
    """The sublane-tiled kernel (samples on the sublane axis, grid on lanes
    — the res>=8 batching layout, VERDICT r2 item 1) against the SciPy
    oracle, interpret mode. B=4 pads to the 8-sublane tile internally."""
    ks = np.exp(np.random.default_rng(2).normal(0, 0.4, (4, 5))).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        u, iters = solve_fom_stencil_pallas(
            op32, jnp.asarray(ks), tol=1e-6, maxiter=800, layout="sublanes",
            sample_tile=8,
        )
    assert (np.asarray(iters) > 0).all()

    n_res = mesh_r1.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh_r1.nodes[:, 0] + 3.0) / h).astype(int)
    gj = np.rint(mesh_r1.nodes[:, 1] / h).astype(int)
    gid = gi * (ny + 1) + gj
    for b in range(4):
        u_ref = oracle.solve(mesh_r1, ks[b], BIOT)
        rel = np.linalg.norm(np.asarray(u[b])[gid] - u_ref) / np.linalg.norm(u_ref)
        assert rel < 5e-5, (b, rel)


def test_sublanes_chunked_matches_grid(op32):
    """The self-chunking path (lax.map of single-buffered per-tile calls —
    what res16+deflation compiles where the multi-tile grid OOMs VMEM) must
    produce the same solutions as the multi-tile grid path, with and
    without x0."""
    from bayesianinferencedl_tpu.ops.pcg_stencil import pcg_stencil_batch_sublanes

    ks = np.exp(np.random.default_rng(3).normal(0, 0.4, (16, 5))).astype(np.float32)
    vals = jax.vmap(op32.vals)(jnp.asarray(ks))
    offs = tuple(int(o) for o in op32.offsets)
    kw = dict(tol=1e-6, maxiter=800, tile=8, offsets=offs)
    with pltpu.force_tpu_interpret_mode():
        u_grid, it_grid = pcg_stencil_batch_sublanes(vals, op32.F_root, None, chunk=False, **kw)
        u_chunk, it_chunk = pcg_stencil_batch_sublanes(vals, op32.F_root, None, chunk=True, **kw)
        x0 = u_grid * 0.5
        u_warm, it_warm = pcg_stencil_batch_sublanes(vals, op32.F_root, x0, chunk=True, **kw)
    np.testing.assert_allclose(np.asarray(u_chunk), np.asarray(u_grid), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(it_chunk), np.asarray(it_grid))
    # warm start converges to the same solution in fewer iterations
    np.testing.assert_allclose(np.asarray(u_warm), np.asarray(u_grid), rtol=0, atol=1e-4)
    assert (np.asarray(it_warm) <= np.asarray(it_grid)).all()


def test_sublanes_chunk_unroll_limit(op32):
    """A chunked sublane solve beyond the per-program instance limit must
    raise the clear split-your-batch error (the remote compile helper dies
    on >4 kernel instances), not produce an opaque compile failure."""
    from bayesianinferencedl_tpu.ops.pcg_stencil import pcg_stencil_batch_sublanes

    ks = np.exp(np.random.default_rng(4).normal(0, 0.4, (48, 5))).astype(np.float32)
    vals = jax.vmap(op32.vals)(jnp.asarray(ks))
    offs = tuple(int(o) for o in op32.offsets)
    with pytest.raises(ValueError, match="chunked_batched_solve"):
        pcg_stencil_batch_sublanes(
            vals, op32.F_root, None, tol=1e-6, maxiter=800, tile=8,
            offsets=offs, chunk=True,
        )


def test_chunked_batched_solve_splits_and_pads(op32):
    """Dispatch-level batch splitting (res16+deflation: one program holds
    <= 4 kernel instances) pads every chunk to the compiled size and
    reassembles exactly; the limit helpers agree on when it's needed."""
    from bayesianinferencedl_tpu.ops.pcg_stencil import (
        chunked_batched_solve, sublanes_needs_chunking,
        sublanes_program_batch_limit,
    )

    calls = []

    def fake_solve(ks):  # records chunk shapes, returns identifiable output
        calls.append(int(ks.shape[0]))
        return ks * 2.0, jnp.full((ks.shape[0],), len(calls), jnp.int32)

    ks = jnp.arange(20.0, dtype=jnp.float32)[:, None] * jnp.ones((1, 5))
    u, it = chunked_batched_solve(fake_solve, ks, 8)
    assert calls == [8, 8, 8]  # 20 -> 8 + 8 + 4(padded to 8)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ks) * 2.0)
    assert u.shape == (20, 5) and it.shape == (20,)
    # no limit -> single passthrough call
    calls.clear()
    u2, _ = chunked_batched_solve(fake_solve, ks, None)
    assert calls == [20]

    # res16-sized problem with the m=128 basis must chunk; res8 must not
    assert sublanes_needs_chunking(99072, 8, 128)
    assert sublanes_program_batch_limit(99072, 8, 128) == 32
    assert not sublanes_needs_chunking(24960, 8, 128)
    assert sublanes_program_batch_limit(24960, 8, 128) is None


def test_pick_layout_no_cliff():
    """pick_layout must not cliff to the single-sample kernel at mid
    resolutions: res8/res16-sized problems get a sublane tile >= 8."""
    from bayesianinferencedl_tpu.ops.pcg_stencil import pick_layout

    kind4, t4 = pick_layout(6400, 256)
    assert (kind4, t4) == ("lanes", 128)
    kind8, t8 = pick_layout(24960, 256)
    # plain kernels are issue-bound: throughput peaks at S=8
    assert (kind8, t8) == ("sublanes", 8)
    # deflated kernels are MXU-row-starved at S=8: S=16 measured 1.06-1.08x
    # at res8 (where it fits); res16 can't afford it next to the m=128 basis
    assert pick_layout(24960, 256, deflated=True) == ("sublanes", 16)
    assert pick_layout(99072, 256, deflated=True) == ("sublanes", 8)
    kind16, t16 = pick_layout(99072, 256)
    assert kind16 == "sublanes" and t16 >= 8
    # absurdly large problem still falls back cleanly
    kind_huge, t_huge = pick_layout(2_000_000, 256)
    assert (kind_huge, t_huge) == ("single", 1)
