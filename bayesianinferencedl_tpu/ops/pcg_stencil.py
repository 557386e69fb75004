"""Fused batched Jacobi-PCG as a single Pallas TPU kernel.

The stencil operator (fem/dia.py) views the fin as its full structured grid,
so a FOM solve is CG on a 7-point-stencil operator over a 2-D array:

    offsets (flat)        0, +-1, +-(ny+1), +-(ny+2)
    offsets (2-D grid)    (0,0), (0,+-1), (+-1,0), (+-1,+-1 same sign)

This kernel runs the ENTIRE PCG iteration on-chip: per batch sample, the 7
diagonal-value planes (~0.4 MB at r=4) plus the 4 CG state arrays live in
VMEM; each iteration is seven roll-multiply-adds (VPU) and three scalar
reductions, with zero HBM traffic inside the loop. XLA's lowering of the same
math streams every vector through HBM each iteration; this is the memory-
bound win the BASELINE north-star asks for.

Boundary handling: `pltpu.roll` wraps around, but every stencil value that
would touch a wrapped neighbor is exactly 0.0 by construction (no finite
element couples nodes across the grid boundary), so wrap-around reads are
multiplied by zero — no masking needed in the hot loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 2-D stencil offsets matching fem.dia offset order
# [-(ny+2), -(ny+1), -1, 0, 1, ny+1, ny+2]
OFFSETS_2D = ((-1, -1), (-1, 0), (0, -1), (0, 0), (0, 1), (1, 0), (1, 1))
DIAG_SLOT = 3


def _shift(a: jax.Array, dx: int, dy: int) -> jax.Array:
    """elementwise a'[ix, iy] = a[ix+dx, iy+dy], wrapping (wrap is harmless —
    see module docstring)."""
    out = a
    if dx:
        out = pltpu.roll(out, -dx % out.shape[0], 0)
    if dy:
        out = pltpu.roll(out, -dy % out.shape[1], 1)
    return out


def _stencil_matvec(vals_ref, p):
    acc = vals_ref[DIAG_SLOT] * p
    for s, (dx, dy) in enumerate(OFFSETS_2D):
        if s == DIAG_SLOT:
            continue
        acc += vals_ref[s] * _shift(p, dx, dy)
    return acc


def _pcg_kernel(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref, *, maxiter: int):
    """One batch sample's full PCG. vals_ref: (7, X, Y); F_ref, x0_ref: (X, Y).

    x0 is a warm start (pass zeros for a cold solve) — inside MCMC the
    current state's solution cuts the iteration count several-fold because
    proposals are local."""
    F = F_ref[:]
    diag = vals_ref[DIAG_SLOT]
    inv_diag = jnp.where(diag != 0.0, pl.reciprocal(jnp.where(diag != 0.0, diag, 1.0), approx=False), 0.0)

    b_nrm2 = jnp.sum(F * F)
    tol2 = tol2_ref[0] * b_nrm2

    x0 = x0_ref[:]
    r0 = F - _stencil_matvec(vals_ref, x0)
    z0 = inv_diag * r0
    rz0 = jnp.sum(r0 * z0)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter, jnp.sum(r * r) > tol2)

    def body(c):
        x, r, p, rz, it = c
        Ap = _stencil_matvec(vals_ref, p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0.0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = lax.while_loop(cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    out_ref[:] = x
    it_ref[:] = jnp.full(it_ref.shape, it, jnp.int32)


@partial(jax.jit, static_argnames=("maxiter", "grid_shape"))
def pcg_stencil_batch(
    vals2d: jax.Array,  # (B, 7, X, Y) pre-assembled diagonal planes
    F2d: jax.Array,  # (X, Y)
    x02d: jax.Array | None = None,  # (B, X, Y) warm starts (None = zeros)
    *,
    tol: float = 1e-7,
    maxiter: int = 2000,
    grid_shape=None,  # unused; kept for API stability
):
    """Solve A_b x_b = F for every sample b in one pallas_call.

    Returns (x: (B, X, Y), iters: (B,)).
    """
    B, seven, X, Y = vals2d.shape
    assert seven == 7
    dtype = vals2d.dtype
    tol2 = jnp.asarray([tol * tol], dtype)
    if x02d is None:
        x02d = jnp.zeros((B, X, Y), dtype)

    out_shape = (
        jax.ShapeDtypeStruct((B, X, Y), dtype),
        # iteration counts, one (1, 128) int32 lane-row per sample (tile-legal)
        jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 7, X, Y), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((X, Y), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, Y), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, X, Y), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )

    def kern(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref):
        _pcg_kernel(
            tol2_ref,
            vals_ref.at[0],
            F_ref,
            x0_ref.at[0],
            out_ref.at[0],
            it_ref.at[0],
            maxiter=maxiter,
        )

    # cost estimate for the scheduler: per sample ~maxiter/4 typical CG
    # iterations of a 7-point stencil (14 flops/cell) + 3 reductions
    est_iters = max(maxiter // 4, 64)
    cost = pl.CostEstimate(
        flops=int(B * est_iters * X * Y * 20),
        bytes_accessed=int(B * (7 + 4) * X * Y * 4),
        transcendentals=0,
    )
    x, iters = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        cost_estimate=cost,
    )(tol2, vals2d, F2d, x02d)
    return x, iters[:, 0, 0]


def _lanes_matvec(vals, p, offsets):
    """Flat 7-diagonal matvec with samples on the LANE axis.

    vals: (7, n, Bt); p: (n, Bt). shifted[cell] = p[cell + o] is a sublane
    roll by the FLAT offset — exactly fem.dia's operator definition, where
    every entry whose neighbor leaves the grid is structurally zero, so
    wrap-around reads are multiplied by 0 (same argument as _shift)."""
    acc = vals[DIAG_SLOT] * p
    for s, o in enumerate(offsets):
        if s == DIAG_SLOT:
            continue
        acc += vals[s] * pltpu.roll(p, -o % p.shape[0], 0)
    return acc


def _pcg_kernel_lanes(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref, *, maxiter: int, offsets, check_every: int = 16):
    """CG for a LANE-TILE of samples: state (n, Bt), one sample per lane.

    One sample's grid is a handful of (8, 128) vector tiles, so the
    single-sample kernel is latency-bound on its serial reduce -> scalar ->
    broadcast chain and leaves the VPU ~97% idle (measured 2-4k solves/s).
    Putting up to 128 samples on the lane axis makes every vector op Bt-wide
    at the same dependency depth: per-sample inner products are sublane
    reductions to (1, Bt), and alpha/beta are native sublane broadcasts.
    Samples that converge early ride along until the tile converges (extra
    CG iterations are harmless — alpha ~ 0)."""
    F = F_ref[:]  # (n, Bt) — root load pre-broadcast across lanes
    vals = vals_ref[:]
    diag = vals[DIAG_SLOT]
    inv_diag = jnp.where(diag != 0.0, pl.reciprocal(jnp.where(diag != 0.0, diag, 1.0), approx=False), 0.0)

    def psum(a):  # per-sample inner product -> (1, Bt)
        return jnp.sum(a, axis=0, keepdims=True)

    b_nrm2 = psum(F * F)
    tol2 = tol2_ref[0] * b_nrm2  # (1, Bt)

    x0 = x0_ref[:]
    r0 = F - _lanes_matvec(vals, x0, offsets)
    z0 = inv_diag * r0
    rz0 = psum(r0 * z0)

    # convergence test forces a cross-lane reduce-to-scalar sync; amortize
    # it over a fixed inner block (<= check_every-1 surplus iterations,
    # harmless — alpha ~ 0 once converged)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter, jnp.max(psum(r * r) - tol2) > 0.0)

    def one_iter(_, c):
        x, r, p, rz, it = c
        Ap = _lanes_matvec(vals, p, offsets)
        pAp = psum(p * Ap)
        alpha = jnp.where(pAp > 0.0, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = psum(r * z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    def body(c):
        return lax.fori_loop(0, check_every, one_iter, c)

    x, r, p, rz, it = lax.while_loop(cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    out_ref[:] = x
    it_ref[:] = jnp.full(it_ref.shape, it, jnp.int32)


@partial(jax.jit, static_argnames=("maxiter", "tile", "offsets", "check_every"))
def pcg_stencil_batch_lanes(
    vals_flat: jax.Array,  # (B, n, 7) flat per-sample diagonal values
    F_flat: jax.Array,  # (n,)
    x0_flat: jax.Array | None = None,  # (B, n)
    *,
    tol: float = 1e-7,
    maxiter: int = 2000,
    tile: int = 128,
    offsets: tuple = (),
    check_every: int = 16,
):
    """Lane-tiled fused PCG (see _pcg_kernel_lanes). B must be a multiple of
    tile (solve_fom_stencil_pallas pads). Returns (x: (B, n), iters: (B,) —
    each tile's joint iteration count)."""
    B, n, seven = vals_flat.shape
    assert seven == 7 and B % tile == 0
    dtype = vals_flat.dtype
    tol2 = jnp.asarray([tol * tol], dtype)
    n_tiles = B // tile

    # lanes layout: (n_tiles, 7, n, tile); XLA does these transposes in HBM
    vals_t = vals_flat.reshape(n_tiles, tile, n, 7).transpose(0, 3, 2, 1)
    F_bt = jnp.broadcast_to(F_flat[:, None], (n, tile))
    if x0_flat is None:
        x0_t = jnp.zeros((n_tiles, n, tile), dtype)
    else:
        x0_t = x0_flat.reshape(n_tiles, tile, n).transpose(0, 2, 1)

    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, n, tile), dtype),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 7, n, tile), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )

    def kern(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref):
        _pcg_kernel_lanes(
            tol2_ref, vals_ref.at[0], F_ref, x0_ref.at[0], out_ref.at[0], it_ref.at[0],
            maxiter=maxiter, offsets=offsets, check_every=check_every,
        )

    est_iters = max(maxiter // 4, 64)
    cost = pl.CostEstimate(
        flops=int(B * est_iters * n * 26),
        bytes_accessed=int(B * (7 + 4) * n * 4),
        transcendentals=0,
    )
    x, iters = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(1024 * 1024 * 127)),
        cost_estimate=cost,
    )(tol2, vals_t, F_bt, x0_t)
    x = x.transpose(0, 2, 1).reshape(B, n)
    return x, jnp.repeat(iters[:, 0, 0], tile)


def pick_sample_tile(n: int, batch: int, vmem_budget_bytes: int = 80 * 1024 * 1024) -> int:
    """128 if the lanes layout fits this problem, else 1 (2-D kernel).

    Mosaic requires the lane (last) dimension 128-aligned and pads it to 128
    physically, so the only useful lane tile is exactly 128; the VMEM working
    set is ~(7 vals + F + x0 + out + 4 state) * n * 128 * 4 bytes. Batches
    under half a tile waste more lanes than the layout wins — use the
    single-sample 2-D kernel there."""
    working_set = 14 * n * 128 * 4
    if working_set > vmem_budget_bytes or batch < 64:
        return 1
    return 128


def derived_maxiter(resolution: int) -> int:
    """Tight static loop bound for the fused PCG kernel: ~1.5x the measured
    Jacobi-PCG iteration count (~80 x resolution at tol=1e-7 over the
    log-uniform conductivity range).

    The bound must be TIGHT: Mosaic's scheduling of the while_loop degrades
    with the static trip-count bound itself — measured 12x slower at
    maxiter=8000 vs 3000 at IDENTICAL iteration counts (323) on the r=4 mesh
    (CLAUDE.md rule 7). The kernel is f32, so tolerances below ~1e-7 are not
    reachable anyway and don't need extra headroom."""
    return max(480, 120 * int(resolution))


def solve_fom_stencil_pallas(
    op,
    ks: jax.Array,
    *,
    tol: float = 1e-7,
    maxiter: int | None = None,
    x0: jax.Array | None = None,
    sample_tile: int | None = None,
):
    """Batched FOM solve through the fused Pallas kernel.

    op: fem.dia.StencilOperator; ks: (B, 5). Returns (u: (B, n) flat,
    iters: (B,)). x0: optional (B, n) flat warm starts. Non-differentiable
    fast path (snapshot generation, dataset sweeps, MCMC); the implicit-diff
    jnp path in fem.solve stays the gradient route.

    maxiter=None derives the tight resolution-scaled loop bound (see
    derived_maxiter) — prefer it: a hand-picked loose bound silently costs
    up to 12x runtime (Mosaic scheduling artifact).

    sample_tile: samples iterated together per kernel instance (None = auto
    by VMEM budget; 1 = the single-sample kernel). Tiling fills the VPU —
    a lone (X, Y) grid is latency-bound on the CG reduction chain.
    """
    if maxiter is None:
        maxiter = derived_maxiter(op.resolution)
    B = ks.shape[0]
    if sample_tile is None:
        sample_tile = pick_sample_tile(op.n, B)
    if sample_tile <= 1:
        vals2d = jax.vmap(op.vals_grid)(ks)  # (B, 7, X, Y)
        F2d = op.to_grid(op.F_root)
        x02d = None if x0 is None else jax.vmap(op.to_grid)(x0)
        x2d, iters = pcg_stencil_batch(vals2d, F2d, x02d, tol=tol, maxiter=maxiter)
        u = jax.vmap(op.from_grid)(x2d)
        return u, iters
    # lanes layout works on the FLAT 7-diagonal values directly
    vals = jax.vmap(op.vals)(ks)  # (B, n, 7)
    pad = (-B) % sample_tile
    if pad:
        # pad with copies of sample 0 (converge together; sliced off)
        vals = jnp.concatenate([vals, jnp.repeat(vals[:1], pad, 0)], 0)
        if x0 is not None:
            x0 = jnp.concatenate([x0, jnp.repeat(x0[:1], pad, 0)], 0)
    u, iters = pcg_stencil_batch_lanes(
        vals, op.F_root, x0, tol=tol, maxiter=maxiter, tile=sample_tile,
        offsets=tuple(int(o) for o in op.offsets),
    )
    return u[:B], iters[:B]
