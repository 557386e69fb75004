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
    op, ks: jax.Array, *, tol: float = 1e-7, maxiter: int | None = None, x0: jax.Array | None = None
):
    """Batched FOM solve through the fused Pallas kernel.

    op: fem.dia.StencilOperator; ks: (B, 5). Returns (u: (B, n) flat,
    iters: (B,)). x0: optional (B, n) flat warm starts. Non-differentiable
    fast path (snapshot generation, dataset sweeps, MCMC); the implicit-diff
    jnp path in fem.solve stays the gradient route.

    maxiter=None derives the tight resolution-scaled loop bound (see
    derived_maxiter) — prefer it: a hand-picked loose bound silently costs
    up to 12x runtime (Mosaic scheduling artifact).
    """
    if maxiter is None:
        maxiter = derived_maxiter(op.resolution)
    vals2d = jax.vmap(op.vals_grid)(ks)  # (B, 7, X, Y)
    F2d = op.to_grid(op.F_root)
    x02d = None if x0 is None else jax.vmap(op.to_grid)(x0)
    x2d, iters = pcg_stencil_batch(vals2d, F2d, x02d, tol=tol, maxiter=maxiter)
    u = jax.vmap(op.from_grid)(x2d)
    return u, iters
