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


def _jacobi_cg(matvec, psum, vals, F, x0, tol2_scale, *, maxiter: int,
               check_every: int, coarse=None, diag_slot: int = DIAG_SLOT):
    """Jacobi-PCG shared by the lanes and sublanes kernels, with an optional
    two-level deflation coarse correction.

    This is the measured-fastest iteration form. (A Jacobi-SCALED plain-CG
    variant — fold D^-1/2 into the stencil values once, merge r.z with the
    convergence reduction — was built and benchmarked on-TPU: 10% SLOWER per
    iteration than this form plus ~11% extra iterations from f32 round-off
    of the scaled operator near the 1e-7 tolerance floor. The kernels are
    VPU-issue-bound, but Mosaic's schedule does not reward the hand-removed
    passes; reverted 2026-08-17.)

    coarse: optional (apply_WT, apply_W, Binv) for the additive two-level
    preconditioner M^-1 = D^-1 + W B(k)^-1 W^T (ops/deflation.py): W spans
    smooth near-kernel modes shared across samples, B(k) = W^T A(k) W is the
    per-sample affine-Galerkin coarse operator inverted OUTSIDE the kernel.
    The coarse solve removes the low end of the spectrum that makes Jacobi-CG
    iteration counts grow like 1/h^2 — iterations drop several-fold for two
    small MXU matmuls per iteration.
    """
    diag = vals[diag_slot].astype(F.dtype)  # planes may be bf16 (see matvec)
    inv_diag = jnp.where(diag != 0.0, pl.reciprocal(jnp.where(diag != 0.0, diag, 1.0), approx=False), 0.0)

    def precond(r):
        z = inv_diag * r
        if coarse is not None:
            apply_WT, apply_W, Binv = coarse
            z = z + apply_W(Binv(apply_WT(r)))
        return z

    b_nrm2 = psum(F * F)
    tol2 = tol2_scale * b_nrm2

    x0 = x0 + F * 0.0  # broadcast against F (sublanes passes F as (1, n))
    r0 = F - matvec(vals, x0)
    z0 = precond(r0)
    rz0 = psum(r0 * z0)

    # convergence test forces a reduce-to-scalar sync; amortize it over a
    # fixed inner block (<= check_every-1 surplus iterations, harmless —
    # alpha ~ 0 once converged)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter, jnp.max(psum(r * r) - tol2) > 0.0)

    def one_iter(_, c):
        x, r, p, rz, it = c
        Ap = matvec(vals, p)
        pAp = psum(p * Ap)
        alpha = jnp.where(pAp > 0.0, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = psum(r * z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    def body(c):
        return lax.fori_loop(0, check_every, one_iter, c)

    x, r, p, rz, it = lax.while_loop(cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    return x, it


def _pcg_kernel_lanes(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref, *, maxiter: int, offsets, check_every: int = 16, wt_ref=None, binv_ref=None):
    """CG for a LANE-TILE of samples: state (n, Bt), one sample per lane.

    One sample's grid is a handful of (8, 128) vector tiles, so the
    single-sample kernel is latency-bound on its serial reduce -> scalar ->
    broadcast chain and leaves the VPU ~97% idle (measured 2-4k solves/s).
    Putting up to 128 samples on the lane axis makes every vector op Bt-wide
    at the same dependency depth: per-sample inner products are sublane
    reductions to (1, Bt), and alpha/beta are native sublane broadcasts.
    Samples that converge early ride along until the tile converges (extra
    CG iterations are harmless — alpha ~ 0). Iteration form: _jacobi_cg.

    vals_ref holds only the 4 UPPER diagonal planes [0, +o1, +o2, +o3]
    (slot 0 = main diagonal): A is symmetric, so the -o plane is exactly
    roll(+o plane, o) and the -o neighbor contribution is roll(vals[+o]*p, o)
    — identical op count (3 muls + 3 rolls + 3 adds either way), 43% less
    vals VMEM/HBM. offsets: the 3 POSITIVE flat offsets."""

    def matvec(vals, p):
        acc = vals[0] * p
        for j, o in enumerate(offsets):
            acc += vals[1 + j] * pltpu.roll(p, -o % p.shape[0], 0)
            acc += pltpu.roll(vals[1 + j] * p, o % p.shape[0], 0)
        return acc

    def psum(a):  # per-sample inner product -> (1, Bt)
        return jnp.sum(a, axis=0, keepdims=True)

    coarse = None
    if wt_ref is not None:
        # two-level deflation (ops/deflation.py): Wt (m, n) bf16 shared
        # across tiles, binv (m, m, Bt) per-lane-sample coarse inverses
        def apply_WT(r):  # (n, Bt) -> (m, Bt)
            return jax.lax.dot_general(
                wt_ref[:], r.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        def binv_fn(y):  # (m, Bt) -> (m, Bt)
            return jnp.sum(binv_ref[:] * y[None, :, :], axis=1)

        def apply_W(c):  # (m, Bt) -> (n, Bt)
            return jax.lax.dot_general(
                wt_ref[:], c.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        coarse = (apply_WT, apply_W, binv_fn)

    x, it = _jacobi_cg(
        matvec, psum, vals_ref[:], F_ref[:], x0_ref[:], tol2_ref[0],
        maxiter=maxiter, check_every=check_every, coarse=coarse, diag_slot=0,
    )
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
    Wt: jax.Array | None = None,  # (m, n) deflation basis (ops/deflation.py)
    Binv: jax.Array | None = None,  # (B, m, m) per-sample coarse inverses
):
    """Lane-tiled fused PCG (see _pcg_kernel_lanes). B must be a multiple of
    tile (solve_fom_stencil_pallas pads). Returns (x: (B, n), iters: (B,) —
    each tile's joint iteration count). offsets: the full 7-entry DIA offset
    tuple; only the upper planes ship to the kernel (symmetric matvec)."""
    B, n, seven = vals_flat.shape
    assert seven == 7 and B % tile == 0
    assert len(offsets) == 7
    offs_pos = tuple(offsets[DIAG_SLOT + 1:])
    dtype = vals_flat.dtype
    tol2 = jnp.asarray([tol * tol], dtype)
    n_tiles = B // tile

    # lanes layout: (n_tiles, 4, n, tile) upper planes only (A symmetric —
    # _pcg_kernel_lanes reconstructs the -o contributions by rolling);
    # XLA does these transposes in HBM
    vals_t = vals_flat[:, :, DIAG_SLOT:].reshape(n_tiles, tile, n, 4).transpose(0, 3, 2, 1)
    F_bt = jnp.broadcast_to(F_flat[:, None], (n, tile))
    if x0_flat is None:
        x0_t = jnp.zeros((n_tiles, n, tile), dtype)
    else:
        x0_t = x0_flat.reshape(n_tiles, tile, n).transpose(0, 2, 1)

    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, n, tile), dtype),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((1, 4, n, tile), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    extra = []
    if Wt is not None:
        m = Wt.shape[0]
        # per-lane-sample coarse inverses: (n_tiles, m, m, tile)
        binv_t = Binv.reshape(n_tiles, tile, m, m).transpose(0, 2, 3, 1)
        extra = [Wt.astype(jnp.bfloat16), binv_t]
        in_specs.extend([
            pl.BlockSpec((m, n), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m, tile), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )

    def kern(tol2_ref, vals_ref, F_ref, x0_ref, *rest):
        if Wt is not None:
            wt_ref, binv_ref, out_ref, it_ref = rest
            binv_ref = binv_ref.at[0]
        else:
            (out_ref, it_ref), wt_ref, binv_ref = rest, None, None
        _pcg_kernel_lanes(
            tol2_ref, vals_ref.at[0], F_ref, x0_ref.at[0], out_ref.at[0], it_ref.at[0],
            maxiter=maxiter, offsets=offs_pos, check_every=check_every,
            wt_ref=wt_ref, binv_ref=binv_ref,
        )

    est_iters = max(maxiter // 4, 64)
    cost = pl.CostEstimate(
        flops=int(B * est_iters * n * 26),
        bytes_accessed=int(B * (4 + 4) * n * 4),
        transcendentals=0,
    )
    x, iters = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(1024 * 1024 * 127)),
        cost_estimate=cost,
    )(tol2, vals_t, F_bt, x0_t, *extra)
    x = x.transpose(0, 2, 1).reshape(B, n)
    return x, jnp.repeat(iters[:, 0, 0], tile)


def _pcg_kernel_sublanes(tol2_ref, vals_ref, F_ref, x0_ref, out_ref, it_ref, *, maxiter: int, offsets, check_every: int = 16, wt_ref=None, binv_ref=None):
    """CG for a SUBLANE-TILE of samples: state (S, n), one sample per sublane
    row, the whole flat grid on the lane axis.

    This is the layout that keeps batching alive at resolutions where the
    lane-tiled kernel's (n, 128) working set no longer fits VMEM (res >= 8 —
    VERDICT r2 item 1): per-sample VMEM cost is n*4 bytes per array instead
    of 128x that, so S = 8..64 samples still iterate together. Every vector
    op is S*n wide (vs n for the single-sample kernel, which is ~97%
    latency-bound on the serial reduce->broadcast chain), per-sample inner
    products are lane-axis reductions to (S, 1), and alpha/beta broadcast
    back along lanes. Stencil shifts are lane-axis rolls by the FLAT offset
    (wrap-around reads are multiplied by structurally-zero stencil values —
    same argument as _shift).

    vals_ref holds only the 4 UPPER planes [0, +o1, +o2, +o3] (slot 0 =
    main diagonal): A is symmetric, so the -o contribution is
    roll(vals[+o]*p, o) — same op count, 43% less vals VMEM/HBM (what fits
    the m=128 deflation basis at res16). offsets: the 3 POSITIVE offsets."""
    def matvec(vals, p):  # (S, n) symmetric stencil apply, lane-axis rolls
        # planes may arrive bf16 (planes_bf16 experiment — VERDICT r4
        # missing-4): cast per use so products/accumulation stay in the CG
        # state dtype (f32). Identity when planes are already f32.
        f32 = lambda a: a.astype(p.dtype)
        acc = f32(vals[0]) * p
        for j, o in enumerate(offsets):
            acc += f32(vals[1 + j]) * pltpu.roll(p, -o % p.shape[1], 1)
            acc += pltpu.roll(f32(vals[1 + j]) * p, o % p.shape[1], 1)
        return acc

    def psum(a):  # per-sample inner product -> (S, 1)
        return jnp.sum(a, axis=1, keepdims=True)

    coarse = None
    if wt_ref is not None:
        # two-level deflation (ops/deflation.py): Wt (m, n) bf16 shared
        # across tiles, binv (S, m, m) per-sample coarse inverses
        def apply_WT(r):  # (S, n) -> (S, m)
            return jax.lax.dot_general(
                r.astype(jnp.bfloat16), wt_ref[:],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        def binv_fn(y):  # (S, m) -> (S, m)
            return jnp.sum(binv_ref[:] * y[:, None, :], axis=2)

        def apply_W(c):  # (S, m) -> (S, n)
            return jax.lax.dot_general(
                c.astype(jnp.bfloat16), wt_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        coarse = (apply_WT, apply_W, binv_fn)

    # x0_ref=None: cold start synthesized in-kernel (no VMEM block at all)
    x0 = jnp.zeros(out_ref.shape, F_ref.dtype) if x0_ref is None else x0_ref[:]
    x, it = _jacobi_cg(
        matvec, psum, vals_ref[:], F_ref[:], x0, tol2_ref[0],
        maxiter=maxiter, check_every=check_every, coarse=coarse, diag_slot=0,
    )
    out_ref[:] = x
    it_ref[:] = jnp.full(it_ref.shape, it, jnp.int32)


@partial(jax.jit, static_argnames=("maxiter", "tile", "offsets", "check_every", "chunk", "planes_bf16"))
def pcg_stencil_batch_sublanes(
    vals_flat: jax.Array,  # (B, n, 7) flat per-sample diagonal values
    F_flat: jax.Array,  # (n,)
    x0_flat: jax.Array | None = None,  # (B, n)
    *,
    tol: float = 1e-7,
    maxiter: int = 2000,
    tile: int = 8,
    offsets: tuple = (),
    check_every: int = 16,
    Wt: jax.Array | None = None,  # (m, n) deflation basis (ops/deflation.py)
    Binv: jax.Array | None = None,  # (B, m, m) per-sample coarse inverses
    chunk: bool | None = None,  # None = auto by VMEM estimate
    planes_bf16: bool = False,  # EXPERIMENT (VERDICT r4 missing-4): bf16 planes
):
    """Sublane-tiled fused PCG (see _pcg_kernel_sublanes). B must be a
    multiple of tile (solve_fom_stencil_pallas pads); tile a multiple of 8
    (the f32 sublane granule). Returns (x: (B, n), iters: (B,) — each
    tile's joint iteration count). offsets: the full 7-entry DIA offset
    tuple; only the upper planes ship to the kernel (symmetric matvec).

    x0_flat=None lowers a kernel with NO x0 operand (cold start synthesized
    in-kernel) — one less (tile, n) VMEM block, which matters at res16.

    When the multi-tile grid's double-buffered blocks would exceed VMEM
    (big n + resident deflation basis), the call self-chunks: lax.map over
    per-tile pallas_calls, each grid=(1,) and single-buffered. The lost
    cross-tile transfer overlap is ~15 us/tile of HBM traffic against
    multi-ms of in-kernel compute."""
    B, n, seven = vals_flat.shape
    assert seven == 7 and B % tile == 0 and tile % 8 == 0
    assert len(offsets) == 7
    offs_pos = tuple(offsets[DIAG_SLOT + 1:])
    dtype = vals_flat.dtype
    tol2 = jnp.asarray([tol * tol], dtype)
    n_tiles = B // tile
    m = 0 if Wt is None else Wt.shape[0]

    # (n_tiles, 4, S, n) upper planes only (A symmetric — the kernel
    # reconstructs -o contributions by rolling); the output (n_tiles, S, n)
    # reshapes straight back
    vals_t = vals_flat[:, :, DIAG_SLOT:].reshape(n_tiles, tile, n, 4).transpose(0, 3, 1, 2)
    if planes_bf16:
        # bf16 diagonal planes + f32 CG state/accumulation: halves the vals
        # VMEM residency (the binding budget at res>=8) at the cost of a
        # ~bf16-mantissa (~4e-3) PERTURBATION OF THE OPERATOR ITSELF — CG
        # then converges to the perturbed system's solution, so this is NOT
        # tolerance-preserving. Measured res8 datapoint + writeup:
        # artifacts/kernel_sweep_r5.json, docs/DESIGN.md §6.
        vals_t = vals_t.astype(jnp.bfloat16)
    F_1n = F_flat[None, :]
    x0_t = None if x0_flat is None else x0_flat.reshape(n_tiles, tile, n)

    # per-tile VMEM estimate with double buffering: 2x(4 vals planes [+x0]
    # + out) + ~7 live CG/temp arrays, all (tile, n) f32, + resident Wt bf16
    # + binv. Chunk to single-buffered per-tile calls when it busts the
    # physical 128M (measured: res16 S=8 deflated = 137M double-buffered).
    if chunk is None:
        chunk = n_tiles > 1 and sublanes_needs_chunking(
            n, tile, m, with_x0=x0_t is not None
        )
    if chunk and n_tiles > SUBLANES_MAX_UNROLL:
        raise ValueError(
            f"sublane-tiled PCG at n={n} needs self-chunking (VMEM) but "
            f"B={B} is {n_tiles} tiles > the {SUBLANES_MAX_UNROLL}-tile "
            "per-program limit (the remote Mosaic compile helper dies on "
            "more kernel instances). Split the batch across dispatches: "
            "chunked_batched_solve / sublanes_program_batch_limit."
        )

    def call(vals_c, x0_c, binv_c):
        nt = vals_c.shape[0]
        out_shape = (
            jax.ShapeDtypeStruct((nt, tile, n), dtype),
            jax.ShapeDtypeStruct((nt, 1, 128), jnp.int32),
        )
        in_specs = [
            pl.BlockSpec((1, 4, tile, n), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        ]
        ops = [vals_c, F_1n]
        if x0_c is not None:
            in_specs.append(pl.BlockSpec((1, tile, n), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM))
            ops.append(x0_c)
        if Wt is not None:
            in_specs.extend([
                pl.BlockSpec((m, n), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, m, m), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            ])
            ops.extend([Wt.astype(jnp.bfloat16), binv_c])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, tile, n), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
        )

        def kern(tol2_ref, vals_ref, F_ref, *rest):
            if x0_c is not None:
                x0_ref, rest = rest[0].at[0], rest[1:]
            else:
                x0_ref = None
            if Wt is not None:
                wt_ref, binv_ref, out_ref, it_ref = rest
                binv_ref = binv_ref.at[0]
            else:
                (out_ref, it_ref), wt_ref, binv_ref = rest, None, None
            _pcg_kernel_sublanes(
                tol2_ref, vals_ref.at[0], F_ref, x0_ref, out_ref.at[0], it_ref.at[0],
                maxiter=maxiter, offsets=offs_pos, check_every=check_every,
                wt_ref=wt_ref, binv_ref=binv_ref,
            )

        est_iters = max(maxiter // 4, 64)
        cost = pl.CostEstimate(
            flops=int(nt * tile * est_iters * n * 26),
            bytes_accessed=int(nt * tile * (4 + 4) * n * 4),
            transcendentals=0,
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(1024 * 1024 * 127)),
            cost_estimate=cost,
        )(tol2, *ops)

    binv_t = None if Wt is None else Binv.reshape(n_tiles, tile, m, m)
    if chunk:
        # trace-time unroll, NOT lax.map/scan: this environment's remote
        # AOT helper crashes (subprocess exit 1) on a pallas_call inside a
        # scan body, while N identical top-level custom calls compile fine
        # (the Mosaic payload is identical -> compiled once). XLA schedules
        # the calls sequentially; each runs grid=(1,) single-buffered.
        xs, its = [], []
        for t in range(n_tiles):
            x1, it1 = call(
                vals_t[t:t + 1],
                None if x0_t is None else x0_t[t:t + 1],
                None if binv_t is None else binv_t[t:t + 1],
            )
            xs.append(x1)
            its.append(it1)
        x = jnp.concatenate(xs, 0)
        iters = jnp.concatenate(its, 0)
    else:
        x, iters = call(vals_t, x0_t, binv_t)
    return x.reshape(B, n), jnp.repeat(iters[:, 0, 0], tile)


# one program may hold at most this many single-buffered kernel instances:
# the remote Mosaic compile helper compiles 4 unrolled per-tile calls at
# res16+deflation but dies (subprocess exit 1) on 6 or 8 (measured
# 2026-08-17)
SUBLANES_MAX_UNROLL = 4


def sublanes_needs_chunking(n: int, tile: int, m: int = 0, *, with_x0: bool = False) -> bool:
    """Would the multi-tile sublane grid bust VMEM double-buffered?

    Calibration (res16, S=8, m=128, x0 operand present, 2026-08-17):
    single-buffered total measured 127.0M of 128M = Wt 25.4M bf16 + binv +
    ~32 per-tile (tile, n)-f32 units — Mosaic keeps far more live
    temporaries than the naive 7-array CG state count; double buffering the
    windowed blocks adds them again (measured 137M pre-symmetric-matvec)."""
    per_tile = tile * n * 4
    dbl = (32 + 4 + 1 + (1 if with_x0 else 0)) * per_tile
    dbl += m * n * 2 + tile * m * m * 4
    return dbl > 120 * 1024 * 1024


def sublanes_program_batch_limit(
    n: int, tile: int = 8, m: int = 0, *, with_x0: bool = False
) -> int | None:
    """Max samples one dispatched program can solve at this problem size, or
    None if the multi-tile grid fits VMEM (no limit). Callers with bigger
    batches split across dispatches (chunked_batched_solve) — the dispatches
    pipeline asynchronously, so the per-program tunnel RTT amortizes."""
    if sublanes_needs_chunking(n, tile, m, with_x0=with_x0):
        return SUBLANES_MAX_UNROLL * tile
    return None


def chunked_batched_solve(solve_fn, ks: jax.Array, limit: int | None):
    """Eager dispatch-level batch splitter for (ks) -> (u, iters) solvers.

    Every chunk is padded to exactly `limit` samples so one compiled program
    serves all chunks; dispatches are queued back-to-back (JAX async) so the
    device runs them without waiting on the host."""
    B = ks.shape[0]
    if limit is None or B <= limit:
        return solve_fn(ks)
    us, its = [], []
    for i in range(0, B, limit):
        c = ks[i : i + limit]
        pad = limit - c.shape[0]
        if pad:
            c = jnp.concatenate([c, jnp.repeat(c[:1], pad, 0)], 0)
        u, it = solve_fn(c)
        if pad:
            u, it = u[:-pad], it[:-pad]
        us.append(u)
        its.append(it)
    return jnp.concatenate(us, 0), jnp.concatenate(its, 0)


def pick_layout(
    n: int, batch: int, vmem_budget_bytes: int = 100 * 1024 * 1024,
    deflated: bool = False,
) -> tuple[str, int]:
    """Choose the fused-PCG batching layout for problem size n and batch.

    ("lanes", 128): samples on the lane axis, state (n, 128) — the fastest
    layout, VMEM working set ~11*n*128*4 bytes with the symmetric 4-plane
    vals layout (only fits small meshes; res<=4 at the default budget).

    ("sublanes", S): samples on the sublane axis, state (S, n) — keeps
    batching alive at res>=8 (VERDICT r2 item 1). S is the largest multiple
    of 8 whose full VMEM footprint fits: ~(2x double-buffered 4 value planes
    + 2x2 in/out blocks + 4 live CG arrays + ~2 temporaries) * S * n * 4
    ≈ 18*S*n*4 bytes.

    ("single", 1): the per-sample 2-D grid kernel — fallback for problems
    too large for even an 8-sublane tile.

    deflated: the two-level coarse correction changes the optimal S. PLAIN
    kernels are VPU-issue-bound, so per-tile-iteration time scales ~linearly
    with S (S=8: 4.94us, S=16: 9.77us at res8) and throughput peaks at S=8
    (8: 1969/s, 16: 1905, 32: 1850 at res8 B=256). DEFLATED kernels spend
    their iteration on two (S x n)x(n x m) MXU matmuls that use only S of
    128 MXU rows — with the symmetric 4-plane kernel, S=16 measured 1.06-
    1.08x S=8 at res8 B=256 (4768-4773 -> 5026-5179 solves/s, fresh-input
    timing; the gap was 1.35x before the 4-plane rewrite shrank the VPU
    share), so take S=16 whenever its footprint still fits unchunked
    (res8: yes; res12/16: the m=128 basis + state busts VMEM — measured,
    and sublanes_needs_chunking agrees). Mosaic compile limits bite above
    32 anyway: S=40 at res8 crashes the compile helper; S=128 at res4 never
    finishes."""
    if batch >= 64 and 11 * n * 128 * 4 <= vmem_budget_bytes:
        return "lanes", 128
    S = (vmem_budget_bytes // (18 * n * 4)) // 8 * 8
    S = min(S, 8)
    if (
        deflated
        and batch >= 16
        and S >= 8
        and not sublanes_needs_chunking(n, 16, 128)
    ):
        S = 16
    if S >= 8:
        return "sublanes", S
    return "single", 1


def pick_sample_tile(n: int, batch: int, vmem_budget_bytes: int = 80 * 1024 * 1024) -> int:
    """Backwards-compatible wrapper over pick_layout: the lane tile (128)
    when the lanes layout fits, else 1. Prefer pick_layout (which can also
    return the sublane layout that replaces the 1-cliff at res>=8)."""
    working_set = 11 * n * 128 * 4
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


def effective_maxiter(maxiter: int, layout: str, deflated: bool) -> int:
    """The static loop bound solve_fom_stencil_pallas actually runs with:
    tiled layouts get 15% joint-convergence headroom; deflation halves the
    bound (iterations drop 3.3-5.6x). Exported so the solver-audit path
    (api.audit_fom_iters) can report the true cap."""
    if layout in ("lanes", "sublanes"):
        maxiter = int(maxiter * 1.15)
    if deflated and layout in ("lanes", "sublanes"):
        maxiter = max(96, int(maxiter * 0.5))
    return maxiter


def solve_fom_stencil_pallas(
    op,
    ks: jax.Array,
    *,
    tol: float = 1e-7,
    maxiter: int | None = None,
    x0: jax.Array | None = None,
    sample_tile: int | None = None,
    layout: str | None = None,
    deflation=None,
    coarse_inv: jax.Array | None = None,
    planes_bf16: bool = False,
):
    """Batched FOM solve through the fused Pallas kernel.

    op: fem.dia.StencilOperator; ks: (B, 5). Returns (u: (B, n) flat,
    iters: (B,)). x0: optional (B, n) flat warm starts. Non-differentiable
    fast path (snapshot generation, dataset sweeps, MCMC); the implicit-diff
    jnp path in fem.solve stays the gradient route.

    maxiter=None derives the tight resolution-scaled loop bound (see
    derived_maxiter) — prefer it: a hand-picked loose bound silently costs
    up to 12x runtime (Mosaic scheduling artifact).

    layout/sample_tile: batching layout (see pick_layout; None = auto by
    VMEM budget). layout in {"lanes", "sublanes", "single"}; sample_tile
    overrides the tile size (legacy: sample_tile=128 means lanes,
    sample_tile=1 means single). Tiling fills the VPU — a lone grid is
    latency-bound on the CG reduction chain.

    deflation: optional ops.deflation.DeflationBasis — adds the two-level
    coarse correction to the lanes/sublanes kernels (measured 3.3-5.6x
    iteration cut); the per-sample coarse inverses are a batched m x m
    XLA op before the kernel launch. The static loop bound shrinks with it
    (Mosaic runtime scales with the bound — CLAUDE.md rule 7).
    """
    if maxiter is None:
        maxiter = derived_maxiter(op.resolution)
    B = ks.shape[0]
    if layout is None:
        if sample_tile is None:
            layout, sample_tile = pick_layout(op.n, B, deflated=deflation is not None)
        elif sample_tile <= 1:
            layout = "single"
        elif sample_tile == 128 and 11 * op.n * 128 * 4 <= 100 * 1024 * 1024:
            layout = "lanes"
        else:
            layout = "sublanes"
    elif sample_tile is None:
        sample_tile = {"lanes": 128, "single": 1}.get(layout) or pick_layout(
            op.n, B, deflated=deflation is not None
        )[1]

    if layout == "single":
        vals2d = jax.vmap(op.vals_grid)(ks)  # (B, 7, X, Y)
        F2d = op.to_grid(op.F_root)
        x02d = None if x0 is None else jax.vmap(op.to_grid)(x0)
        x2d, iters = pcg_stencil_batch(vals2d, F2d, x02d, tol=tol, maxiter=maxiter)
        u = jax.vmap(op.from_grid)(x2d)
        return u, iters
    # lanes/sublanes layouts work on the FLAT 7-diagonal values directly.
    # A tile converges jointly (max over its samples, not the mean), so the
    # derived bound gets 15% headroom — measured: res16 tiles run to ~1.3x
    # the single-sample MEAN (which derived_maxiter already covers 1.5x);
    # without this the tile caps (unconverged); deflation then HALVES the
    # bound (iterations drop 3.3-5.6x). Kept tight: Mosaic runtime scales
    # with the static bound itself (CLAUDE.md rule 7).
    maxiter = effective_maxiter(maxiter, layout, deflation is not None)
    vals = jax.vmap(op.vals)(ks)  # (B, n, 7)
    Wt = Binv = None
    if deflation is not None:
        Wt = deflation.Wt.astype(op.dtype)
        if coarse_inv is not None:  # non-affine operators precompute these
            Binv = coarse_inv.astype(op.dtype)
        elif ks.shape[-1] == deflation.C.shape[0] - 1:  # affine 5-param path
            Binv = deflation.coarse_inverses(ks, op.biot).astype(op.dtype)
        else:  # generic: exact per-sample projection through the basis
            Binv = deflation.coarse_inverses_from_vals(op, vals).astype(op.dtype)
    pad = (-B) % sample_tile
    if pad:
        # pad with copies of sample 0 (converge together; sliced off)
        vals = jnp.concatenate([vals, jnp.repeat(vals[:1], pad, 0)], 0)
        if x0 is not None:
            x0 = jnp.concatenate([x0, jnp.repeat(x0[:1], pad, 0)], 0)
    if Binv is not None:
        pad_b = (-B) % sample_tile
        if pad_b:
            Binv = jnp.concatenate([Binv, jnp.repeat(Binv[:1], pad_b, 0)], 0)
    batch_fn = pcg_stencil_batch_lanes if layout == "lanes" else pcg_stencil_batch_sublanes
    kw = {}
    if layout == "sublanes" and planes_bf16:
        # bf16-plane experiment (VERDICT r4 missing-4) — sublanes only; NOT
        # tolerance-preserving (perturbs the operator by ~bf16 mantissa)
        kw["planes_bf16"] = True
    u, iters = batch_fn(
        vals, op.F_root, x0, tol=tol, maxiter=maxiter, tile=sample_tile,
        offsets=tuple(int(o) for o in op.offsets), Wt=Wt, Binv=Binv, **kw,
    )
    return u[:B], iters[:B]
