"""Domain-decomposed FOM solve: the stencil operator sharded across devices
(spatial model parallelism; SURVEY.md §2c "what the TPU rebuild introduces").

The structured-grid stencil operator (fem/dia.py) makes distributed-memory
solves natural: shard the grid's X axis over the device mesh, exchange one-row
halos with ``jax.lax.ppermute`` per matvec, and reduce CG inner products with
``psum`` — all XLA collectives riding ICI. This is the scaling path for
meshes too large for a single chip's HBM (the fin at production resolutions
fits on one chip, so single-chip batched solves remain the default; this
module exists so the same framework spans both regimes and is exercised on
the virtual CPU mesh in CI).

Layout: u as (X, Y) grid, X padded to a multiple of 8 * n_devices, sharded
P(axis) on X. Stencil x-offsets are +-1, so each matvec needs exactly one row
from each neighbor. Y-offsets use lane rolls (wrap-around touches only zero
stencil values — same argument as ops/pcg_stencil.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from bayesianinferencedl_tpu.ops.pcg_stencil import OFFSETS_2D, DIAG_SLOT


def _halo_matvec(vals, u, axis: str):
    """Distributed 7-point stencil matvec on the local (Xl, Y) block.

    vals: (7, Xl, Y) local diagonal planes; u: (Xl, Y) local field.
    Exchanges one boundary row with each X-neighbor via ppermute.
    """
    n_dev = lax.axis_size(axis)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]  # send down (to higher index)
    bwd = [(i + 1, i) for i in range(n_dev - 1)]  # send up
    # row arriving from the upper neighbor (their last row); zeros at the edge
    from_above = lax.ppermute(u[-1:, :], axis, fwd)
    from_below = lax.ppermute(u[:1, :], axis, bwd)
    padded = jnp.concatenate([from_above, u, from_below], axis=0)  # (Xl+2, Y)

    Xl = u.shape[0]
    acc = jnp.zeros_like(u)
    for s, (dx, dy) in enumerate(OFFSETS_2D):
        rows = lax.dynamic_slice_in_dim(padded, 1 + dx, Xl, axis=0)
        if dy:
            rows = jnp.roll(rows, -dy, axis=1)
        acc = acc + vals[s] * rows
    return acc


def _pcg_sharded(vals, F, axis: str, tol: float, maxiter: int):
    """Jacobi-PCG on the sharded grid; inner products psum over the mesh."""
    diag = vals[DIAG_SLOT]
    inv_diag = jnp.where(diag != 0.0, 1.0 / jnp.where(diag != 0.0, diag, 1.0), 0.0)

    def dot(a, b):
        return lax.psum(jnp.sum(a * b), axis)

    b_nrm2 = jnp.maximum(dot(F, F), jnp.finfo(F.dtype).tiny)
    tol2 = jnp.asarray(tol, F.dtype) ** 2 * b_nrm2

    x = jnp.zeros_like(F)
    r = F - _halo_matvec(vals, x, axis)
    z = inv_diag * r
    p = z
    rz = dot(r, z)
    it0 = (rz * 0).astype(jnp.int32)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter + it0, dot(r, r) > tol2)

    def body(c):
        x, r, p, rz, it = c
        Ap = _halo_matvec(vals, p, axis)
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        return x, r, z + beta * p, rz_new, it + 1

    x, r, p, rz, it = lax.while_loop(cond, body, (x, r, z, rz, it0))
    return x, it


def solve_fom_domain_sharded(
    mesh: Mesh,
    op,
    k: jax.Array,
    *,
    tol: float = 1e-7,
    maxiter: int = 4000,
):
    """Solve A(k) u = F with the spatial grid sharded over the device mesh.

    op: fem.dia.StencilOperator (or the non-affine NodalStencilOperator).
    Returns (u_flat (n,), iters) — u gathered back to the replicated layout.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    x0, y0 = op.grid_shape0
    _, Y = op.grid_shape
    # pad X to a multiple of 8 * n_dev (padding rows carry zero stencil values
    # and zero load, so they are inert)
    Xp = int(np.ceil(x0 / (8 * n_dev)) * 8 * n_dev)

    def to_planes(arr_n7):  # (n, 7[, c]) flat-node leading -> (7[, c], Xp, Y)
        a = arr_n7[: op.n_grid]
        a = jnp.moveaxis(a, 0, -1).reshape(*a.shape[1:], x0, y0)
        pad = [(0, 0)] * (a.ndim - 2) + [(0, Xp - x0), (0, Y - y0)]
        return jnp.pad(a, pad)

    F2d = jnp.pad(op.F_root[: op.n_grid].reshape(x0, y0), ((0, Xp - x0), (0, Y - y0)))

    if hasattr(op, "comp_vals"):
        # affine operator: shard the ASSEMBLY too — each device assembles only
        # its own X-rows from the sharded component planes (the O(n) assembly
        # replicated per device would otherwise dominate per-device work at
        # high device counts; k itself is 5 replicated scalars)
        comp_p = to_planes(op.comp_vals)  # (7, 5, Xp, Y)
        ext_p = to_planes(op.ext_mass)  # (7, Xp, Y)
        fix_p = to_planes(op.fixed)  # (7, Xp, Y)
        biot = op.dtype.type(op.biot)

        def local(comp_l, ext_l, fix_l, F_l, k_r):
            k_l = jnp.asarray(k_r, comp_l.dtype)
            vals = (
                jnp.sum(comp_l * k_l[None, :, None, None], axis=1) + biot * ext_l + fix_l
            )
            return _pcg_sharded(vals, F_l, axis=axis, tol=tol, maxiter=maxiter)

        f = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(None, None, axis, None),
                    P(None, axis, None),
                    P(None, axis, None),
                    P(axis, None),
                    P(),
                ),
                out_specs=(P(axis, None), P()),
            )
        )
        u2d, iters = f(comp_p, ext_p, fix_p, F2d, k)
    else:
        # non-affine operator (nodal conductivity): assembly needs neighbor-k
        # couplings, so it runs replicated and only the solve is sharded
        planes = to_planes(op.vals(k))
        f = jax.jit(
            jax.shard_map(
                partial(_pcg_sharded, axis=axis, tol=tol, maxiter=maxiter),
                mesh=mesh,
                in_specs=(P(None, axis, None), P(axis, None)),
                out_specs=(P(axis, None), P()),
            )
        )
        u2d, iters = f(planes, F2d)
    u_flat = u2d[:x0, :y0].reshape(-1)
    u_flat = jnp.pad(u_flat, (0, op.n - op.n_grid))
    return u_flat, iters
