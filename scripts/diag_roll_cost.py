"""Diagnostic: what fraction of the sublane-PCG iteration is lane-roll cost?

Runs a fixed-iteration CG-shaped loop (tol=0 equivalent) in the (S, n)
sublane layout twice: real stencil matvec (7 generic lane rolls) vs a
roll-free stand-in (same FLOPs, no shifts). The gap is the roll cost.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesianinferencedl_tpu.models.five_param import FiveParamFin
from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform

DIAG_SLOT = 3


def make_kernel(offsets, n_iters, use_rolls):
    def kern(vals_ref, F_ref, out_ref):
        vals = vals_ref[:]  # (7, S, n)
        diag = vals[DIAG_SLOT]
        inv_diag = jnp.where(diag != 0.0, 1.0 / jnp.where(diag != 0.0, diag, 1.0), 0.0)

        def matvec(p):
            acc = vals[DIAG_SLOT] * p
            for s, o in enumerate(offsets):
                if s == DIAG_SLOT:
                    continue
                q = pltpu.roll(p, -o % p.shape[1], 1) if use_rolls else p
                acc += vals[s] * q
            return acc

        def psum(a):
            return jnp.sum(a, axis=1, keepdims=True)

        F = F_ref[:]
        x0 = jnp.zeros_like(vals[0])
        r0 = F - matvec(x0)
        z0 = inv_diag * r0
        rz0 = psum(r0 * z0)

        def one_iter(_, c):
            x, r, p, rz = c
            Ap = matvec(p)
            pAp = psum(p * Ap)
            alpha = jnp.where(pAp > 0.0, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv_diag * r
            rz_new = psum(r * z)
            beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
            p = z + beta * p
            return (x, r, p, rz_new)

        x, r, p, rz = lax.fori_loop(0, n_iters, one_iter, (x0, r0, z0, rz0))
        out_ref[:] = x

    return kern


@partial(jax.jit, static_argnames=("offsets", "n_iters", "use_rolls", "tile"))
def run(vals_flat, F_flat, *, offsets, n_iters, use_rolls, tile):
    B, n, seven = vals_flat.shape
    n_tiles = B // tile
    vals_t = vals_flat.reshape(n_tiles, tile, n, 7).transpose(0, 3, 1, 2)
    F_1n = F_flat[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 7, tile, n), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    )
    kern0 = make_kernel(offsets, n_iters, use_rolls)

    def kern(vals_ref, F_ref, out_ref):
        kern0(vals_ref.at[0], F_ref, out_ref.at[0])

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, n), vals_flat.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(1024 * 1024 * 127)),
    )(vals_t, F_1n)
    return out.reshape(B, n)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = 64
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_iters = 256
    fin = FiveParamFin.create(resolution=res, biot=0.1, dtype=jnp.float32,
                              cg_tol=1e-7, cg_maxiter=2000)
    offsets = tuple(int(o) for o in fin.op.offsets)
    ks = sample_log_uniform(jax.random.PRNGKey(1), B).astype(jnp.float32)
    vals = jax.vmap(fin.op.vals)(ks)
    ks2 = sample_log_uniform(jax.random.PRNGKey(2), B).astype(jnp.float32)
    vals2 = jax.vmap(fin.op.vals)(ks2)

    for use_rolls in (True, False):
        f = lambda v: run(v, fin.op.F_root, offsets=offsets, n_iters=n_iters,
                          use_rolls=use_rolls, tile=tile)
        float(jnp.sum(f(vals)))
        t0 = time.perf_counter()
        float(jnp.sum(f(vals2)))
        dt = time.perf_counter() - t0
        per_iter_us = dt / (B // tile) / n_iters * 1e6
        print(json.dumps({"res": res, "tile": tile, "use_rolls": use_rolls,
                          "per_tile_iter_us": round(per_iter_us, 2),
                          "total_s": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
