"""Second round-4 kernel sweep: res16 bound ladder (with the chunked
dispatch wrapper maxiter_tighten.py missed) + sublane-tile sweep at res8/16
(VERDICT r3 next-3).

Writes artifacts/kernel_sweep_r4.json.
Usage: timeout 1700 python scripts/kernel_sweep2.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timed(fn, make_args, reps=3):
    out = fn(*make_args(999))
    jax.tree.leaves(out)[0].block_until_ready()
    best = float("inf")
    for i in range(reps):
        args = make_args(i)
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return out, best


def main() -> None:
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin
    from bayesianinferencedl_tpu.ops.pcg_stencil import (
        chunked_batched_solve, derived_maxiter, effective_maxiter, pick_layout,
        solve_fom_stencil_pallas, sublanes_program_batch_limit,
    )
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform

    t_all = time.perf_counter()
    out = {"experiment": "res16 bound ladder + sublane-tile sweep (chunk-aware)",
           "cases": []}

    def ks_batch(seed, n):
        return sample_log_uniform(jax.random.PRNGKey(seed), n).astype(jnp.float32)

    def run_case(res, B, tile, eff_target):
        """One (resolution, batch, sublane tile, effective bound) probe."""
        fin = FiveParamFin.create(
            resolution=res, biot=0.1, dtype=jnp.float32, cg_tol=1e-7,
            cg_maxiter=derived_maxiter(res),
        )
        defl = fin.deflation_basis()
        mi = max(1, int(np.ceil(eff_target / (1.15 * 0.5))))
        if effective_maxiter(mi, "sublanes", True) != eff_target:
            mi += 1
        solve_raw = jax.jit(lambda ks, mi=mi, tile=tile: solve_fom_stencil_pallas(
            fin.op, ks, tol=1e-7, maxiter=mi, deflation=defl,
            layout="sublanes", sample_tile=tile))
        lim = sublanes_program_batch_limit(fin.op.n, tile, defl.m)
        solve = lambda ks: chunked_batched_solve(solve_raw, ks, lim)
        try:
            (u, iters), dt = _timed(solve, lambda i: (ks_batch(100 + i, B),))
            it_max = int(jnp.max(iters))
            rec = {
                "resolution": res, "batch": B, "tile": tile,
                "effective_bound": eff_target,
                "program_batch_limit": lim,
                "solves_per_sec": round(B / dt, 1),
                "iters_max": it_max,
                "iters_mean": round(float(jnp.mean(iters)), 1),
                "hit_cap": bool(it_max >= eff_target),
            }
        except Exception as e:  # pragma: no cover
            rec = {"resolution": res, "batch": B, "tile": tile,
                   "effective_bound": eff_target, "error": str(e)[:200]}
        out["cases"].append(rec)
        print(f"[sweep2] {rec}", flush=True)

    # res16 bound ladder at the auto tile (S=8), chunk-aware this time
    for eff in (1104, 384, 256):
        run_case(16, 256, 8, eff)
    # res16 deeper tiles (chunked programs): S=16 halves tile count per batch
    run_case(16, 256, 16, 384)
    # res8 sublane-tile sweep at a mid bound (ladder was flat 96-552)
    for tile in (16, 24, 32):
        run_case(8, 256, tile, 256)

    out["provenance"] = {
        "date": time.strftime("%Y-%m-%d"),
        "hardware": f"{jax.default_backend()} x{jax.device_count()}",
        "wall_seconds_total": round(time.perf_counter() - t_all, 1),
        "timing": "fresh log-uniform batches per repeat + forced readback",
    }
    path = os.path.join(REPO, "artifacts", "kernel_sweep_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[sweep2] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
