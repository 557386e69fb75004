"""Measure the Mosaic static-loop-bound tax on the deflated PCG kernels
(VERDICT r3 weak-2 / next-3).

CLAUDE.md rule 7: the fused kernel's runtime scales with the STATIC while
bound itself (12x at 2.7x the bound, same iteration count). The deflated
path currently runs effective bounds ~6x its measured joint iteration count
(res8: 92 iters vs bound 552; res16: 175 vs 1104) because effective_maxiter
only halves the plain-kernel bound. This script times solve rates at a
ladder of bounds to find the tight setting and prove convergence is intact
(iters must stay strictly below every candidate cap).

Writes artifacts/maxiter_tighten_r4.json.
Usage: timeout 1700 python scripts/maxiter_tighten.py
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
        derived_maxiter, effective_maxiter, pick_layout, solve_fom_stencil_pallas,
    )
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform

    t_all = time.perf_counter()
    out = {"experiment": "deflated-kernel static-bound ladder", "cases": []}

    def ks_batch(seed, n):
        return sample_log_uniform(jax.random.PRNGKey(seed), n).astype(jnp.float32)

    # (resolution, batch): the three rates the bench quotes
    for res, B in ((4, 4096), (8, 256), (16, 256)):
        fin = FiveParamFin.create(
            resolution=res, biot=0.1, dtype=jnp.float32, cg_tol=1e-7,
            cg_maxiter=derived_maxiter(res),
        )
        layout, tile = pick_layout(fin.op.n, B, deflated=True)
        defl = fin.deflation_basis()
        base_mi = derived_maxiter(res)
        base_eff = effective_maxiter(base_mi, layout, True)
        # candidate effective bounds: the current one, then tightenings;
        # effective = max(96, mi*1.15*0.5) for deflated tiled layouts, so
        # invert to the mi that lands on each target
        targets = sorted({base_eff, 384, 256, 192, 128, 96})
        case = {"resolution": res, "batch": B, "layout": f"{layout}:{tile}",
                "current_effective_bound": base_eff, "ladder": []}
        for eff in targets:
            if eff > base_eff:
                continue
            mi = max(1, int(np.ceil(eff / (1.15 * 0.5))))
            if effective_maxiter(mi, layout, True) != eff:
                mi += 1
            solve = jax.jit(lambda ks, mi=mi: solve_fom_stencil_pallas(
                fin.op, ks, tol=1e-7, maxiter=mi, deflation=defl))
            try:
                (u, iters), dt = _timed(solve, lambda i: (ks_batch(100 + i, B),))
                it_max = int(jnp.max(iters))
                rec = {
                    "effective_bound": eff,
                    "solves_per_sec": round(B / dt, 1),
                    "iters_max": it_max,
                    "iters_mean": round(float(jnp.mean(iters)), 1),
                    "hit_cap": bool(it_max >= eff),
                }
            except Exception as e:  # pragma: no cover
                rec = {"effective_bound": eff, "error": str(e)[:200]}
            case["ladder"].append(rec)
            print(f"[maxiter] res{res} B{B} eff={eff}: {rec}", flush=True)
        out["cases"].append(case)

    out["provenance"] = {
        "date": time.strftime("%Y-%m-%d"),
        "hardware": f"{jax.default_backend()} x{jax.device_count()}",
        "wall_seconds_total": round(time.perf_counter() - t_all, 1),
        "timing": "fresh log-uniform batches per repeat + forced readback",
    }
    path = os.path.join(REPO, "artifacts", "maxiter_tighten_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[maxiter] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
