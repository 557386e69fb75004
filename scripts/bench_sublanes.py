"""TPU measurement: fused-PCG batching layouts at a given resolution.

Usage: python scripts/bench_sublanes.py RES [BATCH] [layout:tile,...]
e.g.   python scripts/bench_sublanes.py 8 256 single:1,sublanes:8,grid:16
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.models.five_param import FiveParamFin
from bayesianinferencedl_tpu.ops.pcg_stencil import (
    derived_maxiter, pick_layout, solve_fom_stencil_pallas,
)
from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform


def ks_batch(seed, n):
    return sample_log_uniform(jax.random.PRNGKey(seed), n).astype(jnp.float32)


def timed(fn, ks1, ks2):
    u, it = fn(ks1)
    float(jnp.sum(u))  # readback barrier
    t0 = time.perf_counter()
    u, it = fn(ks2)
    s = float(jnp.sum(u))
    dt = time.perf_counter() - t0
    return dt, float(jnp.mean(it)), s


def main():
    res = int(sys.argv[1])
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    use_defl = os.environ.get("DEFL", "0") == "1"
    configs = None
    if len(sys.argv) > 3:
        configs = []
        for spec in sys.argv[3].split(","):
            kind, t = spec.split(":")
            configs.append((kind, int(t)))
    mi = derived_maxiter(res)
    fin = FiveParamFin.create(resolution=res, biot=0.1, dtype=jnp.float32,
                              cg_tol=1e-7, cg_maxiter=mi)
    n = fin.op.n
    defl = fin.deflation_basis() if use_defl else None
    print(json.dumps({"res": res, "n": n, "grid": fin.op.grid_shape,
                      "auto": pick_layout(n, B), "maxiter": mi,
                      "deflation_m": defl.m if defl else 0}), flush=True)
    ks1, ks2 = ks_batch(1, B), ks_batch(2, B)

    if configs is None:
        configs = [("single", 1)]
        auto_kind, auto_t = pick_layout(n, B)
        if auto_kind != "single":
            configs.append((auto_kind, auto_t))

    for kind, t in configs:
        try:
            fn = lambda ks: solve_fom_stencil_pallas(
                fin.op, ks, tol=1e-7, maxiter=mi, layout=kind, sample_tile=t,
                deflation=defl)
            dt, iters, s = timed(fn, ks1, ks2)
            print(json.dumps({"layout": kind, "tile": t,
                              "solves_per_sec": round(B / dt, 1),
                              "mean_iters": round(iters, 1), "checksum": s}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"layout": kind, "tile": t, "error": str(e)[:2500]}),
                  flush=True)


if __name__ == "__main__":
    main()
