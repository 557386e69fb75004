"""bf16-diagonal-planes datapoint for the sublane PCG kernel (VERDICT r4
missing-4 — the last untried axis of the res>=8 kernel-ceiling sweep).

Hypothesis under test: bf16 planes + f32 CG state halve the vals VMEM
residency (the binding budget at res>=8), admitting larger sublane tiles —
but per-iteration speed stays at the measured Mosaic scheduling floor
(docs/DESIGN.md §6), and bf16 planes PERTURB THE OPERATOR (CG converges to
the perturbed system's solution, ~bf16-mantissa relative error), so the
variant cannot serve the 1e-7-tol production path regardless of speed.

Measures at res8, batch 256, deflated (the bench resolution_scaling
config): f32 vs bf16 planes at the auto tile (S=16) and at S=32 (the
headroom claim — does the doubled tile fit/compile and does it pay?), plus
each variant's solution error vs the f32 kernel. Res16 S=8 f32-vs-bf16 as
a second point if the budget allows.

Writes artifacts/kernel_bf16_r5.json (incremental, resumable).
Usage: timeout 1700 python scripts/bf16_stencil_r5.py
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
PATH = os.path.join(REPO, "artifacts", "kernel_bf16_r5.json")


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


def _save(out):
    tmp = PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, PATH)


def main() -> None:
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin
    from bayesianinferencedl_tpu.ops.pcg_stencil import (
        chunked_batched_solve, derived_maxiter, pick_layout,
        solve_fom_stencil_pallas, sublanes_program_batch_limit,
    )
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform

    out = {"experiment": "bf16 diagonal planes + f32 CG state, sublane kernel",
           "cases": {}}
    if os.path.exists(PATH):
        with open(PATH) as f:
            out = json.load(f)
        print(f"resuming: {sorted(out['cases'])} done", flush=True)

    def ks_batch(seed, n):
        return sample_log_uniform(jax.random.PRNGKey(seed), n).astype(jnp.float32)

    fins = {}
    refs = {}  # res -> f32 reference solutions on the shared probe batch

    def get_fin(res):
        if res not in fins:
            fin = FiveParamFin.create(
                resolution=res, biot=0.1, dtype=jnp.float32, cg_tol=1e-7,
                cg_maxiter=derived_maxiter(res),
            )
            fins[res] = (fin, fin.deflation_basis())
        return fins[res]

    B = 256
    ks_err = ks_batch(7, 64)  # fixed error-probe batch, shared across cases

    def run_case(res, tile, bf16):
        name = f"res{res}_S{tile}_{'bf16' if bf16 else 'f32'}"
        if name in out["cases"]:
            return
        fin, defl = get_fin(res)
        mi = derived_maxiter(res)
        solve_raw = jax.jit(lambda ks: solve_fom_stencil_pallas(
            fin.op, ks, tol=1e-7, maxiter=mi, deflation=defl,
            layout="sublanes", sample_tile=tile, planes_bf16=bf16))
        lim = sublanes_program_batch_limit(fin.op.n, tile, defl.m)
        solve = lambda ks: chunked_batched_solve(solve_raw, ks, lim)
        try:
            (u, iters), dt = _timed(solve, lambda i: (ks_batch(100 + i, B),))
            rec = {
                "resolution": res, "tile": tile, "planes": "bf16" if bf16 else "f32",
                "solves_per_sec": round(B / dt, 1),
                "iters_mean": round(float(jnp.mean(iters)), 1),
                "iters_max": int(jnp.max(iters)),
                "program_batch_limit": lim,
            }
            # solution error on the shared probe batch vs the f32 kernel at
            # the AUTO tile (the production configuration); reference kept
            # in-process only (recomputed on resume — cheap next to compiles)
            u_probe, _ = solve(ks_err)
            if res not in refs:
                _, auto_tile = pick_layout(fin.op.n, B, deflated=True)
                ref_raw = jax.jit(lambda ks: solve_fom_stencil_pallas(
                    fin.op, ks, tol=1e-7, maxiter=mi, deflation=defl,
                    layout="sublanes", sample_tile=auto_tile))
                ref_lim = sublanes_program_batch_limit(fin.op.n, auto_tile, defl.m)
                u_ref, _ = chunked_batched_solve(ref_raw, ks_err, ref_lim)
                refs[res] = np.asarray(u_ref, np.float64)
            u_ref = refs[res]
            u_np = np.asarray(u_probe, np.float64)
            rec["rel_err_vs_f32"] = float(
                np.linalg.norm(u_np - u_ref) / np.linalg.norm(u_ref)
            )
        except Exception as e:  # pragma: no cover - env-dependent
            rec = {"resolution": res, "tile": tile,
                   "planes": "bf16" if bf16 else "f32", "error": str(e)[:250]}
        out["cases"][name] = rec
        print(f"[bf16] {rec}", flush=True)
        _save(out)

    # res8: auto tile is S=16 (CLAUDE.md perf map). f32 baseline, bf16 at
    # the same tile, then the headroom question at S=32 both ways.
    for tile, bf16 in ((16, False), (16, True), (32, False), (32, True)):
        run_case(8, tile, bf16)
    # res16 second point (auto tile S=8)
    for tile, bf16 in ((8, False), (8, True)):
        run_case(16, tile, bf16)

    cases = {k: v for k, v in out["cases"].items() if "error" not in v}
    out["summary"] = {
        "note": (
            "bf16 planes perturb the operator itself (not just the "
            "iteration path): rel_err_vs_f32 ~ bf16 mantissa means the "
            "variant cannot serve the 1e-7-tol production path; the "
            "throughput column answers whether VMEM relief moves the "
            "measured Mosaic scheduling floor (DESIGN.md §6)."
        ),
        "solves_per_sec": {k: v["solves_per_sec"] for k, v in cases.items()},
        "rel_err_vs_f32": {k: v.get("rel_err_vs_f32") for k, v in cases.items()},
    }
    _save(out)
    print(json.dumps(out["summary"]), flush=True)


if __name__ == "__main__":
    main()
