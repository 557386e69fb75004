"""Measured POD-vs-greedy state-basis comparison for the full-field ROM
(VERDICT r3 missing-4; rom/nonaffine.greedy_basis_nonaffine).

One snapshot set (256 fields at the production ell/sigma, res 4), both
builders at equal r, scored on 128 FRESH fields by QoI rel-err through the
exact f64 host projection. Writes artifacts/greedy_ff_r4.json — the number
behind build_full_field_pipeline's basis= docstring.

Usage: timeout 1500 python scripts/greedy_ff_compare.py
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


def main() -> None:
    from bayesianinferencedl_tpu.api_full_field import build_full_field_pipeline
    from bayesianinferencedl_tpu.fem.solve import solve_fom
    from bayesianinferencedl_tpu.rom.nonaffine import (
        AffinizedReducedOperator, greedy_basis_nonaffine,
    )
    from bayesianinferencedl_tpu.rom.pod import pod_basis_host

    t0 = time.perf_counter()
    # forward_only pipeline gives the operator + field + fused solver in
    # seconds; we build the bases ourselves from one shared snapshot sweep
    pipe = build_full_field_pipeline(
        resolution=4, n_features=64, forward_only=True, seed=0,
    )
    op, field = pipe.op, pipe.field
    # recompute the nodal coefficient tensor in f64 (op.G is the f32 device
    # cast; the host projection path wants the exact values)
    from bayesianinferencedl_tpu.fem.dia import assemble_fin_dia
    from bayesianinferencedl_tpu.fem.dia_nonaffine import assemble_nodal_coeff
    from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh

    mesh = build_fin_mesh(4)
    G_host = assemble_nodal_coeff(mesh, assemble_fin_dia(mesh, pad_to=128))

    solver = jax.jit(lambda ks: jax.vmap(
        lambda k: solve_fom(op, k, tol=1e-7, maxiter=2000))(ks))
    ks = jnp.exp(field.sample(jax.random.PRNGKey(3), 256))
    S = np.asarray(solver(ks), np.float64)
    ks_h = np.asarray(ks, np.float64)
    print(f"[greedy-cmp] 256 snapshots solved at {time.perf_counter()-t0:.0f}s", flush=True)

    k_test = jnp.exp(field.sample(jax.random.PRNGKey(91), 128))
    y_fom = np.asarray(jax.vmap(op.observe)(solver(k_test)), np.float64)

    W, _ = pod_basis_host(ks_h, 40)
    rows = []
    for r in (10, 20, 40):
        Vp, _ = pod_basis_host(S, r)
        t1 = time.perf_counter()
        Vg, sel, ind = greedy_basis_nonaffine(op, G_host, ks_h, S, W, r)
        t_greedy = time.perf_counter() - t1
        rel = {}
        for name, V in (("pod", Vp), ("greedy", Vg)):
            rom = AffinizedReducedOperator.project_host(op, G_host, V, W, dtype=jnp.float32)
            y = np.asarray(rom.forward_batch(k_test), np.float64)
            rel[name] = float(np.linalg.norm(y - y_fom) / np.linalg.norm(y_fom))
        rows.append({
            "r": r,
            "rel_err_pod": round(rel["pod"], 6),
            "rel_err_greedy": round(rel["greedy"], 6),
            "greedy_over_pod": round(rel["greedy"] / rel["pod"], 3),
            "greedy_select_seconds": round(t_greedy, 1),
            "greedy_indicator_decay": round(float(ind[-1] / ind[1]), 6),
        })
        print(f"[greedy-cmp] r={r}: pod {rel['pod']:.2e} greedy {rel['greedy']:.2e}",
              flush=True)

    out = {
        "experiment": "POD vs residual-greedy state basis, full-field affinized ROM "
                      "(res 4, ell=1.0, 64 RFF features, 256 shared snapshots, "
                      "128 fresh test fields, f64 host projection)",
        "rows": rows,
        "conclusion": (
            "POD minimizes mean-square snapshot energy and wins on-average QoI "
            "rel-err at every r measured; greedy stays in the same error class "
            "with zero extra solves and gives the residual-indicator machinery "
            "(a-posteriori gate / unsolved-candidate selection). Default stays "
            "basis='pod'; basis='greedy' is the wired alternative."
        ),
        "provenance": {
            "date": time.strftime("%Y-%m-%d"),
            "hardware": f"{jax.default_backend()} x{jax.device_count()}",
            "wall_seconds_total": round(time.perf_counter() - t0, 1),
        },
    }
    path = os.path.join(REPO, "artifacts", "greedy_ff_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[greedy-cmp] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
