"""Delayed-acceptance frontier: subchain length x inner kernel vs ESS/s
(VERDICT r4 item 5 — the exact-FOM ESS/s lever that remains now that the
res>=8 Pallas kernel sits at a measured scheduling floor).

The economics: at res4 / 1024 chains one outer DA step costs one batched
FOM correction (~1024 solves, the dominant term) plus S coarse rom_nn
steps (~75x cheaper per step). The r4 bench fixed S=8, paying a FOM solve
every 8 cheap steps while the outer acceptance sat at 0.998 — far from
the regime where subchain drift starts killing corrections. Longer
subchains amortize the FOM solve over more decorrelation per outer step;
DA is EXACT for every S (the S-step coarse kernel is reversible w.r.t.
the coarse posterior — infer/delayed_acceptance.py), so the sweep is pure
throughput: ESS/s and ESS per fine evaluation, with posterior means
agreeing to MC error as the built-in correctness check.

Sweeps S in {8, 16, 32, 64, 128} for pCN subchains and {8, 32, 64} for
gradient-informed MALA subchains, unimodal 1e-2-noise regime (the r4
da_fom bench block's config: 1024 chains, 500 outer steps). Pipeline
loads from the bench cache when present (artifacts/bench_pipeline_cache.npz)
so the sweep measures sampling, not builds.

Incremental + resumable like scripts/iter_frontier.py: the artifact is
rewritten after every variant and finished variants are skipped on rerun.

Usage: timeout 3300 python scripts/da_frontier.py
Writes: artifacts/da_frontier_r5.json
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api import Pipeline, build_pipeline, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
)
from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "artifacts", "da_frontier_r5.json")
CACHE = os.path.join(REPO, "artifacts", "bench_pipeline_cache.npz")

# the r4 bench da_fom block's config (bench.py b_da_fom), S now the knob
BASE = PipelineConfig(
    mesh=MeshConfig(resolution=4),
    fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
    rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
    surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
    mcmc=MCMCConfig(
        n_chains=1024, n_steps=500, n_burn=150, beta=0.25, noise_sigma=1e-2,
        likelihood="fom", sampler="da_pcn",
    ),
)

VARIANTS = [
    ("pcn", 8), ("pcn", 16), ("pcn", 32), ("pcn", 64), ("pcn", 128),
    ("pcn", 256),  # the knee probe: ESS/kept hits 0.62 at S=128, so the
    # one-ESS-per-outer-step ceiling (~24k ESS/s at this chain count)
    # lands near S=256 — past it longer subchains only add coarse cost
    ("mala", 8), ("mala", 32), ("mala", 64),
    # chains scaling at the deployed S — MEASURED NEGATIVE: batch
    # efficiency saturates by 1024 chains (8 full lane tiles at res4), so
    # 4x chains costs 4.8x wall for 4x ESS — 7.6k ESS/s at S=64/c4096 vs
    # 9.1k at c1024, 13.2k at S=128/c4096 vs 14.5k at c1024. More chains
    # buy total posterior draws, not ESS/s; 1024 stays the bench config.
    ("pcn", 64, 4096), ("pcn", 128, 4096),
]


def _save(out):
    tmp = PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, PATH)


def main():
    out = {"variants": {}}
    if os.path.exists(PATH):
        with open(PATH) as f:
            out = json.load(f)
        print(f"resuming: {sorted(out['variants'])} done", flush=True)

    t0 = time.time()
    if os.path.exists(CACHE):
        pipe = Pipeline.load(CACHE)
        pipe = dataclasses.replace(pipe, config=BASE)
        print(f"pipeline loaded from bench cache in {time.time() - t0:.0f}s", flush=True)
    else:
        pipe = build_pipeline(BASE, metrics=MetricsLogger())
        print(f"pipeline built in {time.time() - t0:.0f}s", flush=True)

    for variant in VARIANTS:
        inner, S = variant[0], variant[1]
        chains = variant[2] if len(variant) > 2 else BASE.mcmc.n_chains
        name = f"{inner}_S{S}" + (f"_c{chains}" if len(variant) > 2 else "")
        if name in out["variants"]:
            continue
        cfg_v = dataclasses.replace(
            BASE, mcmc=dataclasses.replace(
                BASE.mcmc, subchain=S, da_inner=inner, n_chains=chains)
        )
        t0 = time.time()
        inv = run_inversion(dataclasses.replace(pipe, config=cfg_v),
                            metrics=MetricsLogger())
        wall = time.time() - t0
        kept = inv.result.samples.shape[0]
        flat = np.asarray(
            inv.result.samples.reshape(-1, inv.result.samples.shape[-1]), np.float64
        )
        n_fine = getattr(inv.result, "n_fine_evals", cfg_v.mcmc.n_steps + 1)
        row = {
            "inner": inner,
            "subchain": S,
            "n_chains": chains,
            "wall_seconds_incl_compile": round(wall, 1),
            "sampling_wall_seconds": round(inv.wall_seconds, 2),
            "outer_steps_per_sec": round(kept / inv.wall_seconds, 2),
            "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
            "ess_tail_min": round(float(jnp.min(inv.ess_tail)), 1),
            "ess_per_sec": round(inv.ess_per_sec, 2),
            "ess_per_fine_eval": round(float(jnp.min(inv.ess)) / n_fine, 3),
            "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
            "outer_accept": round(float(jnp.mean(inv.result.accept_rate)), 4),
            "inner_accept": round(float(jnp.mean(inv.result.inner_accept_rate)), 4),
            "posterior_mean": [round(float(v), 5) for v in flat.mean(axis=0)],
            "posterior_sd": [round(float(v), 5) for v in flat.std(axis=0)],
            "fom_iter_audit": {
                "cap": inv.fom_iter_cap, "max_iters": inv.fom_iter_max,
                "hit_cap_frac": inv.fom_hit_cap_frac,
            },
        }
        out["variants"][name] = row
        print(json.dumps({name: row}), flush=True)
        _save(out)

    # summary: every variant targets the SAME exact posterior; mean spread
    # across variants is the MC-error sanity check, the winner is ESS/s
    rows = out["variants"]
    ref = rows.get("pcn_S8")
    if ref:
        for name, r in rows.items():
            r["mean_abs_dev_vs_S8"] = round(float(np.mean(np.abs(
                np.array(r["posterior_mean"]) - np.array(ref["posterior_mean"])
            ))), 5)
            r["speedup_ess_s_vs_S8"] = round(
                r["ess_per_sec"] / ref["ess_per_sec"], 2
            )
    best = max(rows, key=lambda n: rows[n]["ess_per_sec"])
    out["summary"] = {
        "baseline": "pcn_S8 (the r2-r4 bench config)",
        "best": best,
        "best_ess_per_sec": rows[best]["ess_per_sec"],
        "best_speedup_vs_S8": rows[best].get("speedup_ess_s_vs_S8"),
        "note": (
            "DA is exact for every subchain length; mean_abs_dev_vs_S8 is "
            "the MC-error agreement check. ESS/s counts min bulk ESS over "
            "dims against sampling wall (compile excluded)."
        ),
    }
    _save(out)
    print(json.dumps(out["summary"]), flush=True)


if __name__ == "__main__":
    main()
