"""Validate the r5 deployed DA subchain default (S=64) on the TEMPERED
sampler — the exact multimodal 1e-3 posterior (pt_da_pcn inherits
MCMCConfig.subchain, but the r5 frontier measured plain da_pcn at 1e-2;
this closes the one untested inheritor of the default change).

Same config as artifacts/ptda_fom_1e3noise.json's r3 long run except
subchain 8 -> 64 and outer steps scaled down 1500 -> 400 (each outer step
now advances 8x the coarse work; total coarse steps 25.6k vs r3's 12k,
total fine corrections 400 vs 1500). Pass criteria: posterior mean within
MC error of the r3 long run, outer cold acceptance ~0.99+, R-hat
comparable, and ESS per fine evaluation well above the S=8 run.

Usage: timeout 1800 python scripts/ptda_s64_r5.py
Writes: artifacts/ptda_s64_r5.json
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
CACHE = os.path.join(REPO, "artifacts", "bench_pipeline_cache.npz")
R3 = os.path.join(REPO, "artifacts", "ptda_fom_1e3noise.json")
OUT = os.path.join(REPO, "artifacts", "ptda_s64_r5.json")

CFG = PipelineConfig(
    mesh=MeshConfig(resolution=4),
    fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
    rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
    surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
    mcmc=MCMCConfig(
        n_chains=1024, n_steps=400, n_burn=120, beta=0.25, noise_sigma=1e-3,
        likelihood="fom", sampler="pt_da_pcn", n_temps=5, lambda_min=0.02,
        # subchain left at the DEPLOYED default (64) — the point of the test
    ),
)


def main():
    with open(R3) as f:
        r3 = json.load(f)
    ref = r3["long_run_1500_outer_steps"]

    t0 = time.time()
    if os.path.exists(CACHE):
        pipe = dataclasses.replace(Pipeline.load(CACHE), config=CFG)
        print(f"pipeline from cache in {time.time() - t0:.0f}s", flush=True)
    else:
        pipe = build_pipeline(CFG, metrics=MetricsLogger())

    t0 = time.time()
    inv = run_inversion(pipe, metrics=MetricsLogger())
    wall = time.time() - t0
    flat = np.asarray(inv.result.samples.reshape(-1, 5), np.float64)
    post_mean = flat.mean(axis=0)
    gap = float(np.mean(np.abs(post_mean - np.array(ref["post_mean"]))))
    # MC error scale of the comparison: r3 post SDs ~0.1-0.5 over ~32k ESS
    out = {
        "experiment": "pt_da_pcn at the deployed subchain=64 default, multimodal 1e-3 exact-FOM posterior",
        "config": {**r3["config"], "subchain": CFG.mcmc.subchain,
                   "outer_steps": CFG.mcmc.n_steps, "outer_burn": CFG.mcmc.n_burn},
        "r3_reference": {"subchain": 8, "outer_steps": 1500,
                         "post_mean": ref["post_mean"], "rhat_max": ref["rhat_max"],
                         "ess_min": ref["ess_min"], "wall_s": ref["wall_s"]},
        "this_run": {
            "wall_s_incl_compile": round(wall, 1),
            "sampling_wall_s": round(inv.wall_seconds, 2),
            "samples_per_sec": round(inv.samples_per_sec, 1),
            "ess_min": round(float(jnp.min(inv.ess)), 1),
            "ess_per_sec": round(inv.ess_per_sec, 2),
            "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
            "outer_accept_cold": round(float(jnp.mean(inv.result.accept_rate[-1])), 4),
            "swap_rate": [round(float(s), 3) for s in inv.result.swap_rate],
            "post_mean": [round(float(v), 4) for v in post_mean],
            "post_sd": [round(float(v), 4) for v in flat.std(axis=0)],
            "fom_iter_audit": {
                "cap": inv.fom_iter_cap, "max_iters": inv.fom_iter_max,
                "hit_cap_frac": inv.fom_hit_cap_frac,
            },
        },
        "mean_abs_gap_vs_r3": round(gap, 4),
        "ess_per_fine_eval_vs_r3": {
            "r3_S8": round(ref["ess_min"] / 1500, 2),
            "r5_S64": round(float(jnp.min(inv.ess)) / CFG.mcmc.n_steps, 2),
        },
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["this_run"]), flush=True)
    print(json.dumps({"mean_abs_gap_vs_r3": out["mean_abs_gap_vs_r3"],
                      "ess_per_fine_eval_vs_r3": out["ess_per_fine_eval_vs_r3"]}), flush=True)


if __name__ == "__main__":
    main()
