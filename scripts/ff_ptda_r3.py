"""Exact-FOM posterior on the MULTIMODAL full-field problem (round 3).

artifacts/ff_modality_r3.json measured that the 64-dim RFF posterior at
1e-3 noise is mildly multimodal/metastable (single-temp pCN plateaus at
split-R-hat 1.10; a x5 tempered ladder reaches 1.010 with 12x the bulk
ESS). This experiment runs the EXACT-full-order sampler for that regime —
pt_da_pcn: rom_nn subchains inside every temperature level, one batched
(K*G)-chain Pallas FOM correction per outer step, swaps on the carried fine
misfits — and records convergence + cost. The reference has no affordable
exact-FOM route on a multimodal problem at all (SURVEY.md §3.5: one
CPU solve per step per chain).

Writes artifacts/ff_ptda_r3.json. Run on the TPU (one process at a time).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bayesianinferencedl_tpu.api_full_field import (  # noqa: E402
    build_full_field_pipeline, run_full_field_inversion,
)


def main():
    pipe = build_full_field_pipeline(
        resolution=4, n_features=64, n_snapshots=256, basis_size=40,
        k_basis_size=40, n_train=1024, surrogate_steps=3000,
        online_precision="high", seed=0,
    )
    res, z_true, data, ess, rhat, wall = run_full_field_inversion(
        pipe, sampler="pt_da_pcn", likelihood="fom", noise_sigma=1e-3,
        n_chains=256, n_steps=3000, n_burn=1000, n_temps=4, lambda_min=0.05,
        adapt_ladder=True, subchain=8, key=jax.random.PRNGKey(3),
    )
    kept = res.samples.shape[0]
    out = {
        "experiment": "exact-FOM posterior, multimodal 64-dim full-field (1e-3 noise)",
        "sampler": "pt_da_pcn x4 adaptive temps, rom_nn subchains S=8",
        "n_chains": 256, "outer_steps": 3000, "burn": 1000,
        "rhat_split_max": round(float(jnp.max(rhat)), 4),
        "ess_bulk_min": round(float(jnp.min(ess)), 1),
        "ess_min_per_sec": round(float(jnp.min(ess)) / wall, 2),
        "samples_per_sec": round(kept * 256 / wall, 1),
        "outer_accept": round(float(jnp.mean(res.accept_rate)), 3),
        "swap_rate": [round(float(s), 3) for s in res.swap_rate],
        "ladder_final_mean": [
            round(float(l), 4)
            for l in jnp.mean(res.lambdas, axis=-1).tolist()
        ],
        "wall_seconds": round(wall, 2),
        "fom_batch_per_outer_step": "one (K*G = 1024-chain) fused Pallas call",
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "artifacts", "ff_ptda_r3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/ff_ptda_r3.json")


if __name__ == "__main__":
    main()
