"""LIS-pCN dimension-scaling evidence (round 3; infer/lis.py).

Question: how much does the likelihood-informed subspace buy over plain pCN
and over the per-step-gradient samplers as the coefficient dimension grows,
on the full-field fin posterior in its unimodal (1e-2 noise) regime?

Method: one pipeline per dimension d in {64, 256}; identical data, chains,
and step budget for each sampler; rank-normalized split-R-hat and combined-
chain bulk ESS (infer/diagnostics.py); wall time from the fresh-key re-run
with forced readback (CLAUDE.md timing rule, via run_full_field_inversion).

Expected shape of the result (the sampler's premise): the informed rank
stays <= n_obs as d grows, so plain pCN's single beta degrades with d while
LIS-pCN's complement keeps moving at near-independence rates — the ESS gap
should WIDEN with d. mala_lap pays a likelihood gradient every step for its
mixing; LIS pays Jacobians once, offline.

Writes artifacts/lis_scaling_r3.json. Run on the TPU (one process at a
time — CLAUDE.md rule 1).
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
    out_path = os.path.join(REPO, "artifacts", "lis_scaling_r3.json")
    rows = {}
    for d in (64, 256):
        pipe = build_full_field_pipeline(
            resolution=4, n_features=d, n_snapshots=256, basis_size=40,
            k_basis_size=40, n_train=1024, surrogate_steps=3000,
            online_precision="high", seed=0,
        )
        rows[f"d{d}"] = {}
        for sampler, extra in (
            ("pcn", {}),
            ("lis_pcn", {"lis_points": 16}),
            ("mala_lap", {"mala_step": 0.1}),
        ):
            result, z_true, data, ess, rhat, wall = run_full_field_inversion(
                pipe, sampler=sampler, likelihood="rom_nn", noise_sigma=1e-2,
                n_chains=1024, n_steps=4000, n_burn=1000,
                key=jax.random.PRNGKey(1), **extra,
            )
            kept = result.samples.shape[0]
            rows[f"d{d}"][sampler] = {
                "rhat_split_max": round(float(jnp.max(rhat)), 4),
                "ess_bulk_min": round(float(jnp.min(ess)), 1),
                "ess_min_per_sec": round(float(jnp.min(ess)) / wall, 1),
                "samples_per_sec": round(kept * 1024 / wall, 1),
                "wall_seconds": round(wall, 3),
                "accept_rate": round(float(jnp.mean(result.accept_rate)), 3),
            }
            print(d, sampler, rows[f"d{d}"][sampler], flush=True)

    l64, p64 = rows["d64"]["lis_pcn"], rows["d64"]["pcn"]
    l256, p256 = rows["d256"]["lis_pcn"], rows["d256"]["pcn"]
    out = {
        "config": {
            "resolution": 4, "likelihood": "rom_nn", "noise_sigma": 1e-2,
            "n_chains": 1024, "n_steps": 4000, "n_burn": 1000,
            "diag": "rank-normalized split R-hat + combined-chain bulk ESS",
        },
        "rows": rows,
        "lis_vs_pcn_ess_rate": {
            "d64": round(l64["ess_min_per_sec"] / max(p64["ess_min_per_sec"], 1e-9), 2),
            "d256": round(l256["ess_min_per_sec"] / max(p256["ess_min_per_sec"], 1e-9), 2),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
