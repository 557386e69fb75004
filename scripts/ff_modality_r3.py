"""Full-field posterior modality evidence (VERDICT r2 item 5, last clause).

Question: is the 64-dim RFF full-field posterior at the default 1e-3
observation noise multimodal the way the 5-param posterior is?

Method: run single-temperature pCN and PT-pCN on the same rom_nn likelihood
and data, and compare rank-normalized split-R-hat (infer/diagnostics.py).
Multimodality shows up exactly as the 5-param case did (bench.py module
docstring): single-temp chains park in basins (split-R-hat >> 1.05 no
matter how long), while the tempered ladder mixes (split-R-hat ~ 1).

Writes artifacts/ff_modality_r3.json. Run on the TPU (one process at a
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
    out_path = os.path.join(REPO, "artifacts", "ff_modality_r3.json")
    pipe = build_full_field_pipeline(
        resolution=4, n_features=64, n_snapshots=256, basis_size=40,
        k_basis_size=40, n_train=1024, surrogate_steps=3000,
        online_precision="high", seed=0,
    )
    rows = {}
    for sampler, extra in (
        ("pcn", {}),
        ("pt_pcn", {"n_temps": 5, "lambda_min": 0.02}),
    ):
        result, z_true, data, ess, rhat, wall = run_full_field_inversion(
            pipe, sampler=sampler, likelihood="rom_nn", noise_sigma=1e-3,
            n_chains=1024, n_steps=6000, n_burn=1000, beta=0.12,
            key=jax.random.PRNGKey(1), **extra,
        )
        rows[sampler] = {
            "rhat_split_max": round(float(jnp.max(rhat)), 4),
            "rhat_split_p90": round(float(jnp.quantile(rhat, 0.9)), 4),
            "ess_bulk_min": round(float(jnp.min(ess)), 1),
            "samples_per_sec": round(result.samples.shape[0] * 1024 / wall, 1),
            "accept_rate": round(
                float(jnp.mean(jnp.atleast_2d(result.accept_rate)[-1])), 3
            ),
        }
        print(sampler, rows[sampler], flush=True)

    verdict = (
        "multimodal (single-temp pCN strands, PT mixes)"
        if rows["pcn"]["rhat_split_max"] > 1.1
        and rows["pt_pcn"]["rhat_split_max"] < 1.05
        else (
            "unimodal at this noise (both samplers converge)"
            if rows["pcn"]["rhat_split_max"] < 1.05
            else "inconclusive at this chain length"
        )
    )
    art = {
        "question": "is the 64-dim RFF full-field posterior at 1e-3 noise multimodal?",
        "config": {
            "resolution": 4, "n_features": 64, "noise_sigma": 1e-3,
            "likelihood": "rom_nn", "n_chains": 1024, "n_steps": 6000,
            "n_burn": 1000, "beta": 0.12,
        },
        "samplers": rows,
        "verdict": verdict,
        "diag": "rank-normalized split R-hat / bulk ESS (Vehtari 2021)",
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"verdict": verdict, "file": out_path}))


if __name__ == "__main__":
    main()
