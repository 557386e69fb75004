"""MLDA vs single-screen DA on the fin FOM posterior (round 3; infer/mlda.py).

Question: what does the middle rung (coarse-resolution FOM) buy over plain
delayed acceptance at the SAME base-step budget per fine evaluation, and how
does the answer depend on surrogate quality?

Method: fine FOM at res 8, mid rung FOM at res 4, base rung rom_nn. Equal
fine-evaluation budgets (both samplers pay one fine batch per outer step)
and equal base steps per fine eval (da: subchain=6; mlda: subchain=3 x
mlda_subchain=2). Two regimes:
  * accurate surrogate (production ROM: r=40, trained NN) — DA's outer
    acceptance is already ~1, the mid rung can only add cost;
  * weak surrogate (r=8, 30 epochs) — DA's outer veto fires on surrogate
    bias; the mid rung absorbs it before the expensive correction.
Figure of merit: min bulk ESS per fine FOM evaluation (the DA family's
currency), plus outer acceptance and wall time.

Writes artifacts/mlda_vs_da_r3.json. Run on the TPU (one process at a time
— CLAUDE.md rule 1).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bayesianinferencedl_tpu.api import build_pipeline, run_inversion  # noqa: E402
from bayesianinferencedl_tpu.config import (  # noqa: E402
    FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
    SurrogateConfig,
)

N_STEPS, N_BURN, CHAINS = 600, 200, 256


def run_case(pipe, sampler):
    inv = run_inversion(pipe, sampler=sampler, likelihood="fom",
                        key=jax.random.PRNGKey(7))
    res = inv.result
    fine_evals = N_STEPS  # one fine batch per outer step, both samplers
    row = {
        "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
        "ess_min_per_fine_eval": round(float(jnp.min(inv.ess)) / fine_evals, 3),
        "ess_min_per_sec": round(inv.ess_per_sec, 1),
        "outer_accept": round(float(jnp.mean(res.accept_rate)), 3),
        "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
        "wall_seconds": round(inv.wall_seconds, 2),
    }
    if hasattr(res, "level_rates"):
        row["level_rates"] = [
            round(float(x), 3)
            for x in jnp.mean(res.level_rates, axis=1).tolist()
        ]
    if hasattr(res, "inner_accept_rate"):
        row["inner_accept"] = round(
            float(jnp.mean(res.inner_accept_rate)), 3
        )
    return row


def build(regime):
    rom = (
        ROMConfig(n_snapshots=256, basis_size=40, online_precision="high")
        if regime == "accurate"
        else ROMConfig(n_snapshots=64, basis_size=8, online_precision="high")
    )
    sur = (
        SurrogateConfig(n_train=1024, epochs=300)
        if regime == "accurate"
        else SurrogateConfig(n_train=128, epochs=30)
    )
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=8),
        fem=FEMConfig(cg_tol=1e-7, cg_maxiter=3000),
        rom=rom,
        surrogate=sur,
        mcmc=MCMCConfig(
            n_chains=CHAINS, n_steps=N_STEPS, n_burn=N_BURN,
            noise_sigma=1e-2, likelihood="fom",
            subchain=6, mlda_resolution=4, mlda_subchain=2, seed=0,
        ),
    )
    return build_pipeline(cfg)


def main():
    out = {
        "config": {
            "fine_resolution": 8, "mid_resolution": 4,
            "n_chains": CHAINS, "n_steps": N_STEPS, "n_burn": N_BURN,
            "noise_sigma": 1e-2,
            "base_steps_per_fine_eval": 6,
            "da": {"subchain": 6},
            "mlda": {"subchain": 3, "mlda_subchain": 2},
        },
        "regimes": {},
    }
    for regime in ("accurate", "weak"):
        pipe = build(regime)
        rows = {}
        rows["da_pcn"] = run_case(pipe, "da_pcn")
        print(regime, "da_pcn", rows["da_pcn"], flush=True)
        # mlda splits the same 6 base steps as 3 per mid step x 2 mid steps
        from dataclasses import replace

        pipe.config = replace(
            pipe.config, mcmc=replace(pipe.config.mcmc, subchain=3)
        )
        rows["mlda_pcn"] = run_case(pipe, "mlda_pcn")
        print(regime, "mlda_pcn", rows["mlda_pcn"], flush=True)
        d, m = rows["da_pcn"], rows["mlda_pcn"]
        rows["mlda_vs_da_ess_per_fine_eval"] = round(
            m["ess_min_per_fine_eval"] / max(d["ess_min_per_fine_eval"], 1e-9), 2
        )
        out["regimes"][regime] = rows

    path = os.path.join(REPO, "artifacts", "mlda_vs_da_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
