"""Three-way model evidence on the fin: log Bayes factors FOM vs ROM vs ROM+NN.

SURVEY.md Appendix C requires the three-way likelihood comparison as a
first-class capability; infer/evidence.py makes it quantitative — each
tempered run returns log Z = log E_prior[exp(-Phi)], the prior-predictive
mass of the SAME data under each forward model, so differences are log Bayes
factors. Two regimes, chosen to show both sides of the evidence story:

- fine basis (r=30): the ROM can still fit the data at SOME parameter, so
  evidence TIES across models — evidence measures data fit, not parameter
  bias (the posterior-mean comparison in artifacts/four_way_r8.json is the
  instrument for bias).
- coarse basis (r=10): no parameter reproduces the data under the bare ROM,
  so its evidence collapses while ROM+NN (whose NN absorbs the model error)
  stays within MC error of the FOM — the paper's claim as a Bayes factor.

Writes artifacts/evidence_three_way_r3.json. CPU-friendly (res2 mesh);
run on TPU unchanged for larger meshes.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MCMCConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "evidence_three_way_r3.json")

LEGS = [
    ("rom", "pt_pcn", {}),
    ("rom_nn", "pt_pcn", {}),
    # fom rides tempered delayed acceptance: rom_nn subchains screen
    # proposals, exact FOM correction per outer step (the only affordable
    # way to temper a FOM likelihood)
    ("fom", "pt_da_pcn", {"n_steps": 3000, "n_burn": 1000, "subchain": 8}),
]


def run_basis(basis_size: int) -> dict:
    base = PipelineConfig(
        mesh=MeshConfig(resolution=2),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=800),
        rom=ROMConfig(n_snapshots=128, basis_size=basis_size, online_precision="highest"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=512, epochs=200),
        mcmc=MCMCConfig(
            n_chains=128, n_steps=6000, n_burn=2000, beta=0.25,
            noise_sigma=1e-3, likelihood="rom_nn", sampler="pt_pcn",
            n_temps=6, lambda_min=0.02, adapt_ladder=True, seed=0,
        ),
    )
    pipe = build_pipeline(base)
    rows = {}
    for like, smp, extra in LEGS:
        cfg = dataclasses.replace(
            base, mcmc=dataclasses.replace(base.mcmc, likelihood=like, sampler=smp, **extra)
        )
        t0 = time.time()
        inv = run_inversion(dataclasses.replace(pipe, config=cfg))
        rows[like] = {
            "sampler": smp,
            "log_evidence": round(inv.log_evidence, 3),
            "log_evidence_std": round(inv.log_evidence_std, 3),
            "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
            "wall_seconds": round(time.time() - t0, 1),
        }
        print(f"r={basis_size} {like}: {json.dumps(rows[like])}", flush=True)
    rows["log_bayes_factor_vs_fom"] = {
        k: round(rows[k]["log_evidence"] - rows["fom"]["log_evidence"], 2)
        for k in ("rom", "rom_nn")
    }
    return rows


def main() -> None:
    out = {
        "experiment": "three-way model evidence (log Bayes factors), same data/prior per basis",
        "estimator": "stepping-stone over the adapted PT ladder (infer/evidence.py); "
        "std = spread over chain groups",
        "config": "res2 fin, 1e-3 noise, 128 cold chains x 6 temps, adapt_ladder",
    }
    for r in (30, 10):
        out[f"basis_r{r}"] = run_basis(r)
        # flush after each basis so a killed run still leaves the fine-basis rows
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out["basis_r10"]["log_bayes_factor_vs_fom"]))


if __name__ == "__main__":
    main()
