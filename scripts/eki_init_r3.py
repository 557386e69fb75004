"""Round-3 EKI warm-start artifact: how much burn-in does init='eki' buy?

On the bench-grade pipeline (rom_nn, unimodal 1e-2 noise), runs pcn at
4096 chains with ZERO and SHORT burn-in budgets under prior vs EKI chain
initialization, scoring each against a long converged reference (split
R-hat + posterior-mean error). The claim under test: warm-started chains
begin inside the posterior bulk, so the burn-in the prior-init run spends
diffusing there is simply not needed. Saves artifacts/eki_init_r3.json.

Run on the real TPU: python scripts/eki_init_r3.py
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from dataclasses import replace

    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
        mcmc=MCMCConfig(
            noise_sigma=1e-2, likelihood="rom_nn", n_chains=4096,
            n_steps=6000, n_burn=2000,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(41)
    theta_true = pipe.prior.sample(jax.random.split(key)[0])

    # long converged reference
    ref = run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                        theta_true=theta_true, key=key)
    ref_mean = np.asarray(ref.result.samples.mean(axis=(0, 1)))

    out = {
        "config": "res4 r=40 rom_nn, noise 1e-2 (unimodal), 4096 chains, 500 kept steps",
        "reference_rhat": round(float(jnp.max(ref.rhat)), 4),
        "budgets": {},
    }
    for burn in (0, 50, 200):
        row = {}
        for init in ("prior", "eki"):
            c2 = replace(cfg, mcmc=replace(
                cfg.mcmc, n_burn=burn, n_steps=burn + 500))
            p2 = replace(pipe, config=c2)
            inv = run_inversion(p2, likelihood="rom_nn", sampler="pcn",
                                init=init, theta_true=theta_true,
                                data=ref.data, key=jax.random.fold_in(key, burn))
            m = np.asarray(inv.result.samples.mean(axis=(0, 1)))
            row[init] = {
                "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
                "mean_abs_err_vs_ref": round(float(np.abs(m - ref_mean).mean()), 4),
                "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
            }
        out["budgets"][f"burn={burn}"] = row
        print(burn, row, flush=True)

    path = os.path.join(REPO, "artifacts/eki_init_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
