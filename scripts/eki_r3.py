"""Round-3 EKI artifact: derivative-free ensemble inversion on the real fin.

Runs api.run_eki_inversion on the bench-grade pipeline for the rom_nn AND
the exact-physics fom likelihoods (the fom variant is one fused Pallas
deflated-CG dispatch per tempering increment — derivative-free full-order
inversion), and compares the ensemble mean/spread against a converged pCN
reference posterior on the same data. Saves artifacts/eki_r3.json.

Run on the real TPU: python scripts/eki_r3.py
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from bayesianinferencedl_tpu.api import (
        build_pipeline, run_eki_inversion, run_inversion,
    )
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
            n_steps=4000, n_burn=1500,
        ),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(17)
    theta_true = pipe.prior.sample(jax.random.split(key)[0])

    out = {
        "config": "res4 r=40, noise 1e-2 (unimodal); J=1024 ensemble",
        "kernels": {},
    }

    # reference posterior (pCN, rom_nn likelihood) on the SAME data
    inv = run_inversion(pipe, likelihood="rom_nn", sampler="pcn",
                        theta_true=theta_true, key=key)
    ref_mean = np.asarray(inv.result.samples.mean(axis=(0, 1)))
    ref_std = np.asarray(inv.result.samples.std(axis=(0, 1)))
    out["pcn_reference"] = {
        "posterior_mean": [round(float(x), 4) for x in ref_mean],
        "posterior_std": [round(float(x), 4) for x in ref_std],
        "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
        "wall_seconds": round(inv.wall_seconds, 2),
        "n_forward_evals": int(cfg.mcmc.n_chains) * int(cfg.mcmc.n_steps),
    }

    from bayesianinferencedl_tpu.infer.eki import run_eki

    for like in ("rom_nn", "fom"):
        # one jitted forward shared by warm + timed run so the timed figure
        # is steady-state (fresh key, readback inside run_eki — CLAUDE.md
        # timing rule); run_eki_inversion is the same code path with a
        # per-call compile
        fwd = jax.jit(pipe.batched_forward_fn(like))
        run_eki(fwd, pipe.prior, inv.data, 1e-2, key, n_ensemble=1024)
        t0 = time.perf_counter()
        res = run_eki(fwd, pipe.prior, inv.data, 1e-2,
                      jax.random.fold_in(key, 1), n_ensemble=1024)
        wall = time.perf_counter() - t0
        m = np.asarray(res.mean)
        s = np.asarray(res.std)
        out["kernels"][like] = {
            "n_iters": len(res.ts) - 1,
            "n_forward_evals": res.n_forward,
            "wall_seconds": round(wall, 3),
            "mean_abs_err_vs_pcn": round(float(np.abs(m - ref_mean).mean()), 4),
            "std_ratio_vs_pcn": [round(float(x), 3) for x in s / ref_std],
            "posterior_mean": [round(float(x), 4) for x in m],
            "misfit_trace": [round(x, 1) for x in res.misfit_trace],
        }
        print(like, out["kernels"][like], flush=True)

    path = os.path.join(REPO, "artifacts/eki_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
