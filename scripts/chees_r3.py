"""Round-3 ChEES artifact: does cross-chain trajectory auto-tuning pick a
good n_leap on the production fin posterior?

Runs run_hmc_chees (infer/hmc.py) on the bench-grade rom_nn likelihood at
the unimodal 1e-2-noise regime and compares the winner's kept-phase ESS per
gradient evaluation (the HMC figure of merit) against hand-fixed
n_leap in {2, 8, 32} at identical kept budgets. Saves
artifacts/chees_r3.json: the probe table, the chosen length, per-L ESS/grad
and ESS/s, and the tuning overhead in gradient evaluations.

Run on the real TPU: python scripts/chees_r3.py
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

N_CHAINS = 2048
N_STEPS, N_BURN = 1500, 500


def _ess_per(res, grads, wall):
    from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk, split_rhat

    ess = float(jnp.min(ess_bulk(res.samples)))
    return {
        "ess_bulk_min": round(ess, 1),
        "rhat_split_max": round(float(jnp.max(split_rhat(res.samples))), 4),
        "grad_evals_kept": grads,
        "ess_per_grad": round(ess / grads, 6),
        "ess_per_sec": round(ess / wall, 1),
        "accept_rate": round(float(jnp.mean(res.accept_rate)), 3),
        "wall_seconds": round(wall, 2),
    }


def main():
    from bayesianinferencedl_tpu.api import build_pipeline
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.infer.hmc import run_hmc, run_hmc_chees
    from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
        mcmc=MCMCConfig(noise_sigma=1e-2, likelihood="rom_nn"),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)

    k_true, k_noise, k_init, k_run = jax.random.split(jax.random.PRNGKey(7), 4)
    theta_true = pipe.prior.sample(k_true)
    y = pipe.fin.forward(jnp.exp(theta_true))
    data = y + 1e-2 * jax.random.normal(k_noise, y.shape, y.dtype)
    fwd_b = pipe.batched_forward_fn("rom_nn", differentiable=True)
    misfit = gaussian_misfit(fwd_b, data, 1e-2)
    theta0 = pipe.prior.sample(k_init, (N_CHAINS,))
    kept = N_STEPS - N_BURN

    out = {
        "config": "res4 r=40 rom_nn online_precision=high, noise 1e-2 (unimodal)",
        "n_chains": N_CHAINS, "n_steps": N_STEPS, "n_burn": N_BURN,
        "fixed": {},
    }

    # auto: compile+tune once, then a timed fresh-key run (CLAUDE.md rule —
    # fresh inputs + readback). The probes re-run under the timed key; their
    # cost is inside wall_seconds, reported as tuning_overhead too.
    res, info = run_hmc_chees(
        misfit, pipe.prior, theta0, k_run,
        n_steps=N_STEPS, n_burn=N_BURN, step=0.1, batched=True,
    )
    t0 = time.perf_counter()
    res, info = run_hmc_chees(
        misfit, pipe.prior, theta0, jax.random.fold_in(k_run, 1),
        n_steps=N_STEPS, n_burn=N_BURN, step=0.1, batched=True,
    )
    float(jnp.sum(res.samples))
    wall = time.perf_counter() - t0
    L = info["n_leap"]
    cands = info["candidates"]
    pre = max(N_BURN // 2, 8)
    overhead = pre * cands[len(cands) // 2] + 48 * sum(cands) + max(N_BURN - pre, 8) * L
    out["auto"] = {
        **_ess_per(res, kept * L, wall),
        "n_leap_chosen": L,
        "probe_candidates": cands,
        "probe_chees_per_grad": [round(c, 6) for c in info["chees_per_grad"]],
        "probe_accept": [round(a, 3) for a in info["accept"]],
        "tuning_overhead_grads": overhead,
    }
    print("auto", out["auto"], flush=True)

    for Lf in (2, 8, 32):
        _ = run_hmc(misfit, pipe.prior, theta0, k_run,
                    n_steps=N_STEPS, n_burn=N_BURN, step=0.1, n_leap=Lf,
                    batched=True)
        t0 = time.perf_counter()
        r = run_hmc(misfit, pipe.prior, theta0, jax.random.fold_in(k_run, 2),
                    n_steps=N_STEPS, n_burn=N_BURN, step=0.1, n_leap=Lf,
                    batched=True)
        float(jnp.sum(r.samples))
        w = time.perf_counter() - t0
        out["fixed"][f"L={Lf}"] = _ess_per(r, kept * Lf, w)
        print(Lf, out["fixed"][f"L={Lf}"], flush=True)

    best_fixed = max(out["fixed"].values(), key=lambda d: d["ess_per_grad"])
    out["auto_vs_best_fixed_ess_per_grad"] = round(
        out["auto"]["ess_per_grad"] / best_fixed["ess_per_grad"], 3
    )
    path = os.path.join(REPO, "artifacts/chees_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
