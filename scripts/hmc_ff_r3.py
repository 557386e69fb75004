"""HMC vs the other gradient-informed samplers on the full-field posterior
(round 3; infer/hmc.py).

Question: once gradients are paid for, how should they be spent at d=64 —
one Langevin step per MH decision (mala_lap), a multi-step Hamiltonian
trajectory (hmc_lap), or not at all online (lis_pcn pays Jacobians offline,
pcn pays nothing)? Unimodal 1e-2-noise regime (the Laplace-seeded samplers'
validity regime, docs/SAMPLERS.md).

Budgets: mala_lap 4000 steps = 4000 gradient passes; hmc_lap 1000
trajectories x 8 leapfrog = 8000 passes (~2x the gradient budget, one MH
decision per 8); pcn/lis_pcn 4000 gradient-free steps. Reported per
sampler: min bulk ESS, ESS/s (the practical figure), and ESS per gradient
pass (the budget-normalized one). Wall time by the fresh-key readback rule.

Writes artifacts/hmc_ff_r3.json. Run on the TPU (one process at a time —
CLAUDE.md rule 1).
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

L = 8


def main():
    pipe = build_full_field_pipeline(
        resolution=4, n_features=64, n_snapshots=256, basis_size=40,
        k_basis_size=40, n_train=1024, surrogate_steps=3000,
        online_precision="high", seed=0,
    )
    cases = (
        ("pcn", dict(n_steps=4000, n_burn=1000), 0),
        ("lis_pcn", dict(n_steps=4000, n_burn=1000, lis_points=16), 0),
        # prior frame: the poorly-preconditioned regime, where multi-step
        # trajectories should pay...
        ("mala", dict(n_steps=4000, n_burn=1000, mala_step=0.1), 1),
        ("hmc", dict(n_steps=1000, n_burn=250, mala_step=0.1, hmc_leap=L), L),
        # ...and the Laplace frame: near-iid single steps, where they can't
        ("mala_lap", dict(n_steps=4000, n_burn=1000, mala_step=0.1), 1),
        ("hmc_lap", dict(n_steps=1000, n_burn=250, mala_step=0.1,
                         hmc_leap=L), L),
    )
    rows = {}
    for sampler, kw, grads_per_step in cases:
        res, z_true, data, ess, rhat, wall = run_full_field_inversion(
            pipe, sampler=sampler, likelihood="rom_nn", noise_sigma=1e-2,
            n_chains=1024, key=jax.random.PRNGKey(1), **kw,
        )
        kept = res.samples.shape[0]
        n_grad = (kw["n_steps"]) * grads_per_step
        e = float(jnp.min(ess))
        rows[sampler] = {
            "rhat_split_max": round(float(jnp.max(rhat)), 4),
            "ess_bulk_min": round(e, 1),
            "ess_min_per_sec": round(e / wall, 1),
            "ess_min_per_1k_grad_passes": (
                round(1e3 * e / n_grad, 1) if n_grad else None
            ),
            "kept_steps": kept,
            "wall_seconds": round(wall, 3),
            "accept_rate": round(float(jnp.mean(res.accept_rate)), 3),
        }
        print(sampler, rows[sampler], flush=True)

    out = {
        "config": {
            "resolution": 4, "n_features": 64, "likelihood": "rom_nn",
            "noise_sigma": 1e-2, "n_chains": 1024, "hmc_leap": L,
            "diag": "rank-normalized split R-hat + combined-chain bulk ESS",
        },
        "rows": rows,
        "hmc_vs_mala_per_grad": {
            "prior_frame": round(
                rows["hmc"]["ess_min_per_1k_grad_passes"]
                / max(rows["mala"]["ess_min_per_1k_grad_passes"], 1e-9), 2
            ),
            "laplace_frame": round(
                rows["hmc_lap"]["ess_min_per_1k_grad_passes"]
                / max(rows["mala_lap"]["ess_min_per_1k_grad_passes"], 1e-9), 2
            ),
        },
    }
    path = os.path.join(REPO, "artifacts", "hmc_ff_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
