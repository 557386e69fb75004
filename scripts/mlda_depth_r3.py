"""MLDA ladder-depth scaling at an expensive fine model (round 3;
infer/mlda.py).

mlda_vs_da_r3 measured the 3-level ladder's 1.43x win over single-screen DA
with a weak surrogate at res8. This experiment pushes both knobs: fine model
at res 16 (~99k dof, the most expensive mesh in the suite) with a weak
surrogate, comparing equal base-step budgets (12 rom_nn steps per fine
evaluation) across ladder DEPTHS:

  da    : rom_nn --------------------------------> res16   (subchain 12)
  mlda3 : rom_nn -> res8 FOM ---------------------> res16  ((6, 2))
  mlda4 : rom_nn -> res4 FOM -> res8 FOM ---------> res16  ((3, 2, 2))

Figure of merit: min bulk ESS per fine (res16) batch evaluation, plus each
rung's acceptance. Timing by the fresh-key readback rule. Exactness is the
same at every depth (recursive Christen-Fox; tests/test_mlda.py) — depth is
purely a cost/mixing trade.

Writes artifacts/mlda_depth_r3.json. Run on the TPU (one process at a time
— CLAUDE.md rule 1).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bayesianinferencedl_tpu.api import batched_fom_observe, build_pipeline  # noqa: E402
from bayesianinferencedl_tpu.config import (  # noqa: E402
    FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
    SurrogateConfig,
)
from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk, split_rhat  # noqa: E402
from bayesianinferencedl_tpu.infer.mlda import run_mlda_segmented  # noqa: E402
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit  # noqa: E402
from bayesianinferencedl_tpu.models.five_param import FiveParamFin  # noqa: E402

CHAINS, N_STEPS, N_BURN = 256, 600, 200


def main():
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=16),
        fem=FEMConfig(cg_tol=1e-7, cg_maxiter=3000),
        # deliberately weak surrogate — the regime where screens matter
        rom=ROMConfig(n_snapshots=64, basis_size=8, online_precision="high"),
        surrogate=SurrogateConfig(n_train=128, epochs=30),
        mcmc=MCMCConfig(n_chains=CHAINS, noise_sigma=1e-2, seed=0),
    )
    pipe = build_pipeline(cfg)
    key = jax.random.PRNGKey(7)
    k_true, k_noise, k_init, k_chain = jax.random.split(key, 4)
    theta_true = pipe.prior.sample(k_true)
    y_true = pipe.fin.forward(jnp.exp(theta_true))
    data = y_true + 1e-2 * jax.random.normal(k_noise, y_true.shape, jnp.float32)
    theta0 = pipe.prior.sample(k_init, (CHAINS,))

    misfit_fine = gaussian_misfit(pipe.batched_forward_fn("fom"), data, 1e-2)
    misfit_base = gaussian_misfit(pipe.batched_forward_fn("rom_nn"), data, 1e-2)

    def mid_misfit(resolution):
        fin = FiveParamFin.create(
            resolution=resolution, biot=cfg.fem.biot, dtype=jnp.float32,
            cg_tol=cfg.fem.cg_tol, cg_maxiter=cfg.fem.cg_maxiter,
        )
        return gaussian_misfit(batched_fom_observe(fin), data, 1e-2)

    mid8 = mid_misfit(8)
    mid4 = mid_misfit(4)

    ladders = {
        "da_s12": ((misfit_base, misfit_fine), (12,)),
        "mlda3_res8": ((misfit_base, mid8, misfit_fine), (6, 2)),
        "mlda4_res4_res8": ((misfit_base, mid4, mid8, misfit_fine), (3, 2, 2)),
    }
    rows = {}
    for tag, (misfits, subchains) in ladders.items():
        run = lambda k: run_mlda_segmented(
            misfits, pipe.prior, theta0, k,
            n_steps=N_STEPS, n_burn=N_BURN, beta=0.25, subchains=subchains,
            segment=32, batched=True,
        )
        res = run(k_chain)
        float(jnp.sum(res.samples[-1]))  # compile+readback
        t0 = time.perf_counter()
        res = run(jax.random.fold_in(k_chain, 1))
        float(jnp.sum(res.samples[-1]))
        wall = time.perf_counter() - t0
        ess = ess_bulk(res.samples)
        rhat = split_rhat(res.samples)
        e = float(jnp.min(ess))
        rows[tag] = {
            "rhat_split_max": round(float(jnp.max(rhat)), 4),
            "ess_bulk_min": round(e, 1),
            "ess_min_per_fine_eval": round(e / N_STEPS, 3),
            "ess_min_per_sec": round(e / wall, 1),
            "level_rates": [
                round(float(x), 3)
                for x in jnp.mean(res.level_rates, axis=1).tolist()
            ],
            "wall_seconds": round(wall, 2),
        }
        print(tag, rows[tag], flush=True)

    base = rows["da_s12"]["ess_min_per_fine_eval"]
    out = {
        "config": {
            "fine_resolution": 16, "n_dof_fine": 98945,
            "surrogate": "weak (r=8, 30 epochs)", "noise_sigma": 1e-2,
            "n_chains": CHAINS, "outer_steps": N_STEPS, "burn": N_BURN,
            "base_steps_per_fine_eval": 12,
        },
        "rows": rows,
        "vs_da_ess_per_fine_eval": {
            t: round(r["ess_min_per_fine_eval"] / max(base, 1e-9), 2)
            for t, r in rows.items()
        },
    }
    with open(os.path.join(REPO, "artifacts", "mlda_depth_r3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/mlda_depth_r3.json")


if __name__ == "__main__":
    main()
