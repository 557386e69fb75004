"""Flow-VI + NeuTra on the multimodal fin posterior (round 3).

The question this artifact answers: can the approximation layer reach the
MULTIMODAL 1e-3-noise regime — where every Gaussian fit is structurally
wrong and the certified answer so far has been the tempered samplers — and
what does flow-preconditioned (NeuTra) pCN buy against pt_pcn on the same
problem?

Protocol (one shared dataset, the bench config's res4/r40 pipeline):
  1. pt_pcn adaptive-ladder reference (the BENCH headline sampler): the
     certified posterior + stepping-stone evidence.
  2. Full-rank ADVI (Gaussian): fit + PSIS — expected to sit in one basin;
     its k-hat is recorded to show what the gate does/doesn't catch
     (infer/flow.py documents the mode-missing blind spot).
  3. Flow (SMC pretrain -> mass-covering MLE): fit + PSIS — corrected
     moments vs the PT reference, and the PSIS evidence leg vs PT's
     stepping-stone.
  4. NeuTra-pCN with that flow: split-R-hat / ESS on the EXACT posterior at
     single-chain cost, throughput vs pt_pcn.

Writes artifacts/flow_r3.json. Timing follows CLAUDE.md rules (fresh-input
dispatch, readback barriers); run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api import (
    build_pipeline,
    psis_certify,
    psis_certify_flow,
    run_flow_vi_inversion,
    run_inversion,
    run_neutra_inversion,
    run_vi_inversion,
)
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MCMCConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)
from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

NOISE = 1e-3
N_CHAINS = 4096
N_TEMPS = 5


def main(out_path: str = "artifacts/flow_r3.json") -> None:
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
        mcmc=MCMCConfig(
            n_chains=N_CHAINS, n_steps=15_000, n_burn=2_000, beta=0.25,
            noise_sigma=NOISE, likelihood="rom_nn", sampler="pt_pcn",
            n_temps=N_TEMPS, lambda_min=0.05, adapt_ladder=True,
        ),
    )
    log = MetricsLogger()
    pipe = build_pipeline(cfg, dtype=jnp.float32, metrics=log)
    rec: dict = {"config": "bench res4/r40 rom_nn", "noise_sigma": NOISE}

    # 1. PT reference (generates theta_true/data under cfg.seed)
    t0 = time.perf_counter()
    pt = run_inversion(pipe, metrics=log)
    pt_wall = time.perf_counter() - t0
    samples = np.asarray(pt.result.samples)  # (kept, C, d)
    pt_mean = samples.reshape(-1, 5).mean(0)
    pt_std = samples.reshape(-1, 5).std(0)
    theta_true, data = pt.theta_true, pt.data
    rec["pt_pcn_reference"] = {
        "n_chains": N_CHAINS, "n_temps": N_TEMPS,
        "rhat_split_max": round(float(jnp.max(pt.rhat)), 4),
        "ess_bulk_min": round(float(jnp.min(pt.ess)), 1),
        "posterior_mean": pt_mean.round(5).tolist(),
        "posterior_std": pt_std.round(5).tolist(),
        "log_evidence": None if pt.log_evidence is None else round(pt.log_evidence, 3),
        "samples_per_sec": round(pt.samples_per_sec, 1),
        "ess_per_sec": round(pt.ess_per_sec, 1),
        "wall_seconds": round(pt_wall, 2),
    }
    print("pt reference done:", rec["pt_pcn_reference"], file=sys.stderr)

    # 2. Gaussian ADVI + PSIS on the same data
    advi, _, _, advi_wall = run_vi_inversion(
        pipe, "rom_nn", n_steps=2000, n_mc=64, theta_true=theta_true,
        data=data, key=jax.random.PRNGKey(7), metrics=log,
    )
    cert_g = psis_certify(
        pipe, advi.theta_mean, advi.theta_chol, data, "rom_nn",
        n_draws=8192, key=jax.random.PRNGKey(8), metrics=log,
    )
    rec["advi_full_rank"] = {
        "wall_seconds": round(advi_wall, 2),
        "mean_abs_err_vs_pt": round(float(np.abs(np.asarray(advi.theta_mean) - pt_mean).mean()), 4),
        "psis_k_hat": round(cert_g.k_hat, 3),
        "psis_reliable": bool(cert_g.reliable),
        "psis_corrected_mean_abs_err": round(float(np.abs(cert_g.mean - pt_mean).mean()), 4),
        "psis_log_evidence": round(cert_g.log_evidence, 3),
    }
    print("advi done:", rec["advi_full_rank"], file=sys.stderr)

    # 3. Flow: SMC pretrain -> mass-covering MLE + PSIS
    # max_stages: at 1e-3 noise the adaptive SMC schedule spans ~6 decades
    # of lambda — 64 stages measured INSUFFICIENT (flow_fit_pipeline now
    # raises on an unfinished schedule instead of silently distilling the
    # hot population, which produced ~470x-too-wide fits in the first run)
    t0 = time.perf_counter()
    flow_res, _, _, flow_wall = run_flow_vi_inversion(
        pipe, "rom_nn", n_couplings=6, hidden=32,
        pretrain_particles=4096, pretrain_steps=3000,
        n_mutations=8, max_stages=256,
        theta_true=theta_true, data=data,
        key=jax.random.PRNGKey(9), metrics=log,
    )
    cert_f = psis_certify_flow(
        pipe, flow_res, data, "rom_nn", n_draws=8192,
        key=jax.random.PRNGKey(10), metrics=log,
    )
    rec["flow_smc_mle"] = {
        "n_couplings": 6, "pretrain_particles": 4096,
        "wall_seconds": round(flow_wall, 2),
        "mean_abs_err_vs_pt": round(float(np.abs(np.asarray(flow_res.theta_mean) - pt_mean).mean()), 4),
        "std_ratio_vs_pt": (np.sqrt(np.diag(np.asarray(flow_res.theta_cov))) / pt_std).round(3).tolist(),
        "psis_k_hat": round(cert_f.k_hat, 3),
        "psis_reliable": bool(cert_f.reliable),
        "psis_corrected_mean_abs_err": round(float(np.abs(cert_f.mean - pt_mean).mean()), 4),
        "psis_log_evidence": round(cert_f.log_evidence, 3),
    }
    print("flow done:", rec["flow_smc_mle"], file=sys.stderr)

    # 4. NeuTra-pCN: exact posterior in the flow frame, single-chain cost
    neutra = run_neutra_inversion(
        pipe, flow_res, data, "rom_nn", theta_true=theta_true,
        n_chains=N_CHAINS, n_steps=10_000, n_burn=2_000, thin=4,
        key=jax.random.PRNGKey(11), metrics=log,
    )
    ns = np.asarray(neutra.result.samples).reshape(-1, 5)
    rec["neutra_pcn"] = {
        "n_chains": N_CHAINS, "n_steps": 10_000,
        "rhat_split_max": round(float(jnp.max(neutra.rhat)), 4),
        "ess_bulk_min": round(float(jnp.min(neutra.ess)), 1),
        "ess_tail_min": None if neutra.ess_tail is None else round(float(jnp.min(neutra.ess_tail)), 1),
        "accept_rate": round(float(jnp.mean(neutra.result.accept_rate)), 3),
        "mean_abs_err_vs_pt": round(float(np.abs(ns.mean(0) - pt_mean).mean()), 4),
        "std_ratio_vs_pt": (ns.std(0) / pt_std).round(3).tolist(),
        "samples_per_sec": round(neutra.samples_per_sec, 1),
        "ess_per_sec": round(neutra.ess_per_sec, 1),
        "wall_seconds": round(neutra.wall_seconds, 2),
    }
    print("neutra done:", rec["neutra_pcn"], file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main(*sys.argv[1:])
