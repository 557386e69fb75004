"""Headline benchmark (BASELINE.md): full Bayesian inversion throughput.

Runs the end-to-end pipeline (FOM -> POD ROM -> NN error surrogate) and then
times the production MCMC: pCN with the fused ROM+NN likelihood, 1024 vmapped
chains, entirely on-device. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the reference north-star rate (BASELINE.json:
1e4 pCN samples in < 60 s => 166.7 samples/sec) since the reference repo
recorded no published numbers (SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig,
        MCMCConfig,
        MeshConfig,
        PipelineConfig,
        ROMConfig,
        SurrogateConfig,
    )
    from bayesianinferencedl_tpu.fem.solve import solve_fom
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=256, basis_size=40),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
        mcmc=MCMCConfig(
            n_chains=4096, n_steps=10_000, n_burn=1_000, beta=0.25,
            noise_sigma=1e-3, likelihood="rom_nn",
        ),
    )
    log = MetricsLogger()
    pipe = build_pipeline(cfg, dtype=jnp.float32, metrics=log)

    # --- forward solves/sec: FOM (batched) vs ROM+NN (the BASELINE metric) --
    ks = sample_log_uniform(jax.random.PRNGKey(3), 256).astype(jnp.float32)
    fom_batch = jax.jit(
        jax.vmap(lambda k: pipe.fin.op.observe(solve_fom(pipe.fin.op, k, tol=1e-7, maxiter=1500)))
    )
    y = fom_batch(ks)
    y.block_until_ready()
    t0 = time.perf_counter()
    y = fom_batch(ks)
    y.block_until_ready()
    fom_sps = 256 / (time.perf_counter() - t0)

    log_ks = jnp.log(ks)
    big = jnp.tile(log_ks, (64, 1))  # 16384 corrected-forward evals
    fwd = pipe.forward_fn("rom_nn")
    corr_batch = jax.jit(jax.vmap(fwd))
    yc = corr_batch(big)
    yc.block_until_ready()
    t0 = time.perf_counter()
    yc = corr_batch(big)
    yc.block_until_ready()
    corr_sps = big.shape[0] / (time.perf_counter() - t0)
    log.log("forward_solves_per_sec", fom=fom_sps, rom_nn=corr_sps, speedup=corr_sps / fom_sps)

    # --- the headline: pCN throughput with the fused ROM+NN likelihood ------
    # (shards the chain batch over the ICI mesh when >1 device is visible)
    mesh = None
    if jax.device_count() > 1:
        from bayesianinferencedl_tpu.parallel import device_mesh

        mesh = device_mesh()
    inv = run_inversion(pipe, metrics=log, mesh=mesh)

    # --- effective-sample rate with the Laplace-proposal sampler ------------
    # (BASELINE metric names "MCMC effective samples/sec"; the independence
    # sampler with the Laplace approximation as proposal is the framework's
    # best ESS/sec configuration)
    inv_mh = run_inversion(pipe, sampler="laplace_mh", metrics=log)

    kept_per_chain = inv.result.samples.shape[0]
    chain_steps_per_sec = kept_per_chain / inv.wall_seconds  # steps/sec along one chain (all chains in parallel)
    north_star_rate = 1e4 / 60.0  # BASELINE: 1e4 pCN samples in < 60 s

    out = {
        "metric": "pcn_samples_per_sec_rom_nn_4096chains",
        "value": round(inv.samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(inv.samples_per_sec / north_star_rate, 2),
        "detail": {
            "chain_steps_per_sec": round(chain_steps_per_sec, 2),
            "wall_seconds_10k_steps": round(inv.wall_seconds * 10_000 / (cfg.mcmc.n_steps - cfg.mcmc.n_burn), 3),
            "ess_min": round(float(jnp.min(inv.ess)), 1),
            "ess_per_sec": round(inv.ess_per_sec, 2),
            "accept_rate": round(float(jnp.mean(inv.result.accept_rate)), 3),
            "rhat_max": round(float(jnp.max(inv.rhat)), 4),
            "laplace_mh_ess_per_sec": round(inv_mh.ess_per_sec, 2),
            "laplace_mh_ess_min": round(float(jnp.min(inv_mh.ess)), 1),
            "laplace_mh_rhat_max": round(float(jnp.max(inv_mh.rhat)), 4),
            "fom_solves_per_sec": round(fom_sps, 2),
            "rom_nn_solves_per_sec": round(corr_sps, 2),
            "rom_rel_err": log.summary().get("rom_rel_err", {}).get("value"),
            "corrected_rel_err": log.summary().get("corrected_rel_err", {}).get("value"),
            "n_devices": jax.device_count(),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
