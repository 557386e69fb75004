"""Round-3 SBC artifact: calibrate the production pipeline's samplers.

Runs simulation-based calibration (infer/sbc.py) of the deployed rom_nn
likelihood on the bench-grade pipeline (res4, r=40, online_precision=high)
for the pcn and mala kernels, at the unimodal 1e-2-noise regime where
single-temperature kernels are the production choice. Saves
artifacts/sbc_r3.json with per-parameter rank-uniformity p-values.

Run on the real TPU: python scripts/sbc_r3.py
"""
import json
import os
import sys
import time

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import numpy as np

    from bayesianinferencedl_tpu.api import build_pipeline, run_sbc_check
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
        mcmc=MCMCConfig(noise_sigma=1e-2, likelihood="rom_nn"),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32)

    out = {
        "config": "res4 r=40 rom_nn online_precision=high, noise 1e-2 (unimodal)",
        "n_datasets": 128,
        "n_posterior_draws": 31,
        "kernels": {},
    }
    for sampler, kw in [
        ("pcn", {"n_steps": 2000, "n_burn": 1200}),
        ("mala", {"n_steps": 1200, "n_burn": 800, "step": 0.2}),
        # certifies the production tempered kernel: swap rule, ladder
        # adaptation + freeze, within-level tempered accept ratio
        ("pt_pcn", {"n_steps": 1500, "n_burn": 1000}),
    ]:
        t0 = time.time()
        res = run_sbc_check(
            pipe, "rom_nn", n_datasets=128, n_chains=31, n_bins=8,
            sampler=sampler, seed=1, **kw,
        )
        p = np.asarray(res.p_values)
        out["kernels"][sampler] = {
            **kw,
            "p_values": [round(float(x), 5) for x in p],
            "p_min": round(float(p.min()), 5),
            "calibrated": bool(p.min() > 0.005),
            "rank_counts": np.asarray(res.counts).tolist(),
            "accept_rate": round(float(np.mean(np.asarray(res.accept_rate))), 4),
            "wall_seconds": round(time.time() - t0, 1),
        }
        print(sampler, out["kernels"][sampler]["p_values"], flush=True)

    # full-field stack (64-dim RFF coefficients): Šidák-gated over d p-values
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_sbc_check_ff,
    )

    ffpipe = build_full_field_pipeline(resolution=4, seed=0)
    t0 = time.time()
    res = run_sbc_check_ff(
        ffpipe, "rom_nn", noise_sigma=1e-2, n_datasets=128, n_chains=31,
        n_steps=2000, n_burn=1400, seed=1,
    )
    p = np.asarray(res.p_values)
    d = p.shape[0]
    sidak = 1.0 - 0.99 ** (1.0 / d)
    out["full_field"] = {
        "config": "res4 d=64 rom_nn, noise 1e-2",
        "sampler": "pcn",
        "n_steps": 2000,
        "p_min": round(float(p.min()), 6),
        "sidak_threshold_alpha01": round(sidak, 6),
        "n_below_sidak": int((p < sidak).sum()),
        "calibrated": bool(p.min() > sidak),
        "accept_rate": round(float(np.mean(np.asarray(res.accept_rate))), 4),
        "wall_seconds": round(time.time() - t0, 1),
    }
    print("full_field", out["full_field"], flush=True)

    path = os.path.join(REPO, "artifacts/sbc_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
