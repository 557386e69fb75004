"""Round-3 SVGD artifact: particle-transport inversion on the real fin.

Runs api.run_svgd_inversion (annealed SVGD) on the bench-grade pipeline,
certifies the moment-matched ensemble Gaussian with PSIS (the eki --psis
route — SVGD has no evaluable density of its own), and compares ensemble
mean/spread against a converged pCN reference posterior on the same data —
the like-for-like row next to artifacts/eki_r3.json (derivative-free) and
artifacts/vi_r3.json (Gaussian-family gradient fit). Saves
artifacts/svgd_r3.json.

Run on the real TPU: python scripts/svgd_r3.py
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
    from bayesianinferencedl_tpu.api import (
        build_pipeline, psis_certify, run_inversion, run_svgd_inversion,
    )
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    # the eki_r3.py / vi_r3.py config, for like-for-like comparison
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
        "config": "res4 r=40, noise 1e-2 (unimodal); SVGD J=512 annealed",
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

    for label, J, steps in (("J512", 512, 800), ("J2048", 2048, 800)):
        # warm + timed run, fresh key (CLAUDE.md timing rule;
        # run_svgd_inversion forces the readback via block_until_ready)
        run_svgd_inversion(pipe, "rom_nn", n_particles=J, n_steps=steps,
                           data=inv.data, key=key)
        res, _, _, wall = run_svgd_inversion(
            pipe, "rom_nn", n_particles=J, n_steps=steps,
            data=inv.data, key=jax.random.fold_in(key, 1),
        )
        m = np.asarray(res.mean)
        s = np.asarray(res.std)
        ens = np.asarray(res.particles, np.float64)
        cov = np.cov(ens.T) + 1e-12 * np.eye(ens.shape[1])
        q_chol = jnp.asarray(np.linalg.cholesky(cov), pipe.prior.mean.dtype)
        cert = psis_certify(
            pipe, jnp.asarray(ens.mean(0), pipe.prior.mean.dtype), q_chol,
            inv.data, "rom_nn", n_draws=4096, key=jax.random.fold_in(key, 2),
        )
        out["kernels"][label] = {
            "n_particles": J,
            "n_steps": steps,
            "n_forward_evals": res.n_forward,
            "wall_seconds": round(wall, 3),
            "mean_abs_err_vs_pcn": round(float(np.abs(m - ref_mean).mean()), 4),
            "std_ratio_vs_pcn": [round(float(x), 3) for x in s / ref_std],
            "posterior_mean": [round(float(x), 4) for x in m],
            "psis_moment_matched": {
                "n_draws": 4096,
                "k_hat": round(cert.k_hat, 3),
                "reliable": bool(cert.reliable),
                "ess": round(cert.ess, 1),
                "corrected_mean_abs_err_vs_pcn": round(
                    float(np.abs(cert.mean - ref_mean).mean()), 4
                ),
            },
        }
        print(label, out["kernels"][label], flush=True)

    path = os.path.join(REPO, "artifacts/svgd_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
