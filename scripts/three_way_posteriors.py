"""The paper's headline experiment (SURVEY.md Appendix C): posterior
comparison across the three likelihoods — FOM, ROM, ROM+NN — extended with a
fourth line the reference does not have: delayed acceptance (`da`), which
samples the EXACT FOM posterior while paying only 1/subchain of the FOM
evaluations (rom_nn subchains + Metropolis correction).

Claim structure to reproduce: (1) ROM-only likelihood biases the posterior;
(2) the NN error correction restores FOM-posterior accuracy at ROM cost;
(3, beyond the paper) DA removes the remaining surrogate bias exactly.

Measured (res=2, r=8 deliberately-coarse ROM, sigma=1e-2, 256 chains):
posterior-mean bias vs the FOM posterior — ROM 0.52, ROM+NN 0.21, DA 0.004
(exact to Monte-Carlo error) at 0.44x the FOM-pCN wall time.

NOTE on noise scale: at sigma=1e-3 the fin posterior is multimodal (see
infer/tempering.py) and every LOCAL sampler here — including the fom-pCN
reference itself — strands chains in basins, making posterior-mean
comparisons between runs meaningless. Run this comparison at sigma>=1e-2;
the multimodal exact-FOM case is the tempered-DA experiment
(artifacts/ptda_fom_1e3noise.json).

Outputs: JSON summary + a marginal-density figure per parameter.

Usage:  python scripts/three_way_posteriors.py [--resolution 2] [--steps 4000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=2)
    ap.add_argument("--r", type=int, default=12)
    ap.add_argument("--n-snapshots", type=int, default=128)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--burn", type=int, default=1500)
    ap.add_argument("--noise", type=float, default=1e-3)
    ap.add_argument("--subchain", type=int, default=4)
    ap.add_argument("--out", type=str, default="three_way")
    args = ap.parse_args()

    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.infer.diagnostics import effective_sample_size

    # deliberately small ROM basis so the ROM posterior is visibly biased and
    # the NN correction has something to fix (Appendix C claim 1)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(cg_tol=1e-7, cg_maxiter=3000),
        rom=ROMConfig(n_snapshots=args.n_snapshots, basis_size=args.r),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=512, epochs=200),
        mcmc=MCMCConfig(
            n_chains=args.chains, n_steps=args.steps, n_burn=args.burn,
            noise_sigma=args.noise, likelihood="rom_nn",
        ),
    )
    pipe = build_pipeline(cfg)
    key = jax.random.PRNGKey(7)
    theta_true = pipe.prior.sample(key)

    results = {}
    for like in ["fom", "rom", "rom_nn"]:
        inv = run_inversion(pipe, likelihood=like, theta_true=theta_true, key=key)
        samples = np.asarray(inv.result.samples).reshape(-1, 5)
        results[like] = {
            "samples": samples,
            "mean": samples.mean(0),
            "std": samples.std(0),
            "ess_min": float(jnp.min(inv.ess)),
            "wall_seconds": inv.wall_seconds,
            "samples_per_sec": inv.samples_per_sec,
        }
        print(f"{like}: mean={results[like]['mean'].round(3)} "
              f"({inv.samples_per_sec:.0f} samples/s)")

    # fourth line: delayed acceptance — same effective trajectory length as
    # the fom run but only steps/subchain fine evaluations
    import dataclasses

    S = args.subchain
    cfg_da = dataclasses.replace(
        cfg,
        mcmc=dataclasses.replace(
            cfg.mcmc, n_steps=max(args.steps // 2, 2), n_burn=max(args.burn // 2, 1),
            likelihood="fom", sampler="da_pcn", subchain=S,
        ),
    )
    pipe_da = dataclasses.replace(pipe, config=cfg_da)
    inv = run_inversion(pipe_da, theta_true=theta_true, key=key)
    samples = np.asarray(inv.result.samples).reshape(-1, 5)
    results["da"] = {
        "samples": samples,
        "mean": samples.mean(0),
        "std": samples.std(0),
        "ess_min": float(jnp.min(inv.ess)),
        "wall_seconds": inv.wall_seconds,
        "samples_per_sec": inv.samples_per_sec,
        "outer_accept": float(np.mean(np.asarray(inv.result.accept_rate))),
    }
    print(f"da: mean={results['da']['mean'].round(3)} "
          f"(outer accept {results['da']['outer_accept']:.3f})")

    d_rom = float(np.linalg.norm(results["rom"]["mean"] - results["fom"]["mean"]))
    d_nn = float(np.linalg.norm(results["rom_nn"]["mean"] - results["fom"]["mean"]))
    d_da = float(np.linalg.norm(results["da"]["mean"] - results["fom"]["mean"]))
    speedup = results["rom_nn"]["samples_per_sec"] / results["fom"]["samples_per_sec"]
    da_cost_ratio = results["da"]["wall_seconds"] / results["fom"]["wall_seconds"]
    summary = {
        "theta_true": np.asarray(theta_true).tolist(),
        "posterior_mean_bias_rom_vs_fom": d_rom,
        "posterior_mean_bias_rom_nn_vs_fom": d_nn,
        "nn_correction_bias_reduction": d_rom / max(d_nn, 1e-12),
        "posterior_mean_bias_da_vs_fom": d_da,
        "da_wall_over_fom_wall": da_cost_ratio,
        "rom_nn_speedup_over_fom": speedup,
        **{
            like: {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                   for k, v in res.items() if k != "samples"}
            for like, res in results.items()
        },
    }
    out_path = Path(f"{args.out}.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if not isinstance(v, dict)}, indent=2))

    # marginal posterior figure
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 5, figsize=(18, 3.2), sharey=False)
        colors = {"fom": "k", "rom": "tab:red", "rom_nn": "tab:blue", "da": "tab:green"}
        for i, ax in enumerate(axes):
            for like in ["fom", "rom", "rom_nn", "da"]:
                s = results[like]["samples"][:, i]
                ax.hist(s, bins=60, density=True, histtype="step",
                        color=colors[like], label=like)
            ax.axvline(float(theta_true[i]), color="g", ls="--", lw=1, label="truth")
            ax.set_title(f"log k_{i + 1}")
        axes[0].legend(fontsize=8)
        fig.suptitle("Posterior marginals: FOM vs ROM vs ROM+NN vs delayed-acceptance (exact)")
        fig.tight_layout()
        fig.savefig(f"{args.out}.png", dpi=120)
        print(f"wrote {args.out}.png")
    except Exception as e:  # plotting is best-effort
        print(f"(no figure: {e})")


if __name__ == "__main__":
    main()
