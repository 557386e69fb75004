"""Accuracy-vs-speed frontier for the deployed reduced-solve iteration count
(VERDICT r3 item 2).

Round 3 changed the deployed reduced-PCG iteration count from 15 to
max(15, 3r/4) = 30 at r=40 after the holdout audit measured 15-iter solver
error at 1.7e-3 — 2x the 1e-3 observation noise and k-rough (unlearnable by
the NN surrogate) — which cost the headline 7.74M -> 4.6M samples/s. This
script turns that comment into a measurement: sweep deployed iters
(15/20/30) x PT ladder depth on ONE fixed multimodal 1e-3-noise dataset,
score every variant's posterior against the EXACT full-order posterior
(tempered delayed acceptance, sampler='pt_da_pcn', likelihood='fom' — the
same data), and report throughput + accuracy side by side.

Every variant rebuilds its pipeline so the surrogate trains on the path it
deploys (api.build_pipeline round-2 advisor rule); ROMConfig.online_iters
is the knob. Runs on the real TPU; writes artifacts/iter_frontier_r4.json,
whose "summary" section bench.py embeds next to the headline.

The artifact is written INCREMENTALLY (after the reference and after every
variant) and the script RESUMES from it: a timeout costs only the variant in
flight, never the finished ones (the bench.py lesson, VERDICT r3 item 1).

Usage: timeout 3300 python scripts/iter_frontier.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
)
from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE = 1e-3

BASE = PipelineConfig(
    mesh=MeshConfig(resolution=4),
    fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
    rom=ROMConfig(n_snapshots=256, basis_size=40, online_precision="high"),
    surrogate=SurrogateConfig(hidden=(64, 64), n_train=1024, epochs=300),
    mcmc=MCMCConfig(
        n_chains=4096, n_steps=15_000, n_burn=2_000, beta=0.25,
        noise_sigma=NOISE, likelihood="rom_nn", sampler="pt_pcn",
        n_temps=5, lambda_min=0.05, adapt_ladder=True,
    ),
)


def variant_cfg(iters: int, temps: int) -> PipelineConfig:
    return dataclasses.replace(
        BASE,
        rom=dataclasses.replace(BASE.rom, online_iters=iters),
        mcmc=dataclasses.replace(BASE.mcmc, n_temps=temps),
    )


def post_stats(samples):
    flat = np.asarray(samples.reshape(-1, samples.shape[-1]), np.float64)
    return flat.mean(axis=0), flat.std(axis=0)


PATH = os.path.join(REPO, "artifacts", "iter_frontier_r4.json")


def _save(out):
    with open(PATH, "w") as f:
        json.dump(out, f, indent=1)


def main() -> None:
    t_start = time.perf_counter()
    out = {
        "experiment": "deployed reduced-solve iters x PT ladder depth frontier "
                      "on the multimodal 1e-3-noise fin posterior",
        "reference": None, "variants": [], "summary": None,
    }
    if os.path.exists(PATH):
        prev = json.load(open(PATH))
        if prev.get("reference"):
            out["reference"] = prev["reference"]
            out["variants"] = prev.get("variants", [])
            print(f"[frontier] resuming: reference + {len(out['variants'])} variants "
                  "from existing artifact (same fixed seeds)", flush=True)

    # fixed observations shared by every variant: simulate once with the FOM
    log0 = MetricsLogger()
    pipe30 = build_pipeline(variant_cfg(30, 5), dtype=jnp.float32, metrics=log0)
    k_true, k_noise = jax.random.split(jax.random.PRNGKey(1234))
    theta_true = pipe30.prior.sample(k_true)
    y_true = pipe30.fin.forward(jnp.exp(pipe30.prior.to_theta(theta_true)))
    data = y_true + NOISE * jax.random.normal(k_noise, y_true.shape, y_true.dtype)
    print(f"[frontier] data simulated, theta_true={np.asarray(theta_true).round(4)}",
          flush=True)

    # the exact full-order posterior on this data: tempered delayed
    # acceptance (rom_nn subchains + FOM correction), 800 outer steps
    if out["reference"] is not None:
        ref_mean = np.asarray(out["reference"]["post_mean"], np.float64)
        ref_std = np.asarray(out["reference"]["post_std"], np.float64)
        inv_ref = None
    else:
        inv_ref = True
    cfg_ref = dataclasses.replace(
        variant_cfg(30, 5),
        mcmc=dataclasses.replace(
            BASE.mcmc, n_chains=1024, n_steps=800, n_burn=250,
            likelihood="fom", sampler="pt_da_pcn", subchain=8,
        ),
    )
    if inv_ref is None:
        pass
    else:
        inv_ref = run_inversion(
            dataclasses.replace(pipe30, config=cfg_ref),
            theta_true=theta_true, data=data, key=jax.random.PRNGKey(77),
        )
        ref_mean, ref_std = post_stats(inv_ref.result.samples)
        out["reference"] = {
            "sampler": "pt_da_pcn x5 (exact FOM posterior; rom_nn subchains x8)",
            "n_chains": 1024, "n_outer_steps": 800,
            "wall_seconds": round(inv_ref.wall_seconds, 1),
            "rhat_split_max": round(float(jnp.max(inv_ref.rhat)), 4),
            "ess_bulk_min": round(float(jnp.min(inv_ref.ess)), 1),
            "post_mean": [round(float(v), 4) for v in ref_mean],
            "post_std": [round(float(v), 4) for v in ref_std],
            "theta_true": [round(float(v), 4) for v in np.asarray(theta_true)],
            "mean_abs_err_vs_truth": round(float(np.abs(ref_mean - np.asarray(theta_true, np.float64)).mean()), 4),
        }
        _save(out)
        print(f"[frontier] reference done in {inv_ref.wall_seconds:.0f}s "
              f"rhat={out['reference']['rhat_split_max']}", flush=True)

    # sweep: iters at the headline 5-level ladder, plus ladder depth at the
    # deployed 30-iter point
    grid = [(15, 5), (20, 5), (30, 5), (30, 4), (30, 3)]
    done = {(v["online_iters"], v["n_temps"]) for v in out["variants"]}
    pipes = {30: pipe30}
    for iters, temps in grid:
        if (iters, temps) in done:
            continue
        if iters not in pipes:
            log_v = MetricsLogger()
            pipes[iters] = build_pipeline(variant_cfg(iters, temps),
                                          dtype=jnp.float32, metrics=log_v)
        pipe = dataclasses.replace(pipes[iters], config=variant_cfg(iters, temps))
        inv = run_inversion(pipe, theta_true=theta_true, data=data,
                            key=jax.random.PRNGKey(42))
        mean_v, std_v = post_stats(inv.result.samples)
        err = float(np.abs(mean_v - ref_mean).mean())
        kept = BASE.mcmc.n_steps - BASE.mcmc.n_burn
        rec = {
            "online_iters": iters,
            "n_temps": temps,
            "samples_per_sec": round(inv.samples_per_sec, 1),
            "ess_per_sec": round(inv.ess_per_sec, 2),
            "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
            "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
            "wall_seconds_10k_steps": round(inv.wall_seconds * 10_000 / kept, 3),
            "post_mean_abs_err_vs_exact_fom": round(err, 4),
            "post_std_ratio_vs_exact_fom": [
                round(float(r), 3) for r in (std_v / ref_std)
            ],
        }
        out["variants"].append(rec)
        _save(out)
        print(f"[frontier] iters={iters} temps={temps}: "
              f"{rec['samples_per_sec']:.0f} samp/s, rhat {rec['rhat_split_max']}, "
              f"err vs exact {rec['post_mean_abs_err_vs_exact_fom']}", flush=True)

    # summarize: is the deployed (30, 5) point on the frontier?
    v30 = next(v for v in out["variants"] if v["online_iters"] == 30 and v["n_temps"] == 5)
    v15 = next(v for v in out["variants"] if v["online_iters"] == 15 and v["n_temps"] == 5)
    out["summary"] = {
        "source": "artifacts/iter_frontier_r4.json (offline TPU sweep, scripts/iter_frontier.py)",
        "deployed": {"online_iters": 30, "n_temps": 5},
        "deployed_err_vs_exact_fom": v30["post_mean_abs_err_vs_exact_fom"],
        "fast_15iter_err_vs_exact_fom": v15["post_mean_abs_err_vs_exact_fom"],
        "fast_15iter_speedup": round(v15["samples_per_sec"] / v30["samples_per_sec"], 2),
        "table": [
            {k: v[k] for k in (
                "online_iters", "n_temps", "samples_per_sec", "ess_per_sec",
                "rhat_split_max", "post_mean_abs_err_vs_exact_fom")}
            for v in out["variants"]
        ],
    }
    out["provenance"] = {
        "date": time.strftime("%Y-%m-%d"),
        "hardware": f"{jax.default_backend()} x{jax.device_count()}",
        "wall_seconds_total": round(time.perf_counter() - t_start, 1),
        "timing": "fresh-key runs, device-to-host readback (CLAUDE.md rule)",
    }
    _save(out)
    print(f"[frontier] wrote {PATH} in {out['provenance']['wall_seconds_total']}s",
          flush=True)


if __name__ == "__main__":
    main()
