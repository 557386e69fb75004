"""Command-line interface: the BASELINE config ladder as named commands
(SURVEY.md §6 'config ladder', §1 L6 scripts layer).

    python -m bayesianinferencedl_tpu.cli fom        # config 1: single FOM solve
    python -m bayesianinferencedl_tpu.cli snapshots  # config 2: 256 vmapped FOM solves
    python -m bayesianinferencedl_tpu.cli rom        # config 3: POD ROM + rel-err vs FOM
    python -m bayesianinferencedl_tpu.cli surrogate  # config 4: NN + adjoint-checked grads
    python -m bayesianinferencedl_tpu.cli invert     # config 5: full pCN inversion
    python -m bayesianinferencedl_tpu.cli pipeline   # everything, with checkpoints
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--resolution", type=int, default=4)
    p.add_argument("--biot", type=float, default=0.1)
    p.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    p.add_argument("--metrics", type=str, default=None, help="JSONL metrics path")
    p.add_argument("--seed", type=int, default=0)


def _add_prior(p: argparse.ArgumentParser) -> None:
    """The reference's prior families (SURVEY.md A.5): log-normal k
    (gaussian on theta = log k), or uniform / log-uniform k on a box,
    realized as the probit push-forward (infer.priors.BoxPrior)."""
    p.add_argument(
        "--prior", choices=["gaussian", "uniform", "log_uniform"], default="gaussian"
    )
    p.add_argument("--prior-low", type=float, default=0.1, help="box prior lower bound on k")
    p.add_argument("--prior-high", type=float, default=10.0, help="box prior upper bound on k")
    p.add_argument("--prior-mean", type=float, default=0.0, help="gaussian prior mean of log k")
    p.add_argument("--prior-sigma", type=float, default=0.6, help="gaussian prior sd of log k")


def _prior_config(args):
    from bayesianinferencedl_tpu.config import PriorConfig

    return PriorConfig(
        mean=args.prior_mean, sigma=args.prior_sigma, dim=5,
        kind=args.prior, low=args.prior_low, high=args.prior_high,
    )


def _dtype(args):
    return jnp.float64 if args.dtype == "float64" else jnp.float32


def _cg_maxiter(args) -> int:
    """f32: resolution-scaled tight bound (the Pallas kernel's runtime scales
    with the static bound itself — CLAUDE.md rule 7; expected Jacobi-PCG
    iterations ~80 x resolution). f64 runs the dynamic jnp while_loop, where a
    loose cap is free — keep headroom for the 1e-10 tolerance."""
    if args.dtype == "float64":
        return 4000
    return max(480, 120 * args.resolution)


def _parse_points(specs):
    """["X,Y", ...] (--predict-at values) -> (P, 2) float array or None."""
    if not specs:
        return None
    pts = []
    for s in specs:
        try:
            x, y = (float(v) for v in s.split(","))
        except ValueError:
            raise SystemExit(f"--predict-at expects 'X,Y', got {s!r}")
        pts.append((x, y))
    return np.asarray(pts)


def _fin(args):
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin

    return FiveParamFin.create(
        resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
        cg_tol=1e-10 if args.dtype == "float64" else 1e-7,
        cg_maxiter=_cg_maxiter(args),
    )


def cmd_fom(args) -> None:
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    fin = _fin(args)
    k = jnp.asarray(args.k, _dtype(args))
    with log.timer("solve_compile"):
        u = fin.solve(k)
        u.block_until_ready()
    t0 = time.perf_counter()
    u = fin.solve(k)
    u.block_until_ready()
    log.log("solve", seconds=time.perf_counter() - t0, n_dof=fin.op.n_dof)
    y = fin.qoi(u)
    if getattr(args, "save_obs", None):
        # observation file for `invert --data` (production mode: measured
        # subfin temperatures; here the noiseless forward stands in)
        np.savez(args.save_obs, data=np.asarray(y), k_true=np.asarray(k))
        log.log("saved_obs", path=args.save_obs)
    print(json.dumps({"qoi": np.asarray(y).tolist(), "n_dof": fin.op.n_dof}))


def cmd_snapshots(args) -> None:
    from bayesianinferencedl_tpu.api import make_fom_solver
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    fin = _fin(args)
    solver = make_fom_solver(fin, tol=fin.cg_tol, maxiter=fin.cg_maxiter)
    ks = sample_log_uniform(jax.random.PRNGKey(args.seed), args.n).astype(_dtype(args))
    with log.timer("snapshots_compile"):
        S = solver(ks)
        S.block_until_ready()
    t0 = time.perf_counter()
    S = solver(ks)
    S.block_until_ready()
    dt = time.perf_counter() - t0
    log.log("snapshots", seconds=dt, solves_per_sec=args.n / dt)
    if args.out:
        np.savez_compressed(args.out, snapshots=np.asarray(S), ks=np.asarray(ks))
    print(json.dumps({"n": args.n, "seconds": dt, "fom_solves_per_sec": args.n / dt}))


def cmd_rom(args) -> None:
    from bayesianinferencedl_tpu.api import make_fom_solver
    from bayesianinferencedl_tpu.rom import ReducedOperator, greedy_basis
    from bayesianinferencedl_tpu.rom.pod import pod_basis_host
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    fin = _fin(args)
    solver = make_fom_solver(fin, tol=fin.cg_tol, maxiter=fin.cg_maxiter)
    key = jax.random.PRNGKey(args.seed)
    ks = sample_log_uniform(key, args.n_snapshots).astype(_dtype(args))
    if args.method == "greedy":
        from bayesianinferencedl_tpu.rom.greedy import orthonormalize_host

        gres = greedy_basis(fin.op, ks, args.r, tol=fin.cg_tol, maxiter=fin.cg_maxiter)
        V = orthonormalize_host(gres.snapshots)  # offline f64, like the POD path
        rom = ReducedOperator.project_host(fin.host, args.biot, V, dtype=_dtype(args))
    else:
        S = solver(ks)
        V, _ = pod_basis_host(np.asarray(S), args.r)
        rom = ReducedOperator.project_host(fin.host, args.biot, V, dtype=_dtype(args))

    k_test = sample_log_uniform(jax.random.PRNGKey(args.seed + 1), 64).astype(_dtype(args))
    u_test = solver(k_test)
    y_fom = jax.vmap(fin.op.observe)(u_test)
    y_rom = rom.forward_batch(k_test)
    rel = float(jnp.linalg.norm(y_rom - y_fom) / jnp.linalg.norm(y_fom))
    log.log("rom_rel_err", value=rel, r=args.r, method=args.method)
    if args.out:
        np.savez_compressed(args.out, V=np.asarray(V))
    print(json.dumps({"r": args.r, "method": args.method, "rel_err_vs_fom": rel}))


def cmd_surrogate(args) -> None:
    from bayesianinferencedl_tpu.api import build_pipeline
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.checkpoint import save_checkpoint
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    # adjoint-check the autodiff gradient of the corrected model (config 4)
    theta0 = jnp.zeros(5, _dtype(args))
    d = pipe.corrected(theta0)
    gfn = jax.grad(lambda t: 0.5 * jnp.sum((pipe.corrected(t) - d) ** 2))
    g = gfn(theta0 + 0.1)
    eps = 1e-3 if args.dtype == "float32" else 1e-6
    fd = []
    for i in range(5):
        e = jnp.zeros(5, _dtype(args)).at[i].set(eps)
        f = lambda t: 0.5 * jnp.sum((pipe.corrected(t) - d) ** 2)
        fd.append((float(f(theta0 + 0.1 + e)) - float(f(theta0 + 0.1 - e))) / (2 * eps))
    gd_err = float(jnp.max(jnp.abs(g - jnp.asarray(fd, _dtype(args))) / (jnp.abs(g) + 1e-8)))
    log.log("gradcheck", rel_err=gd_err)
    if args.out:
        save_checkpoint(args.out, (pipe.surrogate.params, pipe.rom.Ahat, pipe.rom.V), meta=cfg.to_dict())
    s = log.summary()
    print(json.dumps({
        "rom_rel_err": s["rom_rel_err"]["value"],
        "corrected_rel_err": s["corrected_rel_err"]["value"],
        "gradcheck_rel_err": gd_err,
    }))


def cmd_invert(args) -> None:
    from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(
            n_chains=args.chains, n_steps=args.steps, n_burn=args.burn,
            beta=args.beta, noise_sigma=args.noise, likelihood=args.likelihood,
            sampler=args.sampler, seed=args.seed,
            n_temps=args.n_temps, lambda_min=args.lambda_min,
            adapt_ladder=args.adapt_ladder,
            subchain=args.subchain, da_coarse=args.da_coarse,
            da_inner=args.da_inner,
            mlda_resolution=args.mlda_resolution, mlda_subchain=args.mlda_subchain,
            hmc_leap=args.hmc_leap, mala_step=args.mala_step,
            infer_noise=args.infer_noise,
        ),
        prior=_prior_config(args),
    )
    fin = None
    if getattr(args, "sensors", None):
        # invert the POINTWISE observables of a saved optimal design
        # (design --out) instead of the five subfin averages
        from bayesianinferencedl_tpu.infer.oed import with_sensor_qoi
        from bayesianinferencedl_tpu.models.five_param import FiveParamFin

        dz = np.load(args.sensors)
        if int(dz["resolution"]) != args.resolution:
            raise SystemExit(
                f"--sensors design was made at resolution {int(dz['resolution'])}, "
                f"but --resolution is {args.resolution}"
            )
        fin = with_sensor_qoi(
            FiveParamFin.create(
                resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
                cg_tol=cfg.fem.cg_tol, cg_maxiter=cfg.fem.cg_maxiter,
            ),
            dz["node_ids"],
        )
        log.log("sensor_design", path=args.sensors, n_obs=int(dz["node_ids"].shape[0]))
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log, fin=fin)
    mesh = None
    if args.shard and jax.device_count() > 1:
        from bayesianinferencedl_tpu.parallel import device_mesh

        mesh = device_mesh()
    obs = None
    if getattr(args, "data", None):
        z = np.load(args.data)
        obs = jnp.asarray(z["data"])
        log.log("external_data", path=args.data, n_obs=int(obs.shape[0]))
    inv = run_inversion(pipe, init=args.init, data=obs, metrics=log, mesh=mesh)
    # samples live in working coordinates (z for box priors); report log k
    post_mean = np.asarray(pipe.prior.to_theta(inv.result.samples).mean(axis=(0, 1)))
    out = {
        "likelihood": args.likelihood,
        "sampler": args.sampler,
        "prior": args.prior,
        "samples_per_sec": inv.samples_per_sec,
        "ess_min": float(jnp.min(inv.ess)),
        "ess_tail_min": float(jnp.min(inv.ess_tail)),
        "ess_per_sec": inv.ess_per_sec,
        "accept_rate": float(jnp.mean(inv.result.accept_rate)),
        "rhat_split_max": float(jnp.max(inv.rhat)),
        "posterior_mean_log_k": post_mean.tolist(),
        # external data: truth is unknown — don't report the placeholder
        "theta_true": (
            None if obs is not None
            else np.asarray(pipe.prior.to_theta(inv.theta_true)).tolist()
        ),
    }
    if inv.fom_iter_cap is not None:
        out["fom_iter_audit"] = {
            "cap": inv.fom_iter_cap, "max_iters": inv.fom_iter_max,
            "hit_cap_frac": inv.fom_hit_cap_frac,
        }
    if inv.log_evidence is not None:
        # stepping-stone over the PT ladder; differences across --likelihood
        # runs on the same data/seed are log Bayes factors
        out["log_evidence"] = inv.log_evidence
        out["log_evidence_std"] = inv.log_evidence_std
    if inv.ppc is not None:
        # posterior predictive check: p near 0 = model can't explain the
        # data (under-modeled physics / noise understated); near 1 = noise
        # overstated. Interior is healthy. (--infer-noise swaps in the
        # scale-free residual-shape statistic — utils/ppc.py.)
        out["ppc_p_value"] = inv.ppc["p_value"]
    if inv.noise_sigma_post is not None:
        # --infer-noise: the marginal sigma posterior (mean, sd, quantiles)
        out["noise_sigma_post"] = inv.noise_sigma_post
    if getattr(args, "predict_at", None) or getattr(args, "predict_out", None):
        from bayesianinferencedl_tpu.api import predict_temperature

        # aleatoric part of a NEW reading: the configured noise, or the
        # posterior-median sigma when the noise itself was inferred
        sig = args.noise
        if inv.noise_sigma_post is not None:
            sig = inv.noise_sigma_post["sigma_q50"]
        pred = predict_temperature(
            pipe, inv.result.samples,
            points=_parse_points(args.predict_at), noise_sigma=sig,
        )
        if args.predict_at:
            out["predictions"] = pred.summary_rows()
        if args.predict_out:
            pred.save_npz(args.predict_out)
            out["prediction_field"] = args.predict_out
        log.log("predict", n_draws=pred.n_draws, points=len(pred.summary_rows()))
    print(json.dumps(out))


def cmd_sbc(args) -> None:
    """Simulation-based calibration of the deployed sampler + likelihood
    (api.run_sbc_check / infer/sbc.py): rank-uniformity is the oracle that
    catches a WRONG posterior (mis-scaled noise, biased surrogate, broken
    proposal) — the failure mode R-hat is blind to."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_sbc_check
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(
            noise_sigma=args.noise, likelihood=args.likelihood, seed=args.seed,
        ),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    res = run_sbc_check(
        pipe, args.likelihood, n_datasets=args.datasets, n_chains=args.sbc_chains,
        n_steps=args.steps, n_burn=args.burn, n_bins=args.bins,
        sampler=args.sampler, step=args.mala_step, n_leap=args.hmc_leap,
        n_temps=args.temps, lambda_min=args.lambda_min,
        seed=args.seed, metrics=log,
    )
    p_min = float(np.min(np.asarray(res.p_values)))
    print(json.dumps({
        "likelihood": args.likelihood,
        "sampler": args.sampler,
        "prior": args.prior,
        "noise_sigma": args.noise,
        "n_datasets": args.datasets,
        "n_posterior_draws": res.n_draws,
        "p_values": [round(float(p), 5) for p in np.asarray(res.p_values)],
        "p_min": round(p_min, 5),
        "calibrated": bool(p_min > 0.005),
        "rank_counts": np.asarray(res.counts).tolist(),
        "accept_rate": round(float(np.mean(np.asarray(res.accept_rate))), 4),
    }))


def cmd_eki(args) -> None:
    """Derivative-free ensemble Kalman inversion (api.run_eki_inversion /
    infer/eki.py): a posterior approximation in ~10-20 batched forward
    sweeps — the fast first look before committing to an MCMC run, and the
    only inversion mode whose exact-physics (fom) variant costs well under
    a second. Exact in the linear-Gaussian limit; see docs/SAMPLERS.md."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_eki_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(noise_sigma=args.noise, likelihood=args.likelihood, seed=args.seed),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    obs = None
    if getattr(args, "data", None):
        obs = jnp.asarray(np.load(args.data)["data"])
    res, theta_true, data, wall = run_eki_inversion(
        pipe, args.likelihood, n_ensemble=args.ensemble,
        ess_target=args.ess_target, data=obs,
        key=jax.random.PRNGKey(args.seed), metrics=log,
    )
    to_theta = pipe.prior.to_theta
    th_ens = jax.vmap(to_theta)(res.ensemble)
    mean_log_k = np.asarray(jnp.mean(th_ens, axis=0))
    rec = {
        "likelihood": args.likelihood,
        "n_ensemble": args.ensemble,
        "n_iters": len(res.ts) - 1,
        "n_forward_evals": res.n_forward,
        "wall_seconds": round(wall, 3),
        "posterior_mean_log_k": mean_log_k.tolist(),
        "posterior_std_log_k": np.asarray(jnp.std(th_ens, axis=0)).tolist(),
        "theta_true": np.asarray(to_theta(theta_true)).tolist(),
        "mean_abs_err": round(float(np.abs(mean_log_k - np.asarray(to_theta(theta_true))).mean()), 5),
        "misfit_trace": [round(x, 2) for x in res.misfit_trace],
        "tempering_knots": [round(t, 5) for t in res.ts],
    }
    if getattr(args, "psis", 0):
        # certify the moment-matched Gaussian of the final ensemble (the
        # honest contract made measurable — infer/psis.py k-hat gate); the
        # ensemble lives in working coordinates, as psis_certify expects
        from bayesianinferencedl_tpu.api import psis_certify

        ens = np.asarray(res.ensemble, np.float64)
        q_mean = jnp.asarray(ens.mean(axis=0), pipe.prior.mean.dtype)
        cov = np.cov(ens.T) + 1e-12 * np.eye(ens.shape[1])
        q_chol = jnp.asarray(np.linalg.cholesky(cov), pipe.prior.mean.dtype)
        cert = psis_certify(
            pipe, q_mean, q_chol, data, args.likelihood,
            n_draws=args.psis, key=jax.random.PRNGKey(args.seed + 2),
        )
        rec["psis"] = {
            "n_draws": args.psis,
            "k_hat": round(cert.k_hat, 3),
            "reliable": cert.reliable,
            "ess": round(cert.ess, 1),
            "corrected_mean_working": cert.mean.tolist(),
            "log_evidence": round(cert.log_evidence, 4),
        }
    print(json.dumps(rec))


def _cmd_vi_flow(args, pipe, obs, log, to_theta) -> None:
    """`vi --flow N`: the normalizing-flow branch (api.run_flow_vi_inversion
    / infer/flow.py). pretrain='smc' distills a tempered-SMC population by
    mass-covering MLE (multimodal-safe; --lr unused — refinement is off by
    default, measured to re-collapse covering fits); pretrain='none' is
    annealed reverse-KL flow-VI with --steps/--lr (unimodal targets; flow-VI
    wants lr ~0.01, lower than ADVI's default)."""
    from bayesianinferencedl_tpu.api import (
        psis_certify_flow, run_flow_vi_inversion, run_neutra_inversion,
    )
    from bayesianinferencedl_tpu.infer.flow import flow_sample

    res, theta_true, data, wall = run_flow_vi_inversion(
        pipe, args.likelihood, n_couplings=args.flow,
        pretrain=args.flow_pretrain,
        n_steps=(args.steps if args.flow_pretrain == "none" else None),
        n_mc=args.mc, lr=args.lr, data=obs,
        key=jax.random.PRNGKey(args.seed), metrics=log,
    )
    th_s = jax.vmap(to_theta)(
        flow_sample(res, jax.random.PRNGKey(args.seed + 1), (4096,))
    )
    mean_log_k = np.asarray(jnp.mean(th_s, axis=0))
    rec = {
        "likelihood": args.likelihood,
        "family": f"flow (couplings={args.flow}, pretrain={args.flow_pretrain})",
        "n_forward_evals": res.n_forward,
        "wall_seconds": round(wall, 3),
        "posterior_mean_log_k": mean_log_k.tolist(),
        "posterior_std_log_k": np.asarray(jnp.std(th_s, axis=0)).tolist(),
        "theta_true": np.asarray(to_theta(theta_true)).tolist(),
        "mean_abs_err": round(float(np.abs(mean_log_k - np.asarray(to_theta(theta_true))).mean()), 5),
    }
    if args.psis:
        cert = psis_certify_flow(
            pipe, res, data, args.likelihood,
            n_draws=args.psis, base_scale=args.psis_widen,
            key=jax.random.PRNGKey(args.seed + 2), metrics=log,
        )
        w = np.exp(cert.log_weights - cert.log_weights.max())
        w /= w.sum()
        th_psis = np.asarray(jax.vmap(to_theta)(cert.samples))
        rec["psis"] = {
            "n_draws": args.psis,
            "base_scale": args.psis_widen,
            "k_hat": round(cert.k_hat, 3),
            "reliable": cert.reliable,
            "ess": round(cert.ess, 1),
            "corrected_mean_log_k": (w @ th_psis).tolist(),
        }
    if args.neutra:
        inv = run_neutra_inversion(
            pipe, res, data, args.likelihood, theta_true=theta_true,
            n_chains=256, n_steps=args.neutra, n_burn=args.neutra // 2,
            key=jax.random.PRNGKey(args.seed + 3), metrics=log,
        )
        samp = np.asarray(inv.result.samples)
        neutra_mean = np.asarray(
            jax.vmap(to_theta)(jnp.asarray(samp.reshape(-1, samp.shape[-1])))
        ).mean(0)
        rec["neutra"] = {
            "n_steps": args.neutra,
            "rhat_split_max": round(float(jnp.max(inv.rhat)), 4),
            "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
            "accept_rate": round(float(jnp.mean(inv.result.accept_rate)), 3),
            "posterior_mean_log_k": neutra_mean.tolist(),
            "wall_seconds": round(inv.wall_seconds, 3),
        }
    print(json.dumps(rec))


def cmd_vi(args) -> None:
    """Gradient-based variational posterior approximation (api.run_vi_inversion
    / infer/vi.py ADVI): fit q = N(mu, L L^T) by stochastic ELBO ascent —
    the gradient-informed sibling of `eki`. Exact when the posterior is
    Gaussian in the whitened frame; see docs/SAMPLERS.md."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_vi_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(noise_sigma=args.noise, likelihood=args.likelihood, seed=args.seed),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    obs = None
    if getattr(args, "data", None):
        obs = jnp.asarray(np.load(args.data)["data"])
    to_theta = pipe.prior.to_theta
    if args.flow > 0:
        _cmd_vi_flow(args, pipe, obs, log, to_theta)
        return
    res, theta_true, data, wall = run_vi_inversion(
        pipe, args.likelihood, rank=args.rank, n_steps=args.steps,
        n_mc=args.mc, lr=args.lr, data=obs,
        key=jax.random.PRNGKey(args.seed), metrics=log,
    )
    from bayesianinferencedl_tpu.infer.vi import vi_sample

    th_s = jax.vmap(to_theta)(vi_sample(res, jax.random.PRNGKey(args.seed + 1), (4096,)))
    mean_log_k = np.asarray(jnp.mean(th_s, axis=0))
    elbo = np.asarray(res.elbo_trace)
    rec = {
        "likelihood": args.likelihood,
        "rank": args.rank,
        "n_steps": args.steps,
        "n_mc": args.mc,
        "n_forward_evals": res.n_forward,
        "wall_seconds": round(wall, 3),
        "posterior_mean_log_k": mean_log_k.tolist(),
        "posterior_std_log_k": np.asarray(jnp.std(th_s, axis=0)).tolist(),
        "theta_true": np.asarray(to_theta(theta_true)).tolist(),
        "mean_abs_err": round(float(np.abs(mean_log_k - np.asarray(to_theta(theta_true))).mean()), 5),
        "elbo_first_last": [round(float(elbo[:50].mean()), 2), round(float(elbo[-50:].mean()), 2)],
    }
    if args.psis:
        from bayesianinferencedl_tpu.api import psis_certify

        cert = psis_certify(
            pipe, res.theta_mean, res.theta_chol, data, args.likelihood,
            n_draws=args.psis, key=jax.random.PRNGKey(args.seed + 2),
            metrics=log,
        )
        # importance-weighted mean of log k: reweight the draws pushed
        # through to_theta (exact for any prior, not just the affine one)
        w = np.exp(cert.log_weights - cert.log_weights.max())
        w /= w.sum()
        th_psis = np.asarray(jax.vmap(to_theta)(cert.samples))
        rec["psis"] = {
            "n_draws": args.psis,
            "k_hat": round(cert.k_hat, 3),
            "reliable": cert.reliable,
            "ess": round(cert.ess, 1),
            "corrected_mean_log_k": (w @ th_psis).tolist(),
        }
    print(json.dumps(rec))


def cmd_svgd(args) -> None:
    """Particle-transport posterior approximation (api.run_svgd_inversion /
    infer/svgd.py SVGD): gradient-based like `vi` but nonparametric — J
    interacting particles follow the kernelized Stein direction, so the
    terminal ensemble can be skewed or (annealed) multi-basin without
    committing to a density family. Biased at finite J; see
    docs/SAMPLERS.md."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_svgd_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(noise_sigma=args.noise, likelihood=args.likelihood, seed=args.seed),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    obs = None
    if getattr(args, "data", None):
        obs = jnp.asarray(np.load(args.data)["data"])
    res, theta_true, data, wall = run_svgd_inversion(
        pipe, args.likelihood, n_particles=args.particles,
        n_steps=args.steps, lr=args.lr,
        anneal_steps=args.anneal if args.anneal >= 0 else None, data=obs,
        key=jax.random.PRNGKey(args.seed), metrics=log,
        segment=args.segment if args.segment > 0 else None,
    )
    to_theta = pipe.prior.to_theta
    th_p = jax.vmap(to_theta)(res.particles)
    mean_log_k = np.asarray(jnp.mean(th_p, axis=0))
    tr = np.asarray(res.misfit_trace)
    rec = {
        "likelihood": args.likelihood,
        "n_particles": args.particles,
        "n_steps": args.steps,
        "n_forward_evals": res.n_forward,
        "wall_seconds": round(wall, 3),
        "posterior_mean_log_k": mean_log_k.tolist(),
        "posterior_std_log_k": np.asarray(jnp.std(th_p, axis=0)).tolist(),
        "theta_true": np.asarray(to_theta(theta_true)).tolist(),
        "mean_abs_err": round(float(np.abs(mean_log_k - np.asarray(to_theta(theta_true))).mean()), 5),
        "misfit_first_last": [round(float(tr[0]), 2), round(float(tr[-1]), 2)],
    }
    if getattr(args, "psis", 0):
        # certify the moment-matched Gaussian of the terminal ensemble
        # (SVGD has no evaluable density — the eki --psis route)
        from bayesianinferencedl_tpu.api import psis_certify

        ens = np.asarray(res.particles, np.float64)
        q_mean = jnp.asarray(ens.mean(axis=0), pipe.prior.mean.dtype)
        cov = np.cov(ens.T) + 1e-12 * np.eye(ens.shape[1])
        q_chol = jnp.asarray(np.linalg.cholesky(cov), pipe.prior.mean.dtype)
        cert = psis_certify(
            pipe, q_mean, q_chol, data, args.likelihood,
            n_draws=args.psis, key=jax.random.PRNGKey(args.seed + 2),
        )
        rec["psis"] = {
            "n_draws": args.psis,
            "k_hat": round(cert.k_hat, 3),
            "reliable": cert.reliable,
            "ess": round(cert.ess, 1),
            "corrected_mean_working": cert.mean.tolist(),
            "log_evidence": round(cert.log_evidence, 4),
        }
    print(json.dumps(rec))


def cmd_sbc_ff(args) -> None:
    """Simulation-based calibration of the FULL-FIELD sampler stack
    (api_full_field.run_sbc_check_ff): J synthetic 64-dim RFF inversions,
    rank-uniformity per coefficient. d is large, so the verdict gates the
    MIN p-value on a Sidak-corrected threshold 1-(1-alpha)^(1/d)."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_sbc_check_ff,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    pipe = build_full_field_pipeline(
        resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
        ell=args.ell, sigma=args.sigma, n_features=args.n_features,
        n_snapshots=args.n_snapshots, basis_size=args.r, k_basis_size=args.k_basis,
        basis=args.basis,
        n_train=args.n_train, surrogate_steps=args.epochs * 10, seed=args.seed,
        metrics=log,
    )
    res = run_sbc_check_ff(
        pipe, args.likelihood, noise_sigma=args.noise,
        n_datasets=args.datasets, n_chains=args.sbc_chains,
        n_steps=args.steps, n_burn=args.burn, n_bins=args.bins,
        sampler=args.sampler, step=args.mala_step, n_leap=args.hmc_leap,
        n_temps=args.temps, lambda_min=args.lambda_min,
        seed=args.seed, metrics=log,
    )
    p = np.asarray(res.p_values)
    d = p.shape[0]
    alpha = 0.01
    sidak = 1.0 - (1.0 - alpha) ** (1.0 / d)
    p_min = float(p.min())
    print(json.dumps({
        "likelihood": args.likelihood,
        "sampler": args.sampler,
        "noise_sigma": args.noise,
        "n_features": d,
        "n_datasets": args.datasets,
        "n_posterior_draws": res.n_draws,
        "p_min": round(p_min, 6),
        "sidak_threshold_alpha01": round(sidak, 6),
        "n_below_sidak": int((p < sidak).sum()),
        "calibrated": bool(p_min > sidak),
        "accept_rate": round(float(np.mean(np.asarray(res.accept_rate))), 4),
    }))


def cmd_evidence(args) -> None:
    """Model evidence by adaptive tempered SMC (infer/smc.py): the
    schedule-free, unbiased estimator — run once per --likelihood on the
    same --seed and difference the outputs for log Bayes factors (the
    quantitative form of SURVEY.md Appendix C's three-way comparison;
    cross-checks the stepping-stone figure `invert --sampler pt_pcn`
    prints)."""
    from bayesianinferencedl_tpu.api import build_pipeline, run_smc_evidence
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        mcmc=MCMCConfig(
            noise_sigma=args.noise, likelihood=args.likelihood, seed=args.seed,
        ),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    mesh = None
    if args.shard and jax.device_count() > 1:
        from bayesianinferencedl_tpu.parallel import device_mesh

        mesh = device_mesh()
    ev = run_smc_evidence(
        pipe, n_particles=args.particles, n_groups=args.groups,
        n_mutations=args.mutations, ess_target=args.ess_target,
        mesh=mesh, metrics=log,
    )
    post_mean = np.asarray(pipe.prior.to_theta(ev.particles).mean(axis=0))
    print(json.dumps({
        "likelihood": args.likelihood,
        "estimator": "smc (adaptive tempered, unbiased in Z)",
        "log_evidence": ev.log_evidence,
        "log_evidence_std": ev.log_evidence_std,
        "n_stages": np.asarray(ev.n_stages).tolist(),
        "n_particles": args.particles,
        "posterior_mean_log_k": post_mean.tolist(),
        "theta_true": np.asarray(pipe.prior.to_theta(ev.theta_true)).tolist(),
        "wall_seconds": ev.wall_seconds,
    }))


def cmd_select_ell(args) -> None:
    """Prior hyperparameter selection by model evidence
    (api_full_field.select_correlation_length): the RFF prior's correlation
    length chosen by exact-FOM SMC Bayes factors on the same observations.
    Pools --n-datasets independent experiments (log Z summed) — required
    for identifiability with the fin's 5 scalar observations."""
    from bayesianinferencedl_tpu.api_full_field import select_correlation_length
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    obs = None
    if args.data:
        obs = jnp.asarray(np.load(args.data)["data"])
    out = select_correlation_length(
        args.ells,
        resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
        sigma=args.sigma, n_features=args.n_features,
        noise_sigma=args.noise, ell_true=args.ell_true, data=obs,
        n_datasets=args.n_datasets, n_particles=args.particles,
        n_groups=args.groups, n_mutations=args.mutations,
        max_stages=args.max_stages, cg_maxiter=_cg_maxiter(args),
        seed=args.seed, metrics=log,
    )
    rec = {k: out[k] for k in ("ells", "log_z", "log_z_std", "posterior", "ell_map")}
    rec["n_datasets"] = args.n_datasets if obs is None else int(np.atleast_2d(np.asarray(out["data"])).shape[0])
    print(json.dumps(rec))


def cmd_evidence_ff(args) -> None:
    """Model evidence for the full-field (nodal k) model by adaptive
    tempered SMC — the Bayes-factor instrument on RFF-coefficient space
    (run once per --likelihood on the same --seed and difference)."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_full_field_evidence,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    pipe = build_full_field_pipeline(
        resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
        ell=args.ell, sigma=args.sigma, n_features=args.n_features,
        n_snapshots=args.n_snapshots, basis_size=args.r, k_basis_size=args.k_basis,
        basis=args.basis,
        n_train=args.n_train, surrogate_steps=args.epochs * 10, seed=args.seed,
        metrics=log,
    )
    mesh = None
    if args.shard and jax.device_count() > 1:
        from bayesianinferencedl_tpu.parallel import device_mesh

        mesh = device_mesh()
    obs = None
    if getattr(args, "data", None):
        obs = jnp.asarray(np.load(args.data)["data"])
    ev = run_full_field_evidence(
        pipe, likelihood=args.likelihood, noise_sigma=args.noise,
        n_particles=args.particles, n_groups=args.groups,
        n_mutations=args.mutations, ess_target=args.ess_target,
        data=obs, key=jax.random.PRNGKey(args.seed), mesh=mesh, metrics=log,
    )
    print(json.dumps({
        "likelihood": args.likelihood,
        "n_features": args.n_features,
        "estimator": "smc (adaptive tempered, unbiased in Z)",
        "log_evidence": ev.log_evidence,
        "log_evidence_std": ev.log_evidence_std,
        "n_stages": np.asarray(ev.n_stages).tolist(),
        "n_particles": args.particles,
        "wall_seconds": ev.wall_seconds,
    }))


def cmd_map(args) -> None:
    """Deterministic inversion: MAP point + Laplace credible intervals
    (SURVEY.md §2a #9, the reference's regularized least-squares fit)."""
    from bayesianinferencedl_tpu.api import build_pipeline
    from bayesianinferencedl_tpu.config import (
        FEMConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )
    from bayesianinferencedl_tpu.infer.map import find_map_multistart, laplace_approximation
    from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=args.resolution),
        fem=FEMConfig(biot=args.biot, cg_tol=1e-10 if args.dtype == "float64" else 1e-7, cg_maxiter=_cg_maxiter(args)),
        rom=ROMConfig(
            n_snapshots=args.n_snapshots, basis_size=args.r, seed=args.seed,
            online_precision=args.online_precision,
        ),
        surrogate=SurrogateConfig(n_train=args.n_train, epochs=args.epochs, seed=args.seed),
        prior=_prior_config(args),
    )
    pipe = build_pipeline(cfg, dtype=_dtype(args), metrics=log)
    key = jax.random.PRNGKey(args.seed)
    k_true, k_noise, k_map = jax.random.split(key, 3)
    # working coordinates: log k for the gaussian prior (to_theta = identity),
    # whitened z for box priors — the MAP runs in working coordinates and the
    # forward model composes through to_theta, like run_inversion
    to_theta = pipe.prior.to_theta
    x_true = pipe.prior.sample(k_true)
    data = pipe.fin.forward(jnp.exp(to_theta(x_true))) + args.noise * jax.random.normal(
        k_noise, (pipe.fin.op.n_obs,), _dtype(args)
    )
    fwd_theta = pipe.forward_fn(args.likelihood)
    fwd = lambda x: fwd_theta(to_theta(x))
    sig_lap = args.noise
    if args.infer_noise:
        # MAP under the sigma-marginal potential; Laplace at the plug-in
        # conditional-mode scale (same rule as api.run_inversion)
        from bayesianinferencedl_tpu.infer.pcn import marginal_misfit

        misfit = marginal_misfit(fwd, data, a0=2.0, b0=float(args.noise) ** 2)
    else:
        misfit = gaussian_misfit(fwd, data, args.noise)
    x_map, nlp = find_map_multistart(misfit, pipe.prior, k_map, n_starts=8)
    if args.infer_noise:
        r_map = fwd(x_map) - data
        sig_lap = float(np.sqrt(
            (float(args.noise) ** 2 + 0.5 * float(jnp.sum(r_map * r_map)))
            / (2.0 + 0.5 * r_map.shape[-1])
        ))
    lap = laplace_approximation(fwd, data, sig_lap, pipe.prior, x_map)
    sd = np.sqrt(np.diag(np.asarray(lap.cov)))
    theta_map = to_theta(x_map)
    rec = {
        "theta_map": np.asarray(theta_map).tolist(),
        "theta_true": np.asarray(to_theta(x_true)).tolist(),
        "laplace_sd_working": sd.tolist(),
        "k_map": np.exp(np.asarray(theta_map)).tolist(),
        "nlp": float(nlp),
        "prior": args.prior,
        **({"noise_sigma_plugin": sig_lap} if args.infer_noise else {}),
    }
    if getattr(args, "psis", 0):
        # certify the LAPLACE fit: is the local quadratic actually covering
        # the posterior? (infer/psis.py k-hat gate + corrected mean)
        if args.infer_noise:
            raise SystemExit(
                "--psis with --infer-noise is unsupported: the sigma-marginal "
                "potential needs its own importance target"
            )
        from bayesianinferencedl_tpu.infer.psis import psis_correct

        fwd_b_theta = pipe.batched_forward_fn(args.likelihood)
        fwd_b = jax.jit(lambda xs: fwd_b_theta(to_theta(xs)))  # elementwise
        misfit_b = gaussian_misfit(fwd_b, data, args.noise)
        cert = psis_correct(
            misfit_b, pipe.prior, lap.mean, lap.chol,
            jax.random.PRNGKey(args.seed + 2), n_draws=args.psis, batched=True,
        )
        rec["psis"] = {
            "n_draws": args.psis,
            "k_hat": round(cert.k_hat, 3),
            "reliable": cert.reliable,
            "ess": round(cert.ess, 1),
            "corrected_mean_working": cert.mean.tolist(),
            "log_evidence": round(cert.log_evidence, 4),
        }
    print(json.dumps(rec))


def cmd_design(args) -> None:
    """Optimal sensor placement (infer/oed.py): greedy D-optimal /
    expected-information-gain selection of pointwise temperature sensors
    from the exterior-boundary candidates — where to put thermocouples
    BEFORE running the inversion. Beyond the reference's fixed five
    subfin-average observables."""
    from bayesianinferencedl_tpu.api import make_prior
    from bayesianinferencedl_tpu.infer.oed import design_sensors
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)
    dtype = _dtype(args)
    fin = FiveParamFin.create(
        resolution=args.resolution, biot=args.biot, dtype=dtype,
        cg_tol=1e-11 if args.dtype == "float64" else 1e-7,
    )
    prior = make_prior(_prior_config(args), dtype=dtype)
    with log.timer("design"):
        design = design_sensors(
            fin, prior, n_sensors=args.sensors, noise_sigma=args.noise,
            n_draws=args.draws, key=jax.random.PRNGKey(args.seed),
            tol=1e-11 if args.dtype == "float64" else 1e-7,
        )
    log.log("design", n_candidates=int(design.candidates.shape[0]))
    if args.out:
        np.savez(
            args.out, node_ids=design.node_ids, xy=design.xy,
            eig_trace=design.eig_trace, gains=design.gains,
            noise_sigma=args.noise, resolution=args.resolution,
        )
        log.log("saved_design", path=args.out)
    print(json.dumps({
        "n_sensors": args.sensors,
        "node_ids": design.node_ids.tolist(),
        "xy": [[round(float(a), 6) for a in row] for row in design.xy],
        "eig_trace_nats": [round(float(v), 4) for v in design.eig_trace],
        "gains_nats": [round(float(v), 4) for v in design.gains],
        "n_candidates": int(design.candidates.shape[0]),
        "prior": args.prior,
    }))


def cmd_invert_ff(args) -> None:
    """Full-field (nodal conductivity) Bayesian inversion in RFF coefficient
    space (SURVEY.md §2a #4)."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline,
        run_full_field_inversion,
    )
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics, run_config=vars(args))
    pipe = build_full_field_pipeline(
        resolution=args.resolution, biot=args.biot, dtype=_dtype(args),
        ell=args.ell, sigma=args.sigma, n_features=args.n_features,
        n_snapshots=args.n_snapshots, basis_size=args.r, k_basis_size=args.k_basis,
        basis=args.basis,
        n_train=args.n_train, surrogate_steps=args.epochs * 10, seed=args.seed,
        metrics=log,
    )
    mesh = None
    if args.shard and jax.device_count() > 1:
        from bayesianinferencedl_tpu.parallel import device_mesh

        mesh = device_mesh()
    obs = None
    if getattr(args, "data", None):
        obs = jnp.asarray(np.load(args.data)["data"])
        log.log("external_data", path=args.data, n_obs=int(obs.shape[0]))
    res, z_true, data, ess, r, wall = run_full_field_inversion(
        pipe, likelihood=args.likelihood, sampler=args.sampler, data=obs,
        n_chains=args.chains, n_steps=args.steps, n_burn=args.burn,
        beta=args.beta, noise_sigma=args.noise,
        n_temps=args.n_temps, lambda_min=args.lambda_min, subchain=args.subchain,
        da_inner=args.da_inner, adapt_ladder=args.adapt_ladder,
        mlda_resolution=args.mlda_resolution, mlda_subchain=args.mlda_subchain,
        hmc_leap=args.hmc_leap, mala_step=args.mala_step,
        lis_points=args.lis_points, lis_rank=args.lis_rank, lis_tol=args.lis_tol,
        infer_noise=args.infer_noise,
        key=jax.random.PRNGKey(args.seed), mesh=mesh,
    )
    z_post = res.samples.mean(axis=(0, 1))
    fwd = pipe.forward_fn(args.likelihood)
    fit_post = float(jnp.linalg.norm(fwd(z_post) - data))
    fit_prior = float(jnp.linalg.norm(fwd(jnp.zeros_like(z_post)) - data))
    ppc = sigma_post = None
    if res.samples.shape[0]:
        fwd_b = pipe.batched_forward_fn(args.likelihood)
        if args.infer_noise:
            # unknown noise: scale-free shape PPC + conjugate sigma recovery
            # (same contract as `invert --infer-noise` — utils/ppc.py)
            from bayesianinferencedl_tpu.utils.ppc import (
                noise_posterior, ppc_shape_pvalue,
            )

            ppc = ppc_shape_pvalue(
                fwd_b, res.samples, data, jax.random.PRNGKey(args.seed + 101)
            )
            _, sigma_post = noise_posterior(
                fwd_b, res.samples, data, jax.random.PRNGKey(args.seed + 102),
                a0=2.0, b0=float(args.noise) ** 2,
            )
        else:
            from bayesianinferencedl_tpu.utils.ppc import ppc_chi2_pvalue

            ppc = ppc_chi2_pvalue(
                fwd_b, res.samples, data,
                args.noise, jax.random.PRNGKey(args.seed + 101),
            )
    # note: with m << n_features observations the field itself is identified
    # only in a few data directions (posterior ~ prior elsewhere); data-space
    # fit is the meaningful recovery metric
    out = {
        "likelihood": args.likelihood,
        "sampler": args.sampler,
        "n_features": args.n_features,
        "samples_per_sec": res.samples.shape[0] * res.samples.shape[1] / wall,
        "ess_min": float(jnp.min(ess)),
        "accept_rate": float(jnp.mean(res.accept_rate)),
        "rhat_split_max": float(jnp.max(r)),
        "data_misfit_posterior_mean": fit_post,
        "data_misfit_prior_mean": fit_prior,
        "ppc_p_value": ppc["p_value"] if ppc else None,
        **({"noise_sigma_post": sigma_post} if sigma_post is not None else {}),
    }
    if getattr(args, "predict_at", None) or getattr(args, "predict_out", None):
        from bayesianinferencedl_tpu.api_full_field import predict_temperature_ff

        sig = args.noise
        if sigma_post is not None:
            sig = sigma_post["sigma_q50"]
        pred = predict_temperature_ff(
            pipe, res.samples,
            points=_parse_points(args.predict_at), noise_sigma=sig,
        )
        if args.predict_at:
            out["predictions"] = pred.summary_rows()
        if args.predict_out:
            pred.save_npz(args.predict_out)
            out["prediction_field"] = args.predict_out
        log.log("predict", n_draws=pred.n_draws, points=len(pred.summary_rows()))
    print(json.dumps(out))


def cmd_pipeline(args) -> None:
    cmd_invert(args)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bayesianinferencedl_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("fom", help="config 1: single FOM solve")
    _add_common(p)
    p.add_argument("--k", type=float, nargs=5, default=[1.0, 1.0, 1.0, 1.0, 1.0])
    p.add_argument(
        "--save-obs", type=str, default=None,
        help="write the QoI vector as an observation npz for `invert --data`",
    )
    p.set_defaults(fn=cmd_fom)

    p = sub.add_parser("snapshots", help="config 2: batched FOM solves")
    _add_common(p)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--out", type=str, default=None)
    p.set_defaults(fn=cmd_snapshots)

    p = sub.add_parser("rom", help="config 3: reduced basis + rel-err")
    _add_common(p)
    p.add_argument("--n-snapshots", type=int, default=256)
    p.add_argument("--r", type=int, default=40)
    p.add_argument("--method", choices=["pod", "greedy"], default="pod")
    p.add_argument("--out", type=str, default=None)
    p.set_defaults(fn=cmd_rom)

    for name, fn in [
        ("surrogate", cmd_surrogate),
        ("invert", cmd_invert),
        ("pipeline", cmd_pipeline),
        ("map", cmd_map),
        ("evidence", cmd_evidence),
        ("sbc", cmd_sbc),
        ("eki", cmd_eki),
        ("vi", cmd_vi),
        ("svgd", cmd_svgd),
    ]:
        p = sub.add_parser(name)
        _add_common(p)
        _add_prior(p)
        p.add_argument("--n-snapshots", type=int, default=256)
        p.add_argument("--r", type=int, default=40)
        p.add_argument("--n-train", type=int, default=1024)
        p.add_argument("--epochs", type=int, default=300)
        p.add_argument("--out", type=str, default=None)
        p.add_argument(
            "--online-precision", choices=["highest", "high", "fast"],
            default="highest",
            help="reduced-solve matmul tier: high = bf16x3, ~1.9x chains "
                 "at corrected rel-err 5.7e-5 (docs/DESIGN.md §4)",
        )
        if name == "map":
            p.add_argument("--noise", type=float, default=1e-3)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument(
                "--infer-noise", action="store_true",
                help="MAP under the sigma-marginalized potential "
                "(InvGamma(2, noise^2) prior); Laplace intervals at the "
                "plug-in conditional-mode noise scale",
            )
            p.add_argument(
                "--psis", type=int, default=0, metavar="K",
                help="certify the Laplace fit by Pareto-smoothed importance "
                "sampling with K draws (infer/psis.py k-hat gate + corrected "
                "mean; fixed-noise likelihood only)",
            )
        elif name == "eki":
            p.add_argument("--noise", type=float, default=1e-2)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument("--ensemble", type=int, default=1024, help="ensemble size J")
            p.add_argument(
                "--ess-target", type=float, default=0.5,
                help="tempering-increment ESS fraction controlling the adaptive step",
            )
            p.add_argument(
                "--data", type=str, default=None,
                help="observation npz (key 'data'): external measurements",
            )
            p.add_argument(
                "--psis", type=int, default=0, metavar="K",
                help="certify the moment-matched ensemble Gaussian by "
                "Pareto-smoothed importance sampling with K draws "
                "(infer/psis.py k-hat gate + corrected mean)",
            )
        elif name == "vi":
            p.add_argument("--noise", type=float, default=1e-2)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument(
                "--rank", choices=["full", "meanfield"], default="full",
                help="variational family: dense Cholesky (exact on Gaussian "
                "posteriors) or diagonal (cheaper, shrinks correlated marginals)",
            )
            p.add_argument("--steps", type=int, default=1500, help="Adam steps on the ELBO")
            p.add_argument("--mc", type=int, default=32, help="Monte Carlo draws per step")
            p.add_argument("--lr", type=float, default=0.05)
            p.add_argument(
                "--psis", type=int, default=0, metavar="K",
                help="certify the fit by Pareto-smoothed importance sampling "
                "with K draws (infer/psis.py): reports k-hat (<0.7 = the fit "
                "covers the posterior) and the importance-corrected mean",
            )
            p.add_argument(
                "--data", type=str, default=None,
                help="observation npz (key 'data'): external measurements",
            )
            p.add_argument(
                "--flow", type=int, default=0, metavar="N",
                help="fit a normalizing flow with N coupling layers instead "
                "of the Gaussian family (infer/flow.py): the non-Gaussian / "
                "multimodal-capable member of the approximation layer, "
                "pretrained mass-covering on a tempered-SMC population "
                "(collapse-proof; --flow-pretrain none for plain annealed "
                "reverse-KL flow-VI on unimodal targets)",
            )
            p.add_argument(
                "--flow-pretrain", choices=["smc", "none"], default="smc",
            )
            p.add_argument(
                "--neutra", type=int, default=0, metavar="STEPS",
                help="after the flow fit, run STEPS of flow-preconditioned "
                "pCN (NeuTra, exact posterior whatever the flow quality) and "
                "report its rank-normalized diagnostics next to the fit",
            )
            p.add_argument(
                "--psis-widen", type=float, default=1.0, metavar="S",
                help="certify through a base-widened flow proposal "
                "(defensive importance sampling, flow_sample base_scale): "
                "the move when k-hat sits just above the 0.7 gate from "
                "mild under-dispersion (flow branch only)",
            )
        elif name == "svgd":
            p.add_argument("--noise", type=float, default=1e-2)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument("--particles", type=int, default=512, help="ensemble size J")
            p.add_argument("--steps", type=int, default=800, help="Stein/Adam transport steps")
            p.add_argument("--lr", type=float, default=0.05)
            p.add_argument(
                "--anneal", type=int, default=-1, metavar="N",
                help="likelihood ramp length (default steps//2; 0 disables "
                "— classic SVGD, can collapse on multimodal targets)",
            )
            p.add_argument(
                "--data", type=str, default=None,
                help="observation npz (key 'data'): external measurements",
            )
            p.add_argument(
                "--psis", type=int, default=0, metavar="K",
                help="certify the moment-matched ensemble Gaussian by "
                "Pareto-smoothed importance sampling with K draws "
                "(infer/psis.py k-hat gate + corrected mean)",
            )
            p.add_argument(
                "--segment", type=int, default=0, metavar="S",
                help="scan chunk size (0 = likelihood-aware auto: fom "
                "segments at 100 steps for the ~60 s single-program "
                "watchdog, rom/rom_nn run unsegmented)",
            )
        elif name == "sbc":
            p.add_argument("--noise", type=float, default=1e-2)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument(
                "--sampler", choices=["pcn", "mala", "hmc", "pt_pcn"], default="pcn",
                help="kernel under calibration (mala/hmc exercise the "
                "gradient-proposal corrections; pt_pcn certifies the "
                "tempered sampler on multimodal regimes where "
                "single-temperature kernels should FAIL this check)",
            )
            p.add_argument("--mala-step", type=float, default=0.1)
            p.add_argument("--hmc-leap", type=int, default=8)
            p.add_argument("--temps", type=int, default=5, help="pt_pcn ladder size")
            p.add_argument("--lambda-min", type=float, default=0.02, help="pt_pcn ladder floor")
            p.add_argument("--datasets", type=int, default=128, help="synthetic inversions J")
            p.add_argument(
                "--sbc-chains", type=int, default=31,
                help="chains per dataset C (posterior draws per rank; "
                "C+1 must divide by --bins)",
            )
            p.add_argument("--steps", type=int, default=800)
            p.add_argument("--burn", type=int, default=400)
            p.add_argument("--bins", type=int, default=8, help="rank-histogram bins")
        elif name == "evidence":
            p.add_argument("--noise", type=float, default=1e-3)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument("--particles", type=int, default=4096, help="total SMC population")
            p.add_argument("--groups", type=int, default=8, help="independent populations (error bar)")
            p.add_argument("--mutations", type=int, default=5, help="pCN sweeps per tempering stage")
            p.add_argument("--ess-target", type=float, default=0.5, help="ESS/N kept per stage")
            p.add_argument("--shard", action="store_true", help="island SMC over the device mesh")
        elif name != "surrogate":
            p.add_argument("--chains", type=int, default=1024)
            p.add_argument("--steps", type=int, default=10_000)
            p.add_argument("--burn", type=int, default=1_000)
            p.add_argument("--beta", type=float, default=0.25)
            p.add_argument("--noise", type=float, default=1e-3)
            p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
            p.add_argument(
                "--sampler",
                choices=["pcn", "laplace_mh", "gpcn", "pt_pcn", "pt_mala", "da_pcn", "pt_da_pcn", "mlda_pcn", "mala", "mala_lap", "hmc", "hmc_lap"],
                default="pcn",
            )
            p.add_argument("--n-temps", type=int, default=4, help="pt_pcn ladder size")
            p.add_argument("--lambda-min", type=float, default=0.05, help="pt_pcn hottest level")
            p.add_argument(
                "--adapt-ladder", action="store_true",
                help="tune the PT ladder during burn-in (swap-rate targeting)",
            )
            p.add_argument("--subchain", type=int, default=64, help="da_pcn inner steps per fine correction (r5 frontier deployment — config.MCMCConfig.subchain)")
            p.add_argument("--da-coarse", choices=["rom", "rom_nn"], default="rom_nn")
            p.add_argument(
                "--da-inner", choices=["pcn", "mala"], default="pcn",
                help="da_pcn subchain kernel (mala = gradient-informed)",
            )
            p.add_argument(
                "--mlda-resolution", type=int, default=2,
                help="mlda_pcn mid-rung FOM mesh resolution",
            )
            p.add_argument(
                "--mlda-subchain", type=int, default=4,
                help="mlda_pcn mid-rung steps per fine correction",
            )
            p.add_argument(
                "--hmc-leap", type=int, default=8,
                help="hmc leapfrog steps per trajectory; 0 = auto (cross-chain ChEES trajectory tuning, rom/rom_nn likelihoods; shards over the mesh)",
            )
            p.add_argument(
                "--mala-step", type=float, default=0.1,
                help="initial MALA/HMC step size (adapted per chain in burn-in)",
            )
            p.add_argument(
                "--data", type=str, default=None,
                help="observation npz (key 'data'): invert EXTERNAL "
                "measurements instead of synthesizing; --noise is then the "
                "assumed instrument noise",
            )
            p.add_argument(
                "--infer-noise", action="store_true",
                help="treat the observation noise as UNKNOWN: integrate "
                "sigma out under a conjugate InvGamma(2, noise^2) prior "
                "(the production choice for --data measurements whose "
                "instrument noise isn't calibrated); --noise softens into "
                "the prior scale guess and the sigma posterior is reported",
            )
            p.add_argument(
                "--sensors", type=str, default=None,
                help="design npz from `design --out`: invert its POINTWISE "
                "sensor observables instead of the five subfin averages",
            )
            p.add_argument("--shard", action="store_true")
            if name == "invert":
                p.add_argument(
                    "--init", choices=["prior", "eki", "vi"], default="prior",
                    help="chain initialization: 'eki' warm-starts from a "
                    "derivative-free EKI ensemble (~10 batched sweeps), 'vi' "
                    "from a short full-rank ADVI fit (gradient-based) — so "
                    "chains begin inside the posterior bulk; unimodal "
                    "regimes only (api.run_inversion docstring)",
                )
                p.add_argument(
                    "--predict-at", action="append", default=None,
                    metavar="X,Y",
                    help="posterior-predictive temperature at a point that "
                    "was never instrumented (repeatable; exact P1 "
                    "interpolation through a batched FOM sweep over the "
                    "posterior — api.predict_temperature)",
                )
                p.add_argument(
                    "--predict-out", type=str, default=None,
                    help="save the full posterior temperature-field "
                    "prediction (mean/std/quantiles per mesh node) as npz",
                )
        p.set_defaults(fn=fn)

    p = sub.add_parser(
        "design",
        help="optimal sensor placement: greedy max-information pointwise "
        "sensors (infer/oed.py)",
    )
    _add_common(p)
    _add_prior(p)
    p.add_argument("--sensors", type=int, default=5, help="sensors to place")
    p.add_argument("--noise", type=float, default=1e-2, help="assumed sensor noise")
    p.add_argument("--draws", type=int, default=16, help="prior draws for the EIG expectation")
    p.add_argument(
        "--out", type=str, default=None,
        help="save the design as npz (node_ids/xy/eig) for `invert --sensors`",
    )
    p.set_defaults(fn=cmd_design)

    p = sub.add_parser("invert-ff", help="full-field (nodal k) inversion")
    _add_common(p)
    p.add_argument("--n-snapshots", type=int, default=256)
    p.add_argument("--r", type=int, default=40)
    p.add_argument("--k-basis", type=int, default=40)
    p.add_argument(
        "--basis", choices=["pod", "greedy"], default="pod",
        help="state-basis builder: POD (default) or residual-indicator "
        "greedy selection over the snapshot set (rom/nonaffine.py; "
        "measured comparison artifacts/greedy_ff_r4.json)",
    )
    p.add_argument("--n-features", type=int, default=64)
    p.add_argument("--ell", type=float, default=1.0)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--n-train", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--chains", type=int, default=1024)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--burn", type=int, default=1000)
    p.add_argument("--beta", type=float, default=0.3)
    p.add_argument("--noise", type=float, default=1e-3)
    p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
    p.add_argument(
        "--sampler",
        choices=["pcn", "laplace_mh", "gpcn", "pt_pcn", "pt_mala", "da_pcn", "pt_da_pcn", "mlda_pcn", "mala", "mala_lap", "hmc", "hmc_lap", "lis_pcn"],
        default="pcn",
    )
    p.add_argument("--n-temps", type=int, default=5)
    p.add_argument("--lambda-min", type=float, default=0.02)
    p.add_argument(
        "--adapt-ladder", action="store_true",
        help="tune the PT ladder during burn-in (swap-rate targeting)",
    )
    p.add_argument("--subchain", type=int, default=64)
    p.add_argument(
        "--da-inner", choices=["pcn", "mala"], default="pcn",
        help="da_pcn subchain kernel (mala = gradient-informed)",
    )
    p.add_argument(
        "--mlda-resolution", type=int, default=2,
        help="mlda_pcn mid-rung FOM mesh resolution",
    )
    p.add_argument(
        "--mlda-subchain", type=int, default=4,
        help="mlda_pcn mid-rung steps per fine correction",
    )
    p.add_argument(
        "--hmc-leap", type=int, default=8,
        help="hmc leapfrog steps per trajectory; 0 = auto (cross-chain ChEES trajectory tuning, rom/rom_nn likelihoods; shards over the mesh)",
    )
    p.add_argument(
        "--mala-step", type=float, default=0.1,
        help="initial MALA/HMC step size (adapted per chain in burn-in)",
    )
    p.add_argument(
        "--lis-points", type=int, default=16,
        help="lis_pcn: Jacobian points for the offline subspace build",
    )
    p.add_argument(
        "--lis-rank", type=int, default=None,
        help="lis_pcn: cap the informed-subspace rank (default: lis-tol cut)",
    )
    p.add_argument(
        "--lis-tol", type=float, default=0.1,
        help="lis_pcn: eigenvalue cutoff for the informed subspace",
    )
    p.add_argument(
        "--data", type=str, default=None,
        help="observation npz (key 'data'): invert EXTERNAL measurements "
        "instead of synthesizing",
    )
    p.add_argument(
        "--infer-noise", action="store_true",
        help="treat the observation noise as UNKNOWN: integrate sigma out "
        "under a conjugate InvGamma(2, noise^2) prior; --noise softens into "
        "the prior scale guess and the sigma posterior is reported",
    )
    p.add_argument("--shard", action="store_true")
    p.add_argument(
        "--predict-at", action="append", default=None, metavar="X,Y",
        help="posterior-predictive temperature at an uninstrumented point "
        "(repeatable; api_full_field.predict_temperature_ff)",
    )
    p.add_argument(
        "--predict-out", type=str, default=None,
        help="save the posterior temperature-field prediction as npz",
    )
    p.set_defaults(fn=cmd_invert_ff)

    p = sub.add_parser(
        "sbc-ff", help="simulation-based calibration of the full-field sampler stack"
    )
    _add_common(p)
    p.add_argument("--n-snapshots", type=int, default=256)
    p.add_argument("--r", type=int, default=40)
    p.add_argument("--k-basis", type=int, default=40)
    p.add_argument(
        "--basis", choices=["pod", "greedy"], default="pod",
        help="state-basis builder: POD (default) or residual-indicator "
        "greedy selection over the snapshot set (rom/nonaffine.py; "
        "measured comparison artifacts/greedy_ff_r4.json)",
    )
    p.add_argument("--n-features", type=int, default=64)
    p.add_argument("--ell", type=float, default=1.0)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--n-train", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--noise", type=float, default=1e-2)
    p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
    p.add_argument(
        "--sampler", choices=["pcn", "mala", "hmc", "pt_pcn"], default="pcn",
        help="kernel under calibration (pt_pcn for the multimodal 1e-3 regime)",
    )
    p.add_argument("--mala-step", type=float, default=0.1)
    p.add_argument("--hmc-leap", type=int, default=8)
    p.add_argument("--temps", type=int, default=5)
    p.add_argument("--lambda-min", type=float, default=0.02)
    p.add_argument("--datasets", type=int, default=128)
    p.add_argument("--sbc-chains", type=int, default=31)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--burn", type=int, default=1000)
    p.add_argument("--bins", type=int, default=8)
    p.set_defaults(fn=cmd_sbc_ff)

    p = sub.add_parser("evidence-ff", help="full-field model evidence (adaptive tempered SMC)")
    _add_common(p)
    p.add_argument("--n-snapshots", type=int, default=256)
    p.add_argument("--r", type=int, default=40)
    p.add_argument("--k-basis", type=int, default=40)
    p.add_argument(
        "--basis", choices=["pod", "greedy"], default="pod",
        help="state-basis builder: POD (default) or residual-indicator "
        "greedy selection over the snapshot set (rom/nonaffine.py; "
        "measured comparison artifacts/greedy_ff_r4.json)",
    )
    p.add_argument("--n-features", type=int, default=64)
    p.add_argument("--ell", type=float, default=1.0)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--n-train", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--noise", type=float, default=1e-3)
    p.add_argument("--likelihood", choices=["fom", "rom", "rom_nn"], default="rom_nn")
    p.add_argument("--particles", type=int, default=4096, help="total SMC population")
    p.add_argument("--groups", type=int, default=8, help="independent populations (error bar)")
    p.add_argument("--mutations", type=int, default=5, help="pCN sweeps per tempering stage")
    p.add_argument("--ess-target", type=float, default=0.5, help="ESS/N kept per stage")
    p.add_argument(
        "--data", type=str, default=None,
        help="observation npz (key 'data'): external measurements",
    )
    p.add_argument("--shard", action="store_true", help="island SMC over the device mesh")
    p.set_defaults(fn=cmd_evidence_ff)

    p = sub.add_parser(
        "select-ell",
        help="choose the full-field prior's correlation length by model "
        "evidence (exact-FOM SMC per candidate; Bayes factors over ell)",
    )
    _add_common(p)
    p.add_argument(
        "--ells", type=float, nargs="+", required=True,
        help="candidate correlation lengths",
    )
    p.add_argument("--n-features", type=int, default=64)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--noise", type=float, default=1e-2)
    p.add_argument(
        "--ell-true", type=float, default=None,
        help="simulate observations from this ell (omit with --data)",
    )
    p.add_argument(
        "--n-datasets", type=int, default=1,
        help="independent simulated experiments pooled (log Z summed) — "
        "one 5-obs dataset cannot identify ell; see "
        "api_full_field.select_correlation_length",
    )
    p.add_argument(
        "--data", type=str, default=None,
        help="observation npz (key 'data', shape (n_obs,) or (M, n_obs))",
    )
    p.add_argument("--particles", type=int, default=4096)
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--mutations", type=int, default=5)
    p.add_argument("--max-stages", type=int, default=128)
    p.set_defaults(fn=cmd_select_ell)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
