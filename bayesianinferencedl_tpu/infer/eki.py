"""Ensemble Kalman inversion (EKI): derivative-free ensemble inversion with
adaptive tempering (SURVEY.md A.5 inversion layer — a beyond-reference
capability; Iglesias/Law/Stuart 2013, adaptive steps per Iglesias/Yang).

The most TPU-native inversion algorithm there is: the ensemble IS the batch
axis. One iteration = ONE batched forward over all J members (the identical
fused route the samplers use — for the fom likelihood that is one Pallas
deflated-CG dispatch for the whole ensemble) + ensemble cross-covariances
that are (d, J) x (J, m) matmuls. No gradients, no adjoints, no chains.

Tempering view: EKI transports the prior ensemble through the bridge
pi_t ∝ exp(-t Phi) mu0 from t=0 to t=1 in adaptive increments. Each
increment applies the Kalman update with the INFLATED noise Sigma/dt —
exact for linear forward maps + Gaussian priors (the ensemble is then a
consistent sample of the posterior as J -> infinity); for nonlinear G it is
the standard Gaussian-ansatz approximation: a fast, derivative-free
posterior APPROXIMATION, not an exact sampler. The honest contract
(measured in tests/test_eki.py and docs/SAMPLERS.md): means/spreads track
the pCN reference on the fin's unimodal regime at a tiny fraction of the
forward evaluations; for certified posteriors use the MCMC kernels.

The adaptive step chooses each dt by the effective-sample-size rule on the
tempering increment (the same instrument infer/smc.py uses): dt such that
ESS(exp(-dt Phi_centered)) = ess_target * J, bisected in log-space, capped
at the remaining 1 - t. Misfit spreads set the pace: a sharp likelihood
takes many small steps, a flat one finishes in a few.

Host/device split per the repo convention (CLAUDE.md rule 5 / rule 9): the
expensive physics (the batched forward) runs on device; the tiny m x m
Kalman algebra (m = n_obs) runs in f64 NumPy on the host — dense linalg
custom calls never touch the TPU hot path, and an EKI run is ~10-20 outer
iterations so the ~10 ms dispatch cadence is irrelevant.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class EKIResult(NamedTuple):
    ensemble: jax.Array  # (J, d) final ensemble, working coordinates
    mean: jax.Array  # (d,) ensemble mean
    std: jax.Array  # (d,) ensemble marginal std (posterior spread estimate
    # — exact only in the linear-Gaussian limit; see module docstring)
    ts: list  # tempering knots 0 = t_0 < ... < t_N = 1 actually taken
    misfit_trace: list  # ensemble-mean data misfit Phi at each knot
    n_forward: int  # total forward evaluations (J * iterations)


def _ess_fraction(dphi: np.ndarray, dt: float) -> float:
    """ESS/J of the tempering increment weights w ∝ exp(-dt * dphi)."""
    lw = -dt * (dphi - dphi.min())
    w = np.exp(lw - lw.max())
    return float(w.sum() ** 2 / (w * w).sum() / w.size)


def _adaptive_dt(dphi: np.ndarray, remaining: float, ess_target: float) -> float:
    """Largest dt <= remaining with ESS fraction >= ess_target (bisection;
    monotone in dt)."""
    if _ess_fraction(dphi, remaining) >= ess_target:
        return remaining
    lo, hi = 0.0, remaining
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if _ess_fraction(dphi, mid) >= ess_target:
            lo = mid
        else:
            hi = mid
    return max(lo, 1e-6 * remaining)


def run_eki(
    forward_batch: Callable,
    prior: GaussianPrior,
    data: jax.Array,
    noise_sigma: float,
    key: jax.Array,
    *,
    n_ensemble: int = 1024,
    ess_target: float = 0.5,
    max_iters: int = 50,
    mesh=None,
) -> EKIResult:
    """Adaptive-tempering EKI to t = 1.

    forward_batch: (J, d) -> (J, m) batched forward in WORKING coordinates
    (compose to_theta outside, exactly like run_sbc / the samplers).
    Returns the final ensemble as the posterior approximation.

    mesh: optional jax.sharding.Mesh — the ensemble axis shards over ICI
    for the device-side forward sweeps (embarrassingly parallel; n_ensemble
    must divide by the mesh size). The O(J (d+m)) host algebra gathers —
    at J ~ 1e3 it is microseconds and never the bottleneck.
    """
    J = n_ensemble
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if J % mesh.size:
            raise ValueError(f"n_ensemble={J} must divide by mesh size {mesh.size}")
        sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    d = prior.dim
    data64 = np.asarray(data, np.float64)
    m = data64.shape[0]
    sig2 = float(noise_sigma) ** 2

    # jit the sweep: eagerly, a vmapped iterative forward is hundreds of
    # per-primitive dispatches (~10 ms tunnel RTT each — CLAUDE.md
    # whole-solve-jit rule); harmless if the caller already passed a jitted
    # function (the inner jit inlines)
    fwd_j = jax.jit(forward_batch)

    k_init, k_loop = jax.random.split(key)
    theta = prior.sample(k_init, (J,))  # device (J, d)
    if sharding is not None:
        theta = jax.device_put(theta, sharding)
    rng = np.random.default_rng(
        int(jax.random.randint(k_loop, (), 0, np.iinfo(np.int32).max))
    )

    t = 0.0
    ts = [0.0]
    misfit_trace = []
    n_forward = 0
    it = 0
    while t < 1.0 and it < max_iters:
        it += 1
        # --- device: the physics (one batched forward for the ensemble) ---
        G = np.asarray(fwd_j(theta), np.float64)  # (J, m)
        n_forward += J
        th = np.asarray(theta, np.float64)  # (J, d)

        r = G - data64[None, :]
        phi = 0.5 * np.einsum("jm,jm->j", r, r) / sig2
        misfit_trace.append(float(phi.mean()))

        # --- host f64: adaptive step + m x m Kalman algebra ---
        dt = _adaptive_dt(phi, 1.0 - t, ess_target)
        Gc = G - G.mean(axis=0, keepdims=True)
        thc = th - th.mean(axis=0, keepdims=True)
        C_yy = Gc.T @ Gc / (J - 1)  # (m, m)
        C_ty = thc.T @ Gc / (J - 1)  # (d, m)
        # perturbed observations with the 1/dt-inflated noise
        eps = rng.standard_normal((J, m)) * (noise_sigma / np.sqrt(dt))
        K = C_ty @ np.linalg.inv(C_yy + np.eye(m) * (sig2 / dt))  # (d, m)
        th = th + (data64[None, :] + eps - G) @ K.T
        t += dt
        ts.append(round(t, 8))

        theta = jnp.asarray(th, prior.mean.dtype)
        if sharding is not None:
            theta = jax.device_put(theta, sharding)

    # final misfit at t = 1 (one more batched forward, reported not used)
    G = np.asarray(fwd_j(theta), np.float64)
    n_forward += J
    r = G - data64[None, :]
    misfit_trace.append(float((0.5 * np.einsum("jm,jm->j", r, r) / sig2).mean()))

    return EKIResult(
        ensemble=theta,
        mean=jnp.mean(theta, axis=0),
        std=jnp.std(theta, axis=0),
        ts=ts,
        misfit_trace=misfit_trace,
        n_forward=n_forward,
    )
