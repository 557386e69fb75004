"""Simulation-based calibration (SBC): the posterior-correctness oracle.

Talts et al. 2018 ("Validating Bayesian inference algorithms with
simulation-based calibration"): draw (theta*, y) from the joint
prior x likelihood, sample the posterior given y with the sampler under
test, and rank theta* among L posterior draws. If the sampler targets the
exact posterior, the rank is uniform on {0..L} for every parameter — any
bug that warps the posterior (mis-scaled noise, a wrong accept ratio, a
prior mismatch, a biased surrogate) shows up as a non-uniform rank
histogram. This is the oracle R-hat cannot be: R-hat certifies the chains
AGREE, SBC certifies they agree on the RIGHT posterior (SURVEY.md §4
posterior-quality oracles).

TPU-first batching: all J synthetic datasets run in ONE sampler program.
The chain axis is J x C with a per-slot observation array captured by the
batched misfit, so the whole calibration is a single run_pcn call — scan
over steps x vmap over J*C chains, no Python loop over datasets. The L
posterior draws used for each rank are the C chains' final states:
independent chains give independent draws by construction, so no
autocorrelation thinning is needed (the standard single-chain SBC pitfall).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.pcn import run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class SBCResult(NamedTuple):
    ranks: jax.Array  # (J, d) int32 — rank of theta*_j among C draws, in [0, C]
    n_draws: int  # C (rank support is {0..C}: C+1 values)
    p_values: jax.Array  # (d,) chi-square uniformity p-value per parameter
    counts: jax.Array  # (d, n_bins) rank-histogram counts
    accept_rate: jax.Array  # (J*C,) per-chain acceptance (sanity signal)


def rank_uniformity_pvalue(ranks, n_draws: int, n_bins: int):
    """Chi-square goodness-of-fit of ranks (J, d) against the uniform law on
    {0..n_draws}, per parameter. n_bins must divide n_draws + 1 so every bin
    has equal probability. Returns (p_values (d,), counts (d, n_bins))."""
    import numpy as np
    from scipy import stats

    ranks = np.asarray(ranks)
    J, d = ranks.shape
    if (n_draws + 1) % n_bins:
        raise ValueError(f"n_bins={n_bins} must divide n_draws+1={n_draws + 1}")
    width = (n_draws + 1) // n_bins
    bins = np.clip(ranks // width, 0, n_bins - 1)
    counts = np.stack([np.bincount(bins[:, i], minlength=n_bins) for i in range(d)])
    expected = J / n_bins
    chi2 = ((counts - expected) ** 2 / expected).sum(axis=1)
    return stats.chi2.sf(chi2, df=n_bins - 1), counts


def run_sbc(
    forward_batch: Callable,
    prior: GaussianPrior,
    noise_sigma: float,
    key: jax.Array,
    *,
    n_datasets: int,
    n_chains: int = 32,
    n_steps: int = 800,
    n_burn: int = 400,
    beta: float = 0.25,
    n_bins: int = 8,
    sampler: str = "pcn",
    step: float = 0.1,
    n_leap: int = 8,
    n_temps: int = 5,
    lambda_min: float = 0.02,
) -> SBCResult:
    """Calibrate a sampler + Gaussian likelihood on `forward_batch`.

    forward_batch: (B, d) -> (B, m) batched forward map (e.g.
    ``jax.vmap(pipe.forward_fn("rom_nn"))`` or a Pallas batch solver).
    Runs J = n_datasets synthetic inversions with C = n_chains chains each
    (J*C total chain slots in one program) and rank-tests theta* against
    each dataset's C final draws. n_chains + 1 must be divisible by n_bins.

    sampler: "pcn" | "mala" | "hmc" | "pt_pcn" — the gradient kernels are
    the ones whose proposal corrections (drift taming, leapfrog MH ratio)
    hide calibration bugs; for them forward_batch must be differentiable
    (api.run_sbc_check passes differentiable=True through automatically).
    step / n_leap: initial MALA/HMC step size (adapted in burn-in) and HMC
    leapfrog count. "pt_pcn" calibrates the tempered sampler itself
    (n_temps levels, adaptive ladder from lambda_min) — the replica-swap
    rule, the post-burn ladder freeze, and the within-level tempered accept
    ratio are all places a bug would warp the cold-level target, and
    rank-uniformity on a bimodal control certifies them
    (tests/test_sbc.py::test_sbc_pt_kernel_bimodal). Each of the J*C chain
    groups carries its own dataset; the K temperature replicas of a group
    share it (states flatten (K, G, d) -> (K*G, d) with K leading, so the
    per-slot observation array tiles across K).

    What SBC can and CANNOT catch (measured, test_sbc_data_averaged_blind
    _spot): SBC certifies DATA-AVERAGED posterior correctness. A
    single-temperature ensemble whose chains strand in their init basin on
    a multimodal posterior still PASSES, because prior-initialized
    stranding inherits the prior's basin occupancy: with occupancy split
    q/(1-q) the rank marginal is q*U[(1-q)L, L] + (1-q)*U[0, (1-q)L] =
    uniform for ANY q. Per-dataset multimodal convergence is the job of
    split-R-hat and tempering (docs/SAMPLERS.md); SBC complements them by
    catching mis-scaled noise, biased surrogates, and broken proposal
    corrections — failures R-hat is blind to.
    """
    J, C = n_datasets, n_chains
    if (C + 1) % n_bins:
        raise ValueError(f"n_chains+1={C + 1} must be divisible by n_bins={n_bins}")
    if sampler not in ("pcn", "mala", "hmc", "pt_pcn"):
        raise ValueError(f"sampler must be pcn|mala|hmc|pt_pcn, got {sampler!r}")
    k_theta, k_noise, k_init, k_run = jax.random.split(key, 4)

    theta_star = prior.sample(k_theta, (J,))  # (J, d)
    # jit the simulation sweep: eagerly, a vmapped iterative forward is
    # hundreds of per-primitive dispatches (~10 ms tunnel RTT each on this
    # environment — CLAUDE.md whole-solve-jit rule)
    y_clean = jax.jit(forward_batch)(theta_star)  # (J, m)
    y = y_clean + noise_sigma * jax.random.normal(k_noise, y_clean.shape, y_clean.dtype)
    data = jnp.repeat(y, C, axis=0)  # (J*C, m) — one dataset per chain slot

    inv_two_sig2 = 0.5 / (noise_sigma * noise_sigma)

    def misfit(theta):  # (J*C, d) -> (J*C,)
        r = forward_batch(theta) - data
        return inv_two_sig2 * jnp.sum(r * r, axis=-1)

    theta0 = prior.sample(k_init, (J * C,))
    if sampler == "pt_pcn":
        from bayesianinferencedl_tpu.infer.tempering import run_pt_pcn

        data_kg = jnp.tile(data, (n_temps, 1))  # (K*J*C, m), K leading

        def misfit_pt(theta):  # (K*J*C, d) -> (K*J*C,)
            r = forward_batch(theta) - data_kg
            return inv_two_sig2 * jnp.sum(r * r, axis=-1)

        res = run_pt_pcn(
            misfit_pt, prior, theta0, k_run,
            n_steps=n_steps, n_burn=n_burn, beta=beta, batched=True,
            n_temps=n_temps, lambda_min=lambda_min, adapt_ladder=True,
        )
        accept = res.accept_rate[-1]  # cold level
    elif sampler == "mala":
        from bayesianinferencedl_tpu.infer.mala import run_mala

        res = run_mala(
            misfit, prior, theta0, k_run,
            n_steps=n_steps, n_burn=n_burn, step=step, batched=True,
        )
    elif sampler == "hmc":
        from bayesianinferencedl_tpu.infer.hmc import run_hmc

        res = run_hmc(
            misfit, prior, theta0, k_run,
            n_steps=n_steps, n_burn=n_burn, step=step, n_leap=n_leap,
            batched=True,
        )
    else:
        res = run_pcn(
            misfit, prior, theta0, k_run,
            n_steps=n_steps, n_burn=n_burn, beta=beta, batched=True,
        )
    if sampler != "pt_pcn":
        accept = res.accept_rate
    draws = res.samples[-1].reshape(J, C, -1)  # C independent chains' finals
    ranks = jnp.sum(draws < theta_star[:, None, :], axis=1).astype(jnp.int32)

    p_values, counts = rank_uniformity_pvalue(ranks, C, n_bins)
    return SBCResult(
        ranks=ranks,
        n_draws=C,
        p_values=jnp.asarray(p_values),
        counts=jnp.asarray(counts),
        accept_rate=accept,
    )
