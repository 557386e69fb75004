"""Parallel-tempered pCN: exact sampling of multimodal posteriors
(SURVEY.md A.5 / §4 'Posterior quality').

Motivation (measured, round 2): at observation noise 1e-3 the five
subfin-average observables do not always identify the five conductivities —
the FOM-likelihood posterior itself supports well-separated basins (a
mis-assigned k3/k4 configuration fit the data BETTER than the truth:
phi_fom 3.73 vs 5.43). Single-temperature pCN chains each explore one basin
(healthy acceptance, R-hat ~ 2 across chains); no local sampler fixes that.

Parallel tempering runs K replicas per chain group targeting
pi_j(x) ∝ exp(-lambda_j Phi(x)) mu0(x) with 0 < lambda_1 < ... <
lambda_K = 1 and mu0 the shared pCN reference (the prior), and exchanges
states between adjacent levels with the Metropolis swap rule

    alpha = min(1, exp((lambda_a - lambda_b) (Phi(x_a) - Phi(x_b)))) .

The prior factors cancel in the swap because every level shares mu0, so the
cold level (lambda = 1) samples the exact posterior. Hot levels see a nearly
flat likelihood, hop between basins freely (their adapted pCN step sizes are
prior-scale), and feed basin changes down the ladder through swaps.

TPU mapping: states are (K, G, d) arrays — temperatures x chain groups; the
within-level pCN update is ONE batched misfit evaluation over all K*G
proposals (the identical fused kernel the single-temperature sampler uses),
and the swap pass is a pure roll/where shuffle along the K axis. The whole
sampler is one scan — zero host round-trips, like run_pcn.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.pcn import TARGET_ACCEPT
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class PTResult(NamedTuple):
    samples: jax.Array  # (n_kept, G, d) cold-level samples
    phi_trace: jax.Array  # (n_kept, G) cold-level misfits
    accept_rate: jax.Array  # (K, G) within-level post-burn acceptance
    swap_rate: jax.Array  # (K-1,) mean swap acceptance per adjacent pair
    beta: jax.Array  # (K, G) final adapted step sizes
    theta: jax.Array  # (K, G, d) final states (resume support)


def geometric_ladder(n_temps: int, lambda_min: float = 0.05, dtype=jnp.float32) -> jax.Array:
    """Inverse temperatures lambda_1 < ... < lambda_K = 1, geometric spacing —
    the standard choice when Phi spans orders of magnitude."""
    if n_temps == 1:
        return jnp.ones((1,), dtype)
    return jnp.asarray(
        jnp.logspace(jnp.log10(lambda_min), 0.0, n_temps), dtype
    )


@partial(
    jax.jit,
    static_argnames=("misfit_fn", "n_steps", "n_burn", "n_temps", "adapt", "batched"),
)
def run_pt_pcn(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,  # (G, d) cold-level inits (hot levels start there too)
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    adapt: bool = True,
    batched: bool = False,
) -> PTResult:
    """Parallel-tempered pCN over G chain groups x K temperature levels.

    misfit_fn: the UNtempered data misfit Phi. batched=True marks it as
    operating on a whole (B, d) batch at once (e.g. the fused Pallas FOM
    solver) — internally all K*G states are evaluated as one batch either
    way. Returns cold-level samples only; every level adapts per-chain pCN
    step sizes toward 23.4% acceptance during burn-in, exactly like run_pcn.
    """
    G, d = theta0.shape
    K = n_temps
    dtype = theta0.dtype
    lambdas = geometric_ladder(K, lambda_min, dtype)[:, None]  # (K, 1) over G

    def phi_all(thetas_kg):  # (K, G, d) -> (K, G)
        flat = thetas_kg.reshape(K * G, d)
        phi = misfit_fn(flat) if batched else jax.vmap(misfit_fn)(flat)
        return phi.reshape(K, G)

    theta = jnp.broadcast_to(theta0[None], (K, G, d))
    phi = phi_all(theta)
    log_beta = jnp.full((K, G), jnp.log(jnp.asarray(beta, dtype)), dtype) + phi * 0
    n_accept = (phi * 0).astype(jnp.int32)
    n_swap = jnp.zeros((K - 1,) if K > 1 else (1,), dtype)

    mean, chol = prior.mean, prior.chol

    def step(carry, inp):
        theta, phi, log_beta, n_accept, n_swap = carry
        t, k_t = inp
        k_prop, k_acc, k_swap = jax.random.split(k_t, 3)

        # --- within-level pCN move (one batched misfit for all K*G) --------
        b = jnp.exp(log_beta)[..., None]  # (K, G, 1)
        xi = jax.random.normal(k_prop, theta.shape, dtype) @ chol.T
        prop = mean + jnp.sqrt(1.0 - b**2) * (theta - mean) + b * xi
        phi_prop = phi_all(prop)
        log_alpha = lambdas * (phi - phi_prop)
        u = jax.random.uniform(k_acc, phi.shape, dtype)
        acc = jnp.log(u) < log_alpha
        theta = jnp.where(acc[..., None], prop, theta)
        phi = jnp.where(acc, phi_prop, phi)
        n_accept = n_accept + acc.astype(jnp.int32)
        if adapt:
            eta = jnp.where(t < n_burn, 0.5 / (1.0 + t.astype(dtype)) ** 0.6, 0.0)
            log_beta = jnp.clip(
                log_beta + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT)),
                jnp.log(1e-4),
                jnp.log(0.9999),
            )

        # --- replica exchange between adjacent levels -----------------------
        # Alternating parity: even steps swap pairs (0,1),(2,3),...; odd steps
        # (1,2),(3,4),.... Expressed as a full-K where-shuffle: partner[j] is
        # j+1 for the lower member of an active pair, j-1 for the upper, j
        # otherwise. States move between levels; (lambda, beta) stay attached
        # to the level.
        if K > 1:
            j = jnp.arange(K)
            parity = (t.astype(jnp.int32) % 2).astype(j.dtype)
            is_lower = (j % 2 == parity) & (j + 1 < K)
            partner = jnp.where(is_lower, j + 1, jnp.where((j - 1 >= 0) & ((j - 1) % 2 == parity), j - 1, j))
            lam = lambdas[:, 0]
            # swap acceptance, evaluated on the lower member of each pair:
            # log ratio = (lambda_{j+1} - lambda_j)(Phi_{j+1} - Phi_j) —
            # moving the lower-Phi state to the colder level is favored
            dlam = lam[jnp.minimum(j + 1, K - 1)] - lam[j]  # lambda_{j+1}-lambda_j
            dphi = phi[jnp.minimum(j + 1, K - 1)] - phi[j]  # (K, G)
            log_a = dlam[:, None] * dphi
            u_sw = jax.random.uniform(k_swap, (K, G), dtype)
            acc_lower = (jnp.log(u_sw) < log_a) & is_lower[:, None]  # (K, G)
            # a slot swaps iff it is the lower member of an accepted pair or
            # the partner of one
            do_swap = acc_lower | jnp.roll(acc_lower, 1, axis=0) & (partner < j)[:, None]
            theta = jnp.where(do_swap[..., None], theta[partner], theta)
            phi = jnp.where(do_swap, phi[partner], phi)
            kept = jnp.where(t >= n_burn, 1.0, 0.0).astype(dtype)
            n_swap = n_swap + kept * acc_lower.astype(dtype).mean(axis=1)[:-1]

        out = (theta[-1], phi[-1])  # cold level
        return (theta, phi, log_beta, n_accept, n_swap), out

    # reset acceptance counters after burn-in by running two scans
    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:
        ts = jnp.arange(n_burn, dtype=dtype)
        (theta, phi, log_beta, n_accept, n_swap), _ = jax.lax.scan(
            step, (theta, phi, log_beta, n_accept, n_swap), (ts, jax.random.split(k_burn, n_burn))
        )
        n_accept = n_accept * 0
        n_swap = n_swap * 0

    n_keep = n_steps - n_burn
    ts = jnp.arange(n_burn, n_burn + n_keep, dtype=dtype)
    (theta, phi, log_beta, n_accept, n_swap), (samples, phis) = jax.lax.scan(
        step, (theta, phi, log_beta, n_accept, n_swap), (ts, jax.random.split(k_main, n_keep))
    )

    n_pairs_per_parity = jnp.maximum((K - 1 + 1) // 2, 1)
    return PTResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=n_accept.astype(jnp.float32) / max(n_keep, 1),
        # each adjacent pair is proposed every other step
        swap_rate=n_swap / max(n_keep / 2, 1),
        beta=jnp.exp(log_beta),
        theta=theta,
    )
