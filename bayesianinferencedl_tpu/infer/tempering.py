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

# Optimal adjacent-pair swap acceptance for parallel tempering under the
# usual diffusion-limit analysis (Atchade/Roberts/Rosenthal 2011) — the
# analog of pCN's 0.234 RWM target, and the set-point the adaptive ladder
# steers every adjacent pair toward.
TARGET_SWAP = 0.234


class PTResult(NamedTuple):
    samples: jax.Array  # (n_kept, G, d) cold-level samples
    phi_trace: jax.Array  # (n_kept, G) cold-level misfits
    accept_rate: jax.Array  # (K, G) within-level post-burn acceptance
    swap_rate: jax.Array  # (K-1,) mean swap acceptance per adjacent pair
    beta: jax.Array  # (K, G) final adapted step sizes
    theta: jax.Array  # (K, G, d) final states (resume support)
    lambdas: jax.Array  # (K, G) final inverse-temperature ladder (resume)
    phi_level_mean: jax.Array  # (K, G) post-burn mean UNtempered misfit per
    # level — the E_lambda[Phi] curve thermodynamic integration needs
    # (infer/evidence.py log_evidence_ti)
    phi2_level_mean: jax.Array  # (K, G) post-burn second moment E[Phi^2] per
    # level: Var_lambda[Phi] = -dE/d lambda is the TI quadrature's
    # derivative correction (and aggregates linearly across segments)
    ss_level_mean: jax.Array  # (K-1, G) post-burn stepping-stone ratios
    # E_{lambda_j}[exp(-(lambda_{j+1}-lambda_j) Phi)] = Z_{j+1}/Z_j — the
    # quadrature-free evidence estimator (infer/evidence.py
    # log_evidence_ss); exact for ANY ladder spacing


def geometric_ladder(n_temps: int, lambda_min: float = 0.05, dtype=jnp.float32) -> jax.Array:
    """Inverse temperatures lambda_1 < ... < lambda_K = 1, geometric spacing —
    the standard choice when Phi spans orders of magnitude."""
    if n_temps == 1:
        return jnp.ones((1,), dtype)
    return jnp.asarray(
        jnp.logspace(jnp.log10(lambda_min), 0.0, n_temps), dtype
    )



def _lam_from_gaps(log_gap: jax.Array) -> jax.Array:
    """Rebuild the (K, G) inverse-temperature ladder from (K-1, G) log-gaps.

    Parametrization: g_j = log(lambda_{j+1}) - log(lambda_j) = exp(log_gap_j)
    > 0 with the cold level pinned at lambda_{K-1} = 1, so ANY real log_gap
    yields a valid strictly-increasing ladder ending at 1 — the
    unconstrained coordinates the stochastic-approximation update lives in
    (the Miasojedow/Moulines/Vihola adaptive-PT parametrization)."""
    g = jnp.exp(log_gap)
    csum = jnp.cumsum(g[::-1], axis=0)[::-1]  # csum[j] = sum_{i>=j} g_i
    return jnp.concatenate([jnp.exp(-csum), jnp.ones_like(csum[:1])], axis=0)


def _ladder_init(ladder, n_temps, lambda_min, G, dtype):
    """(K, G) initial ladder + (K-1, G) log-gaps from either an explicit
    `ladder` override ((K,) or (K, G), e.g. a resume artifact) or the
    geometric default."""
    if ladder is not None:
        lam = jnp.asarray(ladder, dtype)
        lam = jnp.broadcast_to(lam[:, None] if lam.ndim == 1 else lam, (n_temps, G))
    else:
        lam = jnp.broadcast_to(
            geometric_ladder(n_temps, lambda_min, dtype)[:, None], (n_temps, G)
        )
    if n_temps == 1:
        return lam, jnp.zeros((0, G), dtype)
    return lam, jnp.log(jnp.diff(jnp.log(lam), axis=0))


def _ladder_update(log_gap, swap_stats, t, t_global, n_burn, dtype):
    """One stochastic-approximation step on the log-gaps: drive each ACTIVE
    adjacent pair's swap-acceptance probability toward TARGET_SWAP during
    burn-in (frozen afterwards, so post-burn invariance is exact). Too-cold
    a pair (alpha < target) shrinks its gap; too-hot widens it."""
    alpha_lower, active = swap_stats
    eta = jnp.where(t < n_burn, 0.5 / (1.0 + t_global.astype(dtype)) ** 0.6, 0.0)
    upd = active[:-1] * (alpha_lower[:-1] - dtype.type(TARGET_SWAP))
    # gap caps: adjacent-level ratio lambda_{j+1}/lambda_j in [e^1e-4, e^3]
    # (~1x .. ~20x). The upper cap matters: a level pair whose swap
    # acceptance sits above target even as the gap grows (both lambdas ~ 0,
    # a flat-likelihood pair) would otherwise rail its gap to infinity and
    # park the hot level at lambda = 0 exactly.
    return jnp.clip(log_gap + eta * upd, jnp.log(1e-4), jnp.log(3.0))


def _replica_exchange(t, t_global, lambdas, phi_ratio, fields, k_swap, n_burn, n_swap):
    """One alternating-parity adjacent-pair exchange pass (shared by both PT
    samplers). Alternating parity: even GLOBAL steps propose pairs
    (0,1),(2,3),...; odd steps (1,2),(3,4),.... Parity derives from t_global
    (= t + adapt_t0) so segmented runs continue the unsegmented run's
    exchange pattern instead of restarting it each segment — with even
    segment sizes this makes the kept/2 swap-rate normalization exact
    (round-2 advisor finding). t (segment-local) only gates burn-in
    accounting. Expressed as a full-K where-shuffle:
    partner[j] is j+1 for the lower member of an active pair, j-1 for the
    upper, j otherwise. The swap ratio is evaluated on the lower member:
    log ratio = (lambda_{j+1} - lambda_j)(Phi_{j+1} - Phi_j) — moving the
    lower-Phi state to the colder level is favored. States move between
    levels; (lambda, beta) stay attached to the level.

    phi_ratio: (K, G) potentials entering the swap rule (the UNtempered
    misfit each level's target uses — Phi for pt_pcn, Phi_fine for pt_da).
    lambdas: (K, 1) shared ladder or (K, G) per-chain-group ladders.
    fields: tuple of (K, G, ...) arrays to shuffle alongside. Returns
    (shuffled fields, updated post-burn swap counts (K-1,), and the
    lower-member swap-acceptance PROBABILITIES alpha (K, G) masked to the
    active-parity pairs — the low-variance signal the adaptive ladder
    integrates)."""
    dtype = phi_ratio.dtype
    K, G = phi_ratio.shape
    j = jnp.arange(K)
    parity = (t_global.astype(jnp.int32) % 2).astype(j.dtype)
    is_lower = (j % 2 == parity) & (j + 1 < K)
    partner = jnp.where(
        is_lower, j + 1, jnp.where((j - 1 >= 0) & ((j - 1) % 2 == parity), j - 1, j)
    )
    lam = jnp.broadcast_to(lambdas, (K, G))
    dlam = lam[jnp.minimum(j + 1, K - 1)] - lam[j]
    dphi = phi_ratio[jnp.minimum(j + 1, K - 1)] - phi_ratio[j]
    log_a = dlam * dphi
    u_sw = jax.random.uniform(k_swap, (K, G), dtype)
    acc_lower = (jnp.log(u_sw) < log_a) & is_lower[:, None]
    # a slot swaps iff it is the lower member of an accepted pair or the
    # partner of one
    do_swap = acc_lower | jnp.roll(acc_lower, 1, axis=0) & (partner < j)[:, None]

    def shuffle(a):
        m = do_swap.reshape(do_swap.shape + (1,) * (a.ndim - 2))
        return jnp.where(m, a[partner], a)

    fields = tuple(shuffle(a) for a in fields)
    kept = jnp.where(t >= n_burn, 1.0, 0.0).astype(dtype)
    n_swap = n_swap + kept * acc_lower.astype(dtype).mean(axis=1)[:-1]
    alpha_lower = jnp.exp(jnp.minimum(log_a, 0.0)) * is_lower[:, None].astype(dtype)
    return fields, n_swap, (alpha_lower, is_lower[:, None].astype(dtype))


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "n_steps", "n_burn", "n_temps", "adapt", "batched",
        "adapt_ladder",
    ),
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
    adapt_t0=0.0,
    adapt_ladder: bool = False,
    ladder=None,
) -> PTResult:
    """Parallel-tempered pCN over G chain groups x K temperature levels.

    misfit_fn: the UNtempered data misfit Phi. batched=True marks it as
    operating on a whole (B, d) batch at once (e.g. the fused Pallas FOM
    solver) — internally all K*G states are evaluated as one batch either
    way. Returns cold-level samples only; every level adapts per-chain pCN
    step sizes toward 23.4% acceptance during burn-in, exactly like run_pcn.

    adapt_ladder=True additionally tunes the ladder itself during burn-in:
    each chain group's log temperature gaps follow a stochastic
    approximation driving every adjacent pair's swap acceptance toward
    TARGET_SWAP (0.234), with the cold level pinned at lambda = 1. The
    geometric ladder (lambda_min) is then only the starting point — too
    narrow or too wide a hand-chosen ladder self-corrects instead of
    silently under-swapping. Frozen after burn-in (exact invariance).
    ladder: explicit (K,) or (K, G) initial ladder overriding the geometric
    default (resume support: pass PTResult.lambdas back in).
    """
    if theta0.ndim == 2:  # (G, d) cold inits — hot levels start there too
        G, d = theta0.shape
        theta = jnp.broadcast_to(theta0[None], (n_temps, G, d))
    else:  # (K, G, d) per-level resume states (PTResult.theta)
        if theta0.shape[0] != n_temps:
            raise ValueError(
                f"resume states theta0 carry {theta0.shape[0]} temperature "
                f"levels but n_temps={n_temps} — a PT run must be resumed "
                "with the ladder size it was saved with (PTResult.theta is "
                "(n_temps, G, d))"
            )
        _, G, d = theta0.shape
        theta = theta0
    K = n_temps
    dtype = theta0.dtype
    lam0, log_gap0 = _ladder_init(ladder, K, lambda_min, G, dtype)  # (K, G)

    def phi_all(thetas_kg):  # (K, G, d) -> (K, G)
        flat = thetas_kg.reshape(K * G, d)
        phi = misfit_fn(flat) if batched else jax.vmap(misfit_fn)(flat)
        return phi.reshape(K, G)
    phi = phi_all(theta)
    log_beta = jnp.full((K, G), jnp.log(jnp.asarray(beta, dtype)), dtype) + phi * 0
    n_accept = (phi * 0).astype(jnp.int32)
    # derive from phi so the carry stays device-varying under shard_map (vma)
    n_swap = jnp.zeros((max(K - 1, 0),), dtype) + phi.sum() * 0
    log_gap0 = log_gap0 + phi[:1].sum() * 0
    phi_sum = phi * 0

    mean, chol = prior.mean, prior.chol

    def step(carry, inp):
        (theta, phi, log_beta, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
         ss_sum) = carry
        t, k_t = inp
        k_prop, k_acc, k_swap = jax.random.split(k_t, 3)
        lambdas = _lam_from_gaps(log_gap) if adapt_ladder else lam0

        # --- within-level pCN move (one batched misfit for all K*G) --------
        b = jnp.exp(log_beta)[..., None]  # (K, G, 1)
        xi = jnp.dot(jax.random.normal(k_prop, theta.shape, dtype), chol.T,
                     precision=jax.lax.Precision.HIGHEST)
        prop = mean + jnp.sqrt(1.0 - b**2) * (theta - mean) + b * xi
        phi_prop = phi_all(prop)
        log_alpha = lambdas * (phi - phi_prop)
        u = jax.random.uniform(k_acc, phi.shape, dtype)
        acc = jnp.log(u) < log_alpha
        theta = jnp.where(acc[..., None], prop, theta)
        phi = jnp.where(acc, phi_prop, phi)
        n_accept = n_accept + acc.astype(jnp.int32)
        if adapt:
            tg = t.astype(dtype) + jnp.asarray(adapt_t0, dtype)
            eta = jnp.where(t < n_burn, 0.5 / (1.0 + tg) ** 0.6, 0.0)
            log_beta = jnp.clip(
                log_beta + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT)),
                jnp.log(1e-4),
                jnp.log(0.9999),
            )

        # --- replica exchange between adjacent levels (_replica_exchange) --
        if K > 1:
            t_global = t + jnp.asarray(adapt_t0, dtype)
            (theta, phi), n_swap, swap_stats = _replica_exchange(
                t, t_global, lambdas, phi, (theta, phi), k_swap, n_burn, n_swap
            )
            if adapt_ladder:
                log_gap = _ladder_update(log_gap, swap_stats, t, t_global, n_burn, dtype)

        phi_sum = phi_sum + phi  # post-swap: the state the level now owns
        phi2_sum = phi2_sum + phi * phi
        # stepping-stone ratio samples: level j's state scored against the
        # NEXT level's temperature gap (ladder frozen post-burn)
        ss_sum = ss_sum + jnp.exp(-(lambdas[1:] - lambdas[:-1]) * phi[:-1])
        out = (theta[-1], phi[-1])  # cold level
        return (theta, phi, log_beta, log_gap, n_accept, n_swap, phi_sum,
                phi2_sum, ss_sum), out

    # reset acceptance counters after burn-in by running two scans
    k_burn, k_main = jax.random.split(key)
    ss_sum0 = phi[:-1] * 0 if K > 1 else jnp.zeros((0, G), dtype)
    carry = (theta, phi, log_beta, log_gap0, n_accept, n_swap, phi_sum, phi_sum,
             ss_sum0)
    if n_burn > 0:
        ts = jnp.arange(n_burn, dtype=dtype)
        carry, _ = jax.lax.scan(
            step, carry, (ts, jax.random.split(k_burn, n_burn))
        )
        (theta, phi, log_beta, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
         ss_sum) = carry
        carry = (theta, phi, log_beta, log_gap, n_accept * 0, n_swap * 0,
                 phi_sum * 0, phi2_sum * 0, ss_sum * 0)

    n_keep = n_steps - n_burn
    ts = jnp.arange(n_burn, n_burn + n_keep, dtype=dtype)
    carry, (samples, phis) = jax.lax.scan(
        step, carry, (ts, jax.random.split(k_main, n_keep))
    )
    (theta, phi, log_beta, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
     ss_sum) = carry

    return PTResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=n_accept.astype(jnp.float32) / max(n_keep, 1),
        # each adjacent pair is proposed every other step
        swap_rate=n_swap / max(n_keep / 2, 1),
        beta=jnp.exp(log_beta),
        theta=theta,
        lambdas=_lam_from_gaps(log_gap) if adapt_ladder else lam0,
        phi_level_mean=phi_sum / max(n_keep, 1),
        phi2_level_mean=phi2_sum / max(n_keep, 1),
        ss_level_mean=ss_sum / max(n_keep, 1),
    )


class PTMALAResult(NamedTuple):
    samples: jax.Array  # (n_kept, G, d) cold-level samples (WORKING coords)
    phi_trace: jax.Array  # (n_kept, G) cold-level misfits
    accept_rate: jax.Array  # (K, G) within-level post-burn acceptance
    swap_rate: jax.Array  # (K-1,) mean swap acceptance per adjacent pair
    step: jax.Array  # (K, G) final adapted MALA step sizes h
    theta: jax.Array  # (K, G, d) final states, WORKING coords (resume)
    lambdas: jax.Array  # (K, G) final inverse-temperature ladder (resume)
    phi_level_mean: jax.Array  # (K, G) post-burn mean untempered misfit per
    # level (thermodynamic integration; infer/evidence.py)
    phi2_level_mean: jax.Array  # (K, G) post-burn E[Phi^2] per level
    ss_level_mean: jax.Array  # (K-1, G) stepping-stone ratios (evidence)


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "n_steps", "n_burn", "n_temps", "adapt", "batched",
        "adapt_ladder",
    ),
)
def run_pt_mala(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,  # (G, d) cold inits, or (K, G, d) per-level resume
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    adapt_ladder: bool = False,
    ladder=None,
) -> PTMALAResult:
    """Gradient-informed parallel tempering: MALA within-level moves +
    replica exchange (SURVEY.md A.5; composes infer/mala.py with the
    tempering machinery above).

    Why: pt_pcn's cold-level moves are a random walk, so its honest
    bulk-ESS/s is bounded by within-basin diffusion even when swaps handle
    the between-basin moves. Every likelihood here is differentiable end to
    end (matmul/MLP autodiff for rom/rom_nn; exact adjoints through
    ``lax.custom_linear_solve`` for fom), so level j can run drift-clipped
    whitened MALA on its tempered target

        -log pi_j(y) = lambda_j Phi(theta(y)) + 0.5 ||y||^2

    at ~2x the cost of a pCN move (one fused forward+reverse pass for the
    whole (K, G) ladder per step). Swaps are the standard rule on the
    carried UNtempered misfits (prior factors cancel — identical to
    run_pt_pcn), so the cold level samples the exact posterior.

    TPU mapping: per-step work is ONE vjp over the flattened (K*G, d) batch
    plus elementwise updates; the misfit gradient d(Phi)/dy is carried per
    level and swaps with the state (it is a function of y alone — the level
    temperature multiplies it on use), so a swap costs no extra evaluation.

    theta0 in WORKING coordinates (same contract as run_pt_pcn); whitening
    uses the prior frame (the dimension-robust choice on a possibly
    multimodal posterior — a Laplace frame centers on ONE basin). step:
    scalar or (K, G) resume array; every level adapts per-chain log h
    toward 57.4% acceptance during burn-in. adapt_ladder/ladder: burn-in
    ladder tuning toward TARGET_SWAP / explicit initial ladder, exactly as
    in run_pt_pcn.
    """
    from bayesianinferencedl_tpu.infer.mala import (
        TARGET_ACCEPT_MALA, _inv_chol, _tamed,
    )

    if theta0.ndim == 2:
        G, d = theta0.shape
        theta_init = jnp.broadcast_to(theta0[None], (n_temps, G, d))
    else:
        if theta0.shape[0] != n_temps:
            raise ValueError(
                f"resume states theta0 carry {theta0.shape[0]} temperature "
                f"levels but n_temps={n_temps} — a PT run must be resumed "
                "with the ladder size it was saved with (PTMALAResult.theta "
                "is (n_temps, G, d))"
            )
        _, G, d = theta0.shape
        theta_init = theta0
    K = n_temps
    dtype = theta0.dtype
    hi = jax.lax.Precision.HIGHEST
    lam0, log_gap0 = _ladder_init(ladder, K, lambda_min, G, dtype)  # (K, G)
    mean, chol = prior.mean, prior.chol
    Li = _inv_chol(chol)

    def to_theta(Y):
        return mean + jnp.dot(Y, chol.T, precision=hi)

    def phi_and_grad(Y):  # (K, G, d) -> (K, G), (K, G, d) misfit + d(Phi)/dy
        flat = Y.reshape(K * G, d)

        def phi_of_y(yf):
            th = to_theta(yf)
            return misfit_fn(th) if batched else jax.vmap(misfit_fn)(th)

        phi, pullback = jax.vjp(phi_of_y, flat)
        (g,) = pullback(jnp.ones_like(phi))
        return phi.reshape(K, G), g.reshape(K, G, d)

    y = jnp.dot(theta_init - mean, Li.T, precision=hi)
    phi, gphi = phi_and_grad(y)
    log_h = jnp.log(jnp.broadcast_to(jnp.asarray(step, dtype), (K, G))) + phi * 0
    n_accept = (phi * 0).astype(jnp.int32)
    # derive from phi so the carry stays device-varying under shard_map (vma)
    n_swap = jnp.zeros((max(K - 1, 0),), dtype) + phi.sum() * 0
    log_gap0 = log_gap0 + phi[:1].sum() * 0
    phi_sum0 = phi * 0

    def nlp_grad(lam, ph, gph, Y):
        """Tempered negative log posterior and its y-gradient from the
        carried (phi, d(Phi)/dy) — the prior term is analytic in y."""
        nlp = lam * ph + 0.5 * jnp.sum(Y * Y, axis=-1)
        return nlp, lam[..., None] * gph + Y

    def step_fn(carry, inp):
        (y, phi, gphi, log_h, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
         ss_sum) = carry
        t, k_t = inp
        k_prop, k_acc, k_swap = jax.random.split(k_t, 3)
        h = jnp.exp(log_h)  # (K, G)
        hcol = h[..., None]
        lambdas = _lam_from_gaps(log_gap) if adapt_ladder else lam0

        nlp, grad = nlp_grad(lambdas, phi, gphi, y)
        g = _tamed(-grad, h)  # drift-clipped gradient of log pi_j
        xi = jax.random.normal(k_prop, y.shape, dtype)
        prop = y + 0.5 * hcol * g + jnp.sqrt(hcol) * xi

        phi_p, gphi_p = phi_and_grad(prop)
        nlp_p, grad_p = nlp_grad(lambdas, phi_p, gphi_p, prop)
        g_p = _tamed(-grad_p, h)
        fwd = prop - y - 0.5 * hcol * g
        bwd = y - prop - 0.5 * hcol * g_p
        log_q_fwd = -jnp.sum(fwd * fwd, axis=-1) / (2.0 * h)
        log_q_bwd = -jnp.sum(bwd * bwd, axis=-1) / (2.0 * h)
        log_alpha = (nlp - nlp_p) + (log_q_bwd - log_q_fwd)

        u = jax.random.uniform(k_acc, phi.shape, dtype)
        acc = jnp.log(u) < log_alpha
        acol = acc[..., None]
        y = jnp.where(acol, prop, y)
        phi = jnp.where(acc, phi_p, phi)
        gphi = jnp.where(acol, gphi_p, gphi)
        n_accept = n_accept + acc.astype(jnp.int32)
        if adapt:
            tg = t.astype(dtype) + jnp.asarray(adapt_t0, dtype)
            eta = jnp.where(t < n_burn, 0.5 / (1.0 + tg) ** 0.6, 0.0)
            log_h = jnp.clip(
                log_h + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT_MALA)),
                jnp.log(1e-8),
                jnp.log(10.0),
            )

        if K > 1:
            t_global = t + jnp.asarray(adapt_t0, dtype)
            (y, phi, gphi), n_swap, swap_stats = _replica_exchange(
                t, t_global, lambdas, phi, (y, phi, gphi), k_swap, n_burn, n_swap
            )
            if adapt_ladder:
                log_gap = _ladder_update(log_gap, swap_stats, t, t_global, n_burn, dtype)

        phi_sum = phi_sum + phi  # post-swap
        phi2_sum = phi2_sum + phi * phi
        ss_sum = ss_sum + jnp.exp(-(lambdas[1:] - lambdas[:-1]) * phi[:-1])
        out = (to_theta(y[-1]), phi[-1])  # cold level, working coords
        return (y, phi, gphi, log_h, log_gap, n_accept, n_swap, phi_sum,
                phi2_sum, ss_sum), out

    k_burn, k_main = jax.random.split(key)
    ss_sum0 = phi[:-1] * 0 if K > 1 else jnp.zeros((0, G), dtype)
    carry = (y, phi, gphi, log_h, log_gap0, n_accept, n_swap, phi_sum0, phi_sum0,
             ss_sum0)
    if n_burn > 0:
        ts = jnp.arange(n_burn, dtype=dtype)
        carry, _ = jax.lax.scan(step_fn, carry, (ts, jax.random.split(k_burn, n_burn)))
        (y, phi, gphi, log_h, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
         ss_sum) = carry
        carry = (y, phi, gphi, log_h, log_gap, n_accept * 0, n_swap * 0,
                 phi_sum * 0, phi2_sum * 0, ss_sum * 0)

    n_keep = n_steps - n_burn
    ts = jnp.arange(n_burn, n_burn + n_keep, dtype=dtype)
    carry, (samples, phis) = jax.lax.scan(
        step_fn, carry, (ts, jax.random.split(k_main, n_keep))
    )
    (y, phi, gphi, log_h, log_gap, n_accept, n_swap, phi_sum, phi2_sum,
     ss_sum) = carry

    return PTMALAResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=n_accept.astype(jnp.float32) / max(n_keep, 1),
        swap_rate=n_swap / max(n_keep / 2, 1),
        step=jnp.exp(log_h),
        theta=to_theta(y),
        lambdas=_lam_from_gaps(log_gap) if adapt_ladder else lam0,
        phi_level_mean=phi_sum / max(n_keep, 1),
        phi2_level_mean=phi2_sum / max(n_keep, 1),
        ss_level_mean=ss_sum / max(n_keep, 1),
    )


class PTDAResult(NamedTuple):
    samples: jax.Array  # (n_kept, G, d) cold-level samples
    phi_trace: jax.Array  # (n_kept, G) cold-level FINE misfits
    accept_rate: jax.Array  # (K, G) outer (fine-correction) acceptance
    inner_accept_rate: jax.Array  # (K, G) coarse subchain acceptance
    swap_rate: jax.Array  # (K-1,)
    beta: jax.Array  # (K, G) adapted inner step sizes
    theta: jax.Array  # (K, G, d) final states (resume support)
    n_fine_evals: int  # fine-model BATCH evaluations (each covers K*G states)
    lambdas: jax.Array  # (K, G) final inverse-temperature ladder (resume)
    phi_level_mean: jax.Array  # (K, G) post-burn mean FINE misfit per level
    # (thermodynamic integration for the fine model; infer/evidence.py)
    phi2_level_mean: jax.Array  # (K, G) post-burn E[Phi_f^2] per level
    ss_level_mean: jax.Array  # (K-1, G) stepping-stone ratios on Phi_f


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fine", "misfit_coarse", "n_steps", "n_burn", "n_temps",
        "subchain", "adapt", "batched", "inner", "adapt_ladder",
    ),
)
def run_pt_da(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,  # (G, d) cold inits, or (K, G, d) per-level resume
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
    adapt_ladder: bool = False,
    ladder=None,
) -> PTDAResult:
    """Tempered delayed acceptance: the EXACT fine (e.g. full-order)
    posterior on a MULTIMODAL problem, at ~1/subchain of the fine evals.

    Level j targets pi_j ~ exp(-lambda_j Phi_f) mu0. Its within-level move is
    a DA step: `subchain` coarse steps targeting exp(-lambda_j Phi_c) mu0
    (reversible w.r.t. it), then one Metropolis correction with

        log alpha = lambda_j [(Phi_f - Phi_f*) - (Phi_c - Phi_c*)]

    evaluated at the subchain endpoint — exactly pi_j-invariant (same
    composition argument as infer/delayed_acceptance.py, per level). Swaps
    between adjacent levels use the CARRIED fine misfits (the pt_pcn rule
    with Phi = Phi_f), so the cold level samples the exact fine posterior.
    The fine model runs ONCE per outer step as a single (K*G)-batch call —
    on TPU one fused Pallas PCG dispatch for the whole ladder.

    inner: "pcn" (tempered random-walk subchains) or "mala" (tempered
    drift-clipped whitened MALA subchains on nlp_j = lambda_j Phi_c(theta(y))
    + ||y||^2/2 — misfit_coarse must be differentiable; each inner step is
    one fused forward+reverse coarse pass for the whole ladder, and the
    subchain decorrelates like Langevin instead of a random walk; see
    infer/delayed_acceptance.py mala_inner_kernel for the single-level
    measured rationale). beta is then the initial MALA step size h.

    n_steps/n_burn count OUTER steps. beta may be a scalar or a (K, G)
    array (resume support). adapt_ladder/ladder: burn-in ladder tuning
    toward TARGET_SWAP / explicit initial ladder, exactly as in
    run_pt_pcn (the inner subchains and the outer correction both read the
    step's current ladder)."""
    if theta0.ndim == 2:
        G, d = theta0.shape
        theta = jnp.broadcast_to(theta0[None], (n_temps, G, d))
    else:
        if theta0.shape[0] != n_temps:
            raise ValueError(
                f"resume states theta0 carry {theta0.shape[0]} temperature "
                f"levels but n_temps={n_temps} — a PT run must be resumed "
                "with the ladder size it was saved with (PTDAResult.theta is "
                "(n_temps, G, d))"
            )
        _, G, d = theta0.shape
        theta = theta0
    K = n_temps
    dtype = theta.dtype
    lam0, log_gap0 = _ladder_init(ladder, K, lambda_min, G, dtype)  # (K, G)

    def phi_all(fn, thetas_kg):  # (K, G, d) -> (K, G)
        flat = thetas_kg.reshape(K * G, d)
        phi = fn(flat) if batched else jax.vmap(fn)(flat)
        return phi.reshape(K, G)

    phi_f = phi_all(misfit_fine, theta)
    phi_c = phi_all(misfit_coarse, theta)
    log_beta = jnp.log(jnp.broadcast_to(jnp.asarray(beta, dtype), (K, G))) + phi_f * 0
    n_out = (phi_f * 0).astype(jnp.int32)
    n_in = (phi_f * 0).astype(jnp.int32)
    # derive from phi_f so the carry stays device-varying under shard_map (vma)
    n_swap = jnp.zeros((max(K - 1, 0),), dtype) + phi_f.sum() * 0
    log_gap0 = log_gap0 + phi_f[:1].sum() * 0
    phi_sum0 = phi_f * 0
    mean, chol = prior.mean, prior.chol
    hi = jax.lax.Precision.HIGHEST

    if inner == "mala":
        from bayesianinferencedl_tpu.infer.mala import (
            TARGET_ACCEPT_MALA, _inv_chol, _tamed,
        )

        Li = _inv_chol(chol)
        inner_target, lo_clip, hi_clip = TARGET_ACCEPT_MALA, jnp.log(1e-8), jnp.log(10.0)

        def phi_grad_c(Y):  # (K, G, d) -> coarse misfit + d(Phi_c)/dy
            flat = Y.reshape(K * G, d)

            def f(yf):
                th = mean + jnp.dot(yf, chol.T, precision=hi)
                return misfit_coarse(th) if batched else jax.vmap(misfit_coarse)(th)

            phi, pullback = jax.vjp(f, flat)
            (g,) = pullback(jnp.ones_like(phi))
            return phi.reshape(K, G), g.reshape(K, G, d)

    elif inner == "pcn":
        inner_target, lo_clip, hi_clip = TARGET_ACCEPT, jnp.log(1e-4), jnp.log(0.9999)
    else:
        raise ValueError(f"unknown PT-DA inner kernel {inner!r} (use 'pcn' or 'mala')")

    def step(carry, inp):
        (theta, phi_f, phi_c, log_beta, log_gap, ema, n_out, n_in, n_swap,
         phi_sum, phi2_sum, ss_sum) = carry
        t, k_t = inp
        k_sub, k_acc, k_swap = jax.random.split(k_t, 3)
        b = jnp.exp(log_beta)[..., None]  # frozen for this outer step
        lambdas = _lam_from_gaps(log_gap) if adapt_ladder else lam0

        if inner == "mala":
            # --- S tempered drift-clipped MALA steps in whitened coords ----
            # (one fused coarse forward+reverse pass per inner step; each
            # level's target is exp(-lambda_j Phi_c) mu0, i.e.
            # nlp_j(y) = lambda_j Phi_c(theta(y)) + ||y||^2 / 2)
            h = jnp.exp(log_beta)
            hcol = b
            y0 = jnp.dot(theta - mean, Li.T, precision=hi)
            pc0, gpc0 = phi_grad_c(y0)  # recomputed: the vjp needs it anyway

            def inner_step(c, k):
                y, pc, gpc, na = c
                k1, k2 = jax.random.split(k)
                nlp = lambdas * pc + 0.5 * jnp.sum(y * y, axis=-1)
                g = _tamed(-(lambdas[..., None] * gpc + y), h)
                xi = jax.random.normal(k1, y.shape, dtype)
                prop = y + 0.5 * hcol * g + jnp.sqrt(hcol) * xi
                pc_p, gpc_p = phi_grad_c(prop)
                nlp_p = lambdas * pc_p + 0.5 * jnp.sum(prop * prop, axis=-1)
                g_p = _tamed(-(lambdas[..., None] * gpc_p + prop), h)
                fq = prop - y - 0.5 * hcol * g
                bq = y - prop - 0.5 * hcol * g_p
                log_q = (jnp.sum(fq * fq, -1) - jnp.sum(bq * bq, -1)) / (2.0 * h)
                u = jax.random.uniform(k2, pc.shape, dtype)
                acc = jnp.log(u) < (nlp - nlp_p) + log_q
                acol = acc[..., None]
                return (
                    jnp.where(acol, prop, y),
                    jnp.where(acc, pc_p, pc),
                    jnp.where(acol, gpc_p, gpc),
                    na + acc.astype(jnp.int32),
                ), None

            (y_s, pc_s, _, n_in_step), _ = jax.lax.scan(
                inner_step, (y0, pc0, gpc0, n_in * 0), jax.random.split(k_sub, subchain)
            )
            th_s = mean + jnp.dot(y_s, chol.T, precision=hi)
        else:
            # --- inner subchain: S tempered-coarse pCN steps ----------------
            def inner_step(c, k):
                th, pc, na = c
                k1, k2 = jax.random.split(k)
                xi = jnp.dot(jax.random.normal(k1, th.shape, dtype), chol.T,
                             precision=hi)
                prop = mean + jnp.sqrt(1.0 - b**2) * (th - mean) + b * xi
                pc_prop = phi_all(misfit_coarse, prop)
                u = jax.random.uniform(k2, pc.shape, dtype)
                acc = jnp.log(u) < lambdas * (pc - pc_prop)
                th = jnp.where(acc[..., None], prop, th)
                pc = jnp.where(acc, pc_prop, pc)
                return (th, pc, na + acc.astype(jnp.int32)), None

            (th_s, pc_s, n_in_step), _ = jax.lax.scan(
                inner_step, (theta, phi_c, n_in * 0), jax.random.split(k_sub, subchain)
            )

        # --- outer fine correction (one K*G-batch fine evaluation) ----------
        pf_s = phi_all(misfit_fine, th_s)
        log_alpha = lambdas * ((phi_f - pf_s) - (phi_c - pc_s))
        u = jax.random.uniform(k_acc, phi_f.shape, dtype)
        acc = jnp.log(u) < log_alpha
        theta = jnp.where(acc[..., None], th_s, theta)
        phi_f = jnp.where(acc, pf_s, phi_f)
        phi_c = jnp.where(acc, pc_s, phi_c)
        n_out = n_out + acc.astype(jnp.int32)
        n_in = n_in + n_in_step
        if adapt:
            tg = t.astype(dtype) + jnp.asarray(adapt_t0, dtype)
            eta = jnp.where(t < n_burn, 0.5 / (1.0 + tg) ** 0.6, 0.0)
            frac = n_in_step.astype(dtype) / dtype.type(subchain)
            if inner == "mala":
                # inner-rate tuning + outer-collapse penalty: the pCN
                # product rule below cannot reach MALA's 0.574 target when
                # the outer acceptance is under it — it rails h to the
                # floor (see delayed_acceptance.run_da_pcn for the full
                # rationale and the measured failure)
                ema = ema + dtype.type(0.05) * (acc.astype(dtype) - ema)
                drive = (frac - dtype.type(inner_target)) - dtype.type(
                    2.0
                ) * jnp.maximum(dtype.type(0.0), dtype.type(0.25) - ema)
            else:
                # effective acceptance = inner fraction x outer survival
                # (delayed_acceptance.run_da_pcn) — keeps the outer
                # correction alive when the surrogate is biased at cold
                # temperatures
                drive = frac * acc.astype(dtype) - dtype.type(inner_target)
            log_beta = jnp.clip(log_beta + eta * drive, lo_clip, hi_clip)

        # --- replica exchange on the carried fine misfits (_replica_exchange)
        if K > 1:
            t_global = t + jnp.asarray(adapt_t0, dtype)
            (theta, phi_f, phi_c), n_swap, swap_stats = _replica_exchange(
                t, t_global, lambdas, phi_f, (theta, phi_f, phi_c), k_swap, n_burn, n_swap
            )
            if adapt_ladder:
                log_gap = _ladder_update(log_gap, swap_stats, t, t_global, n_burn, dtype)

        phi_sum = phi_sum + phi_f  # post-swap fine misfits
        phi2_sum = phi2_sum + phi_f * phi_f
        ss_sum = ss_sum + jnp.exp(-(lambdas[1:] - lambdas[:-1]) * phi_f[:-1])
        return (theta, phi_f, phi_c, log_beta, log_gap, ema, n_out, n_in,
                n_swap, phi_sum, phi2_sum, ss_sum), (theta[-1], phi_f[-1])

    k_burn, k_main = jax.random.split(key)
    ema0 = phi_f * 0 + dtype.type(0.5)  # outer-acceptance EMA (mala inner)
    ss_sum0 = phi_f[:-1] * 0 if K > 1 else jnp.zeros((0, G), dtype)
    carry = (theta, phi_f, phi_c, log_beta, log_gap0, ema0, n_out, n_in, n_swap,
             phi_sum0, phi_sum0, ss_sum0)
    if n_burn > 0:
        ts = jnp.arange(n_burn, dtype=dtype)
        carry, _ = jax.lax.scan(step, carry, (ts, jax.random.split(k_burn, n_burn)))
        (theta, phi_f, phi_c, log_beta, log_gap, ema, n_out, n_in, n_swap,
         phi_sum, phi2_sum, ss_sum) = carry
        carry = (theta, phi_f, phi_c, log_beta, log_gap, ema, n_out * 0, n_in * 0,
                 n_swap * 0, phi_sum * 0, phi2_sum * 0, ss_sum * 0)

    n_keep = n_steps - n_burn
    ts = jnp.arange(n_burn, n_burn + n_keep, dtype=dtype)
    carry, (samples, phis) = jax.lax.scan(step, carry, (ts, jax.random.split(k_main, n_keep)))
    (theta, phi_f, phi_c, log_beta, log_gap, ema, n_out, n_in, n_swap,
     phi_sum, phi2_sum, ss_sum) = carry

    return PTDAResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=n_out.astype(jnp.float32) / max(n_keep, 1),
        inner_accept_rate=n_in.astype(jnp.float32) / max(n_keep * subchain, 1),
        swap_rate=n_swap / max(n_keep / 2, 1),
        beta=jnp.exp(log_beta),
        theta=theta,
        n_fine_evals=n_steps + 1,
        lambdas=_lam_from_gaps(log_gap) if adapt_ladder else lam0,
        phi_level_mean=phi_sum / max(n_keep, 1),
        phi2_level_mean=phi2_sum / max(n_keep, 1),
        ss_level_mean=ss_sum / max(n_keep, 1),
    )


def run_pt_da_segmented(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    segment: int = 32,
    batched: bool = False,
    inner: str = "pcn",
    adapt_ladder: bool = False,
    ladder=None,
) -> PTDAResult:
    """run_pt_da in fixed-size outer segments (watchdog-safe for expensive
    fine models; infer.segmented); per-level states, adapted betas, and (when
    adapt_ladder) the adapted ladder carry across segments, accept/swap
    accounting covers the whole post-burn run.

    segment must be EVEN: exchange parity runs on the global step clock, so
    even segments propose each adjacent pair exactly kept/2 times per
    segment and the accumulated swap-rate normalization is exact."""
    if segment % 2:
        raise ValueError(f"segment must be even for exact swap accounting, got {segment}")
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments, inner_accept_rate_spec, swap_rate_spec,
    )

    def seg(carry, sub, this, burn, start):
        thetas, betas, lam = carry
        res = run_pt_da(
            misfit_fine, misfit_coarse, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchain=subchain,
            n_temps=n_temps, lambda_min=lambda_min, adapt=True, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype), inner=inner,
            adapt_ladder=adapt_ladder, ladder=lam,
        )
        return res, (res.theta, res.beta, res.lambdas)

    # materialize the initial ladder so every segment shares one jit
    # signature (None -> array between segments would force a recompile)
    ladder0 = ladder if ladder is not None else geometric_ladder(
        n_temps, lambda_min, theta0.dtype
    )
    res, (_, betas, lambdas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, beta, ladder0), key, n_steps=n_steps, n_burn=n_burn, segment=segment,
        rates={
            "accept": accept_rate_spec(),
            "inner": inner_accept_rate_spec(subchain),
            "swap": swap_rate_spec(),
            # post-burn per-level mean misfit: same count/renormalize
            # machinery as the acceptance rates
            "phi_mean": (lambda r: r.phi_level_mean, lambda kept: kept,
                         lambda total: max(total, 1)),
            "phi2_mean": (lambda r: r.phi2_level_mean, lambda kept: kept,
                          lambda total: max(total, 1)),
            "ss_mean": (lambda r: r.ss_level_mean, lambda kept: kept,
                        lambda total: max(total, 1)),
        },
    )
    return PTDAResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        inner_accept_rate=rates["inner"],
        swap_rate=rates["swap"],
        beta=betas,
        theta=res.theta,
        n_fine_evals=n_steps + (n_steps + segment - 1) // segment,
        lambdas=lambdas,
        phi_level_mean=rates["phi_mean"],
        phi2_level_mean=rates["phi2_mean"],
        ss_level_mean=rates["ss_mean"],
    )
