"""Adaptive tempered Sequential Monte Carlo (annealed importance sampling
with resampling and pCN mutations).

SMC is the natively-batched Bayesian sampler: a population of N particles
moves through the SAME tempered path the PT samplers simulate,

    pi_lambda(theta) ∝ exp(-lambda Phi(theta)) mu0(theta),  0 = l_0 < ... = 1,

but by reweighting/resampling instead of per-level chains — every operation
is an O(N) vectorized array op (weight update, cumsum resampling, batched
pCN mutation sweep), so one `lax.while_loop` over stages compiles the whole
sampler into a single XLA program with zero host round-trips. Three things
fall out that MCMC has to work for:

- the temperature schedule is FREE: each stage picks the largest step
  d-lambda whose incremental weights keep a target ESS fraction (bisection
  on-device) — no ladder to tune, no adapt_ladder burn-in;
- the normalizing constant is UNBIASED: log Z accumulates the stage
  logsumexp increments, giving an estimator of the model evidence that is
  INDEPENDENT of infer/evidence.py's stepping-stone-over-PT path (the two
  cross-validate each other — tests/test_smc.py);
- multimodality needs no mode-hopping kernel: mass splits between basins by
  resampling weight, not by chains tunneling (the failure mode pCN has and
  PT repairs).

Where PT still wins: per-sample posterior exploration throughput when you
want many correlated draws (SMC's terminal population is one weighted
sample of size N). The production posterior machinery stays pt_pcn/pt_da;
SMC is the evidence instrument and the schedule-free cross-check.

TPU mapping: particles ride the batch axis exactly like chains
(`vmap`/fused-batch misfits, SURVEY.md §2c); systematic resampling is a
cumsum + searchsorted + gather (no scatter); the stage loop is a
`lax.while_loop` with a static bound so shapes stay fixed. Multi-chip: see
parallel/sharding.sharded_smc (island SMC — per-device populations,
psum-averaged evidence).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from bayesianinferencedl_tpu.infer.pcn import TARGET_ACCEPT
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class SMCResult(NamedTuple):
    particles: jax.Array  # (N, d) final EQUALLY-WEIGHTED particles (resampled at lambda=1)
    phi: jax.Array  # (N,) misfits at the final particles
    log_evidence: jax.Array  # scalar: unbiased-in-Z log E_mu0[exp(-Phi)]
    n_stages: jax.Array  # scalar int32: tempering stages actually used
    lambdas: jax.Array  # (max_stages,) schedule, padded with 1.0 past n_stages
    ess_frac: jax.Array  # (max_stages,) pre-resampling ESS/N per stage, padded 0
    accept_rate: jax.Array  # (max_stages,) mutation acceptance per stage, padded 0
    beta: jax.Array  # scalar: final adapted pCN mutation step size


def _systematic_resample(key: jax.Array, log_w: jax.Array) -> jax.Array:
    """Systematic resampling: (N,) normalized-ish log weights -> (N,) int32
    parent indices. One uniform draw, stratified positions, inverse-CDF by
    searchsorted — sort-free, scatter-free, O(N log N) on device."""
    N = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    pos = (u + jnp.arange(N, dtype=w.dtype)) / N
    idx = jnp.searchsorted(cdf, pos, side="left")
    return jnp.clip(idx, 0, N - 1).astype(jnp.int32)


def _ess_frac(log_inc: jax.Array) -> jax.Array:
    """ESS fraction of incremental weights: 1/(N sum w_i^2) with w normalized."""
    N = log_inc.shape[0]
    lw = log_inc - jax.scipy.special.logsumexp(log_inc)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw)) / N


def _next_lambda(lam: jax.Array, phi: jax.Array, target: float, *, iters: int = 32) -> jax.Array:
    """Largest lambda' in (lam, 1] whose incremental weights -(l'-l)Phi keep
    ESS/N >= target, by bisection (monotone in l'). Fixed iteration count —
    compiler-friendly, exact to ~2^-iters of the bracket."""
    dtype = phi.dtype

    def frac_at(lp):
        return _ess_frac(-(lp - lam) * phi)

    # if even the full jump keeps the target, take it (finishes the run).
    # Both carries derive from lam (varying under shard_map) so the fori_loop
    # carry vma stays consistent on island runs (parallel/sharding.py rules).
    lo = lam * jnp.ones((), dtype)
    hi = jnp.ones((), dtype) + lam * 0

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        ok = frac_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(frac_at(jnp.ones((), dtype)) >= target, jnp.ones((), dtype), lo)


@partial(
    jax.jit,
    static_argnames=("misfit_fn", "n_particles", "n_mutations", "max_stages", "batched"),
)
def run_smc(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_particles: int = 4096,
    n_mutations: int = 5,
    ess_target: float = 0.5,
    beta: float = 0.5,
    max_stages: int = 64,
    batched: bool = False,
    theta0: jax.Array | None = None,
) -> SMCResult:
    """Adaptive tempered SMC from the prior to the posterior.

    misfit_fn: UNtempered data misfit Phi on working coordinates, like every
    other sampler here (batched=True: takes the whole (N, d) batch — the
    fused Pallas FOM route). ess_target: ESS/N kept by each tempering step
    (0.5 is the standard robust choice). n_mutations: pCN sweeps after each
    resampling; the mutation beta adapts toward 23.4% acceptance across
    stages (population-level Robbins-Monro — particles are exchangeable
    after resampling, so a per-particle beta has nothing to attach to).
    max_stages: static bound on tempering stages (the adaptive schedule on
    the fin uses ~10-20 at ess_target=0.5; hitting the bound leaves
    lambda < 1 — check n_stages < max_stages, asserted in tests).

    theta0: optional (N, d) initial particles (defaults to prior draws —
    pass the prior's own samples unless you know better).

    Returns SMCResult; `log_evidence` estimates log Z = log E_mu0[exp(-Phi)]
    — the same quantity infer/evidence.py estimates from a PT run, by a
    completely independent route (AIS/SMC identity: Z = prod_t (sum_i
    w_i^(t) inc_i^(t))). The returned particles are an equally-weighted
    posterior sample (final resampling folds the terminal weights in).
    """
    eval_phi = misfit_fn if batched else jax.vmap(misfit_fn)
    k_init, k_loop = jax.random.split(key)
    theta = prior.sample(k_init, (n_particles,)) if theta0 is None else theta0
    dtype = theta.dtype
    phi = eval_phi(theta)

    def mutate(theta, phi, lam, b, k):
        """n_mutations pCN sweeps targeting pi_lam; returns mean acceptance."""

        def one(c, kk):
            theta, phi, acc = c
            k_prop, k_acc = jax.random.split(kk)
            z = jax.random.normal(k_prop, theta.shape, dtype)
            xi = jnp.dot(z, prior.chol.T, precision=lax.Precision.HIGHEST)
            prop = prior.mean + jnp.sqrt(1.0 - b**2) * (theta - prior.mean) + b * xi
            phi_p = eval_phi(prop)
            log_alpha = lam * (phi - phi_p)
            u = jax.random.uniform(k_acc, phi.shape, dtype)
            ok = jnp.log(u) < log_alpha
            theta = jnp.where(ok[:, None], prop, theta)
            phi = jnp.where(ok, phi_p, phi)
            return (theta, phi, acc + jnp.mean(ok.astype(dtype))), None

        (theta, phi, acc), _ = lax.scan(
            one, (theta, phi, jnp.sum(phi) * 0), jax.random.split(k, n_mutations)
        )
        return theta, phi, acc / n_mutations

    def cond(c):
        t, lam, *_ = c
        return jnp.logical_and(t < max_stages, lam < 1.0)

    def body(c):
        t, lam, theta, phi, logz, b, key, lams, esss, accs = c
        key, k_res, k_mut = jax.random.split(key, 3)
        lam_new = _next_lambda(lam, phi, ess_target)
        log_inc = -(lam_new - lam) * phi
        # unbiased evidence increment: log mean of incremental weights
        # (weights are equal after the previous stage's resampling)
        logz = logz + jax.scipy.special.logsumexp(log_inc) - jnp.log(
            jnp.asarray(n_particles, dtype)
        )
        ess = _ess_frac(log_inc)
        parents = _systematic_resample(k_res, log_inc)
        theta, phi = theta[parents], phi[parents]
        theta, phi, acc = mutate(theta, phi, lam_new, b, k_mut)
        # population Robbins-Monro on log beta toward the pCN target rate;
        # clip to (0, 1) via the log parameterization + hard cap
        eta = jnp.asarray(0.5, dtype) / jnp.sqrt(1.0 + t.astype(dtype))
        b = jnp.clip(b * jnp.exp(eta * (acc - TARGET_ACCEPT)), 1e-4, 0.9999)
        lams = lams.at[t].set(lam_new)
        esss = esss.at[t].set(ess)
        accs = accs.at[t].set(acc)
        return t + 1, lam_new, theta, phi, logz, b, key, lams, esss, accs

    # derive every loop-carry constant from a varying value (phi) so the
    # carry's vma is consistent under shard_map (parallel/sharding.py
    # convention; sharded_smc runs this whole function per island)
    zero = jnp.sum(phi) * 0
    t0 = zero.astype(jnp.int32)
    lam0 = zero
    logz0 = zero
    b0 = jnp.asarray(beta, dtype) + zero
    pads = (
        jnp.ones((max_stages,), dtype) + zero,  # lambda pads at 1 (reached target)
        jnp.zeros((max_stages,), dtype) + zero,
        jnp.zeros((max_stages,), dtype) + zero,
    )
    t, lam, theta, phi, logz, b, _, lams, esss, accs = lax.while_loop(
        cond, body, (t0, lam0, theta, phi, logz0, b0, k_loop, *pads)
    )
    return SMCResult(
        particles=theta,
        phi=phi,
        log_evidence=logz,
        n_stages=t,
        lambdas=lams,
        ess_frac=esss,
        accept_rate=accs,
        beta=b,
    )
