"""Preconditioned Crank-Nicolson MCMC (SURVEY.md §3.5, A.5; BASELINE config 5).

The chain step is a pure function ``(state, key) -> state`` with the forward
model inlined, so `scan` over steps x `vmap` over chains compiles the entire
sampler into a single XLA program — the reference pays a Python<->C++ MUQ
boundary crossing *every step*; here there are zero host round-trips.

pCN proposal (prior N(m, C)):   theta' = m + sqrt(1-b^2)(theta - m) + b L xi
acceptance:                     min(1, exp(Phi(theta) - Phi(theta')))
with Phi the data misfit only — the prior cancels exactly, making the kernel
dimension-robust (A.5).

Step-size adaptation: with small observation noise the posterior concentrates
far below the prior scale and any fixed beta either crawls or stalls, so
burn-in runs per-chain Robbins-Monro adaptation of log beta toward a target
acceptance rate (0.234); sampling then freezes the adapted per-chain betas.
Per-chain adaptation is embarrassingly parallel — it needs no cross-chain or
cross-device communication, so the sharded path is identical.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.priors import GaussianPrior

TARGET_ACCEPT = 0.234


class PCNState(NamedTuple):
    theta: jax.Array  # (..., d)
    phi: jax.Array  # (...,) data misfit at theta
    n_accept: jax.Array  # (...,) int32


class PCNResult(NamedTuple):
    state: PCNState
    samples: jax.Array  # (n_kept, n_chains, d)
    phi_trace: jax.Array  # (n_kept, n_chains)
    accept_rate: jax.Array  # (n_chains,)
    beta: jax.Array  # (n_chains,) final (possibly adapted) step sizes


def pcn_init(misfit_fn: Callable, theta0: jax.Array, *, batched: bool = False) -> PCNState:
    """theta0: (n_chains, d) initial states (e.g. prior samples).

    batched=True marks misfit_fn as operating on the whole (n_chains, d)
    batch at once — used to route the FOM likelihood through the fused
    Pallas batch solver instead of a vmapped per-chain solve.

    n_accept is derived from phi0 (not a fresh constant) so it inherits the
    device-varying axis under shard_map (jax vma semantics)."""
    phi0 = misfit_fn(theta0) if batched else jax.vmap(misfit_fn)(theta0)
    return PCNState(theta=theta0, phi=phi0, n_accept=(phi0 * 0).astype(jnp.int32))


def pcn_step(
    misfit_fn: Callable,
    prior: GaussianPrior,
    beta: jax.Array,
    state: PCNState,
    key: jax.Array,
    *,
    batched: bool = False,
) -> tuple[PCNState, jax.Array]:
    """One pCN step for a batch of chains (leading axis of state.theta).

    beta: scalar or per-chain (n_chains,). Returns (state, accept mask)."""
    k_prop, k_acc = jax.random.split(key)
    dtype = state.theta.dtype
    beta = jnp.asarray(beta, dtype)
    b = beta[..., None] if beta.ndim == state.theta.ndim - 1 else beta
    xi = jnp.dot(jax.random.normal(k_prop, state.theta.shape, dtype), prior.chol.T,
                 precision=jax.lax.Precision.HIGHEST)
    mean = prior.mean
    prop = mean + jnp.sqrt(1.0 - b**2) * (state.theta - mean) + b * xi
    phi_prop = misfit_fn(prop) if batched else jax.vmap(misfit_fn)(prop)
    log_alpha = state.phi - phi_prop
    u = jax.random.uniform(k_acc, state.phi.shape, dtype)
    accept = jnp.log(u) < log_alpha
    theta = jnp.where(accept[..., None], prop, state.theta)
    phi = jnp.where(accept, phi_prop, state.phi)
    new = PCNState(theta=theta, phi=phi, n_accept=state.n_accept + accept.astype(jnp.int32))
    return new, accept


@partial(jax.jit, static_argnames=("misfit_fn", "n_steps", "n_burn", "thin", "adapt", "batched"))
def run_pcn(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    thin: int = 1,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
) -> PCNResult:
    """Run pCN chains: scan over steps, vmap over chains, fully on-device.

    theta0: (n_chains, d). Burn-in adapts per-chain beta toward 23.4%
    acceptance (adapt=True), then sampling keeps every ``thin``-th sample.
    batched=True: misfit_fn takes the whole (n_chains, d) batch (e.g. the
    fused Pallas FOM solver). adapt_t0: global step offset for the
    Robbins-Monro schedule — segmented drivers pass their progress so the
    adaptation clock anneals across segments instead of restarting (pass a
    traced array to avoid per-segment recompiles).
    """
    state = pcn_init(misfit_fn, theta0, batched=batched)
    step_fn = partial(pcn_step, batched=batched)
    dtype = theta0.dtype
    # beta may be a scalar or per-chain array (e.g. adapted betas carried
    # across a checkpoint/resume boundary)
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), state.phi.shape)
    log_beta0 = jnp.log(beta_arr) + state.phi * 0

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:
        def burn_body(carry, inp):
            s, lb = carry
            t, k = inp
            s, acc = step_fn(misfit_fn, prior, jnp.exp(lb), s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                lb = lb + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT))
                lb = jnp.clip(lb, jnp.log(1e-4), jnp.log(0.9999))
            return (s, lb), None

        ts = jnp.arange(n_burn, dtype=dtype)
        (state, log_beta), _ = jax.lax.scan(
            burn_body, (state, log_beta0), (ts, jax.random.split(k_burn, n_burn))
        )
        state = state._replace(n_accept=state.n_accept * 0)  # keeps vma axes
    else:
        log_beta = log_beta0

    beta_final = jnp.exp(log_beta)

    def keep_body(s, k):
        s2, _ = step_fn(misfit_fn, prior, beta_final, s, k)
        return s2, (s2.theta, s2.phi)

    def drop_body(s, k):
        s2, _ = step_fn(misfit_fn, prior, beta_final, s, k)
        return s2, None

    n_keep_steps = n_steps - n_burn
    if thin > 1:
        def thin_body(s, ks):
            s, _ = jax.lax.scan(drop_body, s, ks)
            return s, (s.theta, s.phi)

        n_out = n_keep_steps // thin
        keys = jax.random.split(k_main, n_out * thin).reshape(n_out, thin, 2)
        state, (samples, phis) = jax.lax.scan(thin_body, state, keys)
        n_ran = n_out * thin
    else:
        state, (samples, phis) = jax.lax.scan(
            keep_body, state, jax.random.split(k_main, n_keep_steps)
        )
        n_ran = n_keep_steps

    accept_rate = state.n_accept.astype(jnp.float32) / max(n_ran, 1)
    return PCNResult(
        state=state, samples=samples, phi_trace=phis, accept_rate=accept_rate, beta=beta_final
    )


@partial(jax.jit, static_argnames=("misfit_aux_fn", "n_steps", "n_burn", "adapt"))
def run_pcn_aux(
    misfit_aux_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    aux0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    adapt: bool = True,
) -> tuple[PCNResult, jax.Array]:
    """Batched pCN whose likelihood carries per-chain auxiliary state.

    misfit_aux_fn(props (C, d), aux) -> (phi (C,), aux_prop) — e.g. the FOM
    likelihood returning its solution field, which warm-starts the next
    proposal's CG solve (local proposals -> few iterations). aux is selected
    per chain on accept exactly like theta. Returns (PCNResult, final aux).
    """
    dtype = theta0.dtype
    phi0, aux_at0 = misfit_aux_fn(theta0, aux0)
    state = PCNState(theta=theta0, phi=phi0, n_accept=(phi0 * 0).astype(jnp.int32))
    aux = aux_at0
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), state.phi.shape)
    log_beta0 = jnp.log(beta_arr) + state.phi * 0

    def step(s, aux, lb, key_t, t):
        k_prop, k_acc = jax.random.split(key_t)
        b = jnp.exp(lb)[..., None]
        xi = jnp.dot(jax.random.normal(k_prop, s.theta.shape, dtype), prior.chol.T,
                     precision=jax.lax.Precision.HIGHEST)
        prop = prior.mean + jnp.sqrt(1.0 - b**2) * (s.theta - prior.mean) + b * xi
        phi_prop, aux_prop = misfit_aux_fn(prop, aux)
        u = jax.random.uniform(k_acc, s.phi.shape, dtype)
        accept = jnp.log(u) < (s.phi - phi_prop)
        theta = jnp.where(accept[..., None], prop, s.theta)
        phi = jnp.where(accept, phi_prop, s.phi)
        aux = jnp.where(accept.reshape((-1,) + (1,) * (aux.ndim - 1)), aux_prop, aux)
        # count post-burn accepts only, so accept_rate matches run_pcn's
        # post-burn semantics
        counted = accept & (t >= n_burn)
        s = PCNState(theta=theta, phi=phi, n_accept=s.n_accept + counted.astype(jnp.int32))
        if adapt:
            eta = jnp.where(t < n_burn, 0.5 / (1.0 + t.astype(dtype)) ** 0.6, 0.0)
            lb = jnp.clip(
                lb + eta * (accept.astype(dtype) - dtype.type(TARGET_ACCEPT)),
                jnp.log(1e-4), jnp.log(0.9999),
            )
        return s, aux, lb, accept

    def body(carry, inp):
        s, aux, lb = carry
        t, k = inp
        s, aux, lb, _ = step(s, aux, lb, k, t)
        return (s, aux, lb), (s.theta, s.phi)

    ts = jnp.arange(n_steps, dtype=dtype)
    (state, aux, log_beta), (samples, phis) = jax.lax.scan(
        body, (state, aux, log_beta0), (ts, jax.random.split(key, n_steps))
    )
    kept = max(n_steps - n_burn, 0)
    accept_rate = state.n_accept.astype(jnp.float32) / max(kept, 1)
    return (
        PCNResult(
            state=state,
            samples=samples[n_steps - kept:],
            phi_trace=phis[n_steps - kept:],
            accept_rate=accept_rate,
            beta=jnp.exp(log_beta),
        ),
        aux,
    )


def run_pcn_segmented(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    segment: int = 64,
    batched: bool = False,
) -> PCNResult:
    """pCN split into fixed-size segments dispatched from the host
    (watchdog-safe for expensive likelihoods; see infer.segmented). Chain
    state and adapted per-chain betas carry across segments, making the
    result distributionally identical to one long run."""
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = run_pcn(
            misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, thin=1, adapt=True, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype),
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return PCNResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], beta=betas,
    )


def gaussian_misfit(forward: Callable, data: jax.Array, noise_sigma: float) -> Callable:
    """Phi(theta) = ||d - G(theta)||^2 / (2 sigma^2) — the standard likelihood
    potential for all three forward models (FOM / ROM / ROM+NN).

    Reduces over the last axis only, so it works unchanged for a per-theta
    forward ((m,) residual) and for a chain-batched forward ((B, m))."""

    def phi(theta):
        r = forward(theta) - data
        return 0.5 * jnp.sum(r * r, axis=-1) / noise_sigma**2

    return phi


def marginal_misfit(
    forward: Callable, data: jax.Array, *, a0: float, b0: float
) -> Callable:
    """Noise-marginalized likelihood potential: observation noise sigma is
    UNKNOWN and integrated out analytically under the conjugate prior
    sigma^2 ~ InvGamma(a0, b0) (SURVEY.md A.5 likelihood, extended to the
    measured-data regime where sigma is not an input — the reference fixes
    sigma because its scripts only invert synthetic data). With
    S(theta) = ||d - G(theta)||^2,

        p(d | theta) = (2 pi)^(-m/2) * b0^a0 / Gamma(a0)
                       * Gamma(a0 + m/2) / (b0 + S/2)^(a0 + m/2)

    so  Phi(theta) = (a0 + m/2) log(b0 + S/2) + const,  with the constant
    kept exact so tempered/stepping-stone estimates remain the true
    prior-predictive mass (log Bayes factors across forward models on the
    same data and same noise prior are well defined).

    The prior must be PROPER (b0 > 0): the Jeffreys limit a0, b0 -> 0 gives
    an IMPROPER theta posterior whenever the forward model can interpolate
    the data (S -> 0 makes S^(-m/2) non-integrable — on the fin, m = n_obs
    equals the parameter count, so an interpolant generically exists).
    b0 > 0 bounds Phi below by (a0 + m/2) log b0. api.run_inversion uses
    a0 = 2, b0 = noise_sigma^2 — E[sigma^2] equals the configured scale
    with infinite prior variance, i.e. noise_sigma softens from a hard
    assumption into a scale guess.

    Works with every sampler in the package unchanged: MH-family kernels
    use Phi differences, gradient samplers get
    d(Phi)/d(theta) = (a0 + m/2) r^T J / (b0 + S/2) via autodiff. The
    conditional noise posterior stays conjugate,
    sigma^2 | theta, d ~ InvGamma(a0 + m/2, b0 + S/2) (utils/ppc.py
    noise_posterior recovers the marginal). Reduces over the last axis
    only, like gaussian_misfit."""
    import math

    m = data.shape[-1]
    if not (a0 > 0.0 and b0 > 0.0):
        raise ValueError(f"need a proper noise prior: a0 > 0, b0 > 0 (got {a0}, {b0})")
    const = (
        0.5 * m * math.log(2.0 * math.pi)
        - a0 * math.log(b0)
        + math.lgamma(a0)
        - math.lgamma(a0 + 0.5 * m)
    )

    def phi(theta):
        r = forward(theta) - data
        s = jnp.sum(r * r, axis=-1)
        return (a0 + 0.5 * m) * jnp.log(b0 + 0.5 * s) + const

    return phi
