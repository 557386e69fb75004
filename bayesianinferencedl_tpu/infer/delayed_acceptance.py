"""Delayed-acceptance pCN: the EXACT full-order posterior at near-ROM cost.

The three-way experiment (SURVEY.md Appendix C; scripts/three_way_posteriors)
shows the ROM+NN posterior is close to — but not exactly — the FOM posterior.
Delayed acceptance closes that gap without paying a FOM solve per step: run a
SUBCHAIN of S cheap pCN steps targeting the surrogate posterior
pi_c ~ exp(-Phi_c) x prior, then Metropolis-correct the subchain endpoint
against the exact potential Phi_f (Christen & Fox 2005 surrogate-transition
form; Liu 2001 §9.4). Because the S-step coarse kernel Q is reversible w.r.t.
pi_c, the outer acceptance ratio collapses to

    alpha = min{1, exp[(Phi_f(t) - Phi_f(t*)) - (Phi_c(t) - Phi_c(t*))]}

(prior terms cancel — both targets share it), and the stationary law is
EXACTLY pi_f ~ exp(-Phi_f) x prior for ANY subchain length S. When the
surrogate is accurate, Phi_f - Phi_c is nearly constant along the chain, the
outer acceptance sits near 1, and the sampler advances S steps per FOM
evaluation — on TPU the FOM evaluation is ONE batched Pallas PCG call for all
chains, so the whole outer step stays a single fused device program.

TPU shape (SURVEY.md §2c): scan over outer steps x inner scan over the
subchain x vmap over chains; zero host round-trips. Inner step sizes adapt
per-chain (Robbins-Monro) during burn-in only, so the sampling-phase kernel
is homogeneous and the exactness argument applies to the kept samples.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.pcn import TARGET_ACCEPT, PCNState, pcn_step
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class DAState(NamedTuple):
    theta: jax.Array  # (n_chains, d)
    phi_f: jax.Array  # (n_chains,) fine (exact) misfit at theta
    phi_c: jax.Array  # (n_chains,) coarse (surrogate) misfit at theta
    n_accept: jax.Array  # (n_chains,) int32 outer accepts


class DAResult(NamedTuple):
    state: DAState
    samples: jax.Array  # (n_kept, n_chains, d) — one per OUTER step
    phi_trace: jax.Array  # (n_kept, n_chains) fine misfits
    accept_rate: jax.Array  # (n_chains,) outer (fine-correction) accept rate
    inner_accept_rate: jax.Array  # (n_chains,) coarse subchain accept rate
    beta: jax.Array  # (n_chains,) final adapted inner step sizes
    n_fine_evals: int  # fine-model batch evaluations actually run


def da_init(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    theta0: jax.Array,
    *,
    batched_fine: bool = False,
    batched_coarse: bool = False,
) -> DAState:
    phi_f = misfit_fine(theta0) if batched_fine else jax.vmap(misfit_fine)(theta0)
    phi_c = misfit_coarse(theta0) if batched_coarse else jax.vmap(misfit_coarse)(theta0)
    return DAState(
        theta=theta0, phi_f=phi_f, phi_c=phi_c, n_accept=(phi_f * 0).astype(jnp.int32)
    )


def da_step(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    beta: jax.Array,
    subchain: int,
    state: DAState,
    key: jax.Array,
    *,
    batched_fine: bool = False,
    batched_coarse: bool = False,
) -> tuple[DAState, jax.Array, jax.Array]:
    """One outer DA step: S coarse pCN steps, then one fine MH correction.

    Returns (state, outer_accept (n_chains,) bool, inner accept count int32).
    """
    k_sub, k_acc = jax.random.split(key)
    inner0 = PCNState(
        theta=state.theta, phi=state.phi_c, n_accept=(state.phi_c * 0).astype(jnp.int32)
    )

    def inner_body(s, k):
        s2, _ = pcn_step(misfit_coarse, prior, beta, s, k, batched=batched_coarse)
        return s2, None

    inner, _ = jax.lax.scan(inner_body, inner0, jax.random.split(k_sub, subchain))

    phi_f_prop = (
        misfit_fine(inner.theta) if batched_fine else jax.vmap(misfit_fine)(inner.theta)
    )
    # alpha = exp[(phi_f - phi_f*) - (phi_c - phi_c*)]; if the subchain never
    # moved, both differences are 0 and the step is a (harmless) self-accept.
    log_alpha = (state.phi_f - phi_f_prop) - (state.phi_c - inner.phi)
    u = jax.random.uniform(k_acc, state.phi_f.shape, state.phi_f.dtype)
    accept = jnp.log(u) < log_alpha
    new = DAState(
        theta=jnp.where(accept[..., None], inner.theta, state.theta),
        phi_f=jnp.where(accept, phi_f_prop, state.phi_f),
        phi_c=jnp.where(accept, inner.phi, state.phi_c),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new, accept, inner.n_accept


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fine", "misfit_coarse", "n_steps", "n_burn", "subchain",
        "adapt", "batched_fine", "batched_coarse",
    ),
)
def run_da_pcn(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    subchain: int = 8,
    adapt: bool = True,
    batched_fine: bool = False,
    batched_coarse: bool = False,
    adapt_t0=0.0,
) -> DAResult:
    """Delayed-acceptance pCN. n_steps/n_burn count OUTER steps (each outer
    step advances `subchain` coarse steps and runs ONE fine batch evaluation).

    theta0: (n_chains, d). During burn-in the inner step size adapts per
    chain toward 23.4% inner acceptance; the sampling phase runs the frozen
    kernel, whose invariant law is exactly the fine posterior.
    """
    dtype = theta0.dtype
    state = da_init(
        misfit_fine, misfit_coarse, theta0,
        batched_fine=batched_fine, batched_coarse=batched_coarse,
    )
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), state.phi_f.shape)
    log_beta0 = jnp.log(beta_arr) + state.phi_f * 0
    step = partial(
        da_step, misfit_fine, misfit_coarse, prior,
        batched_fine=batched_fine, batched_coarse=batched_coarse,
    )

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:

        def burn_body(carry, inp):
            s, lb, n_inner = carry
            t, k = inp
            s, acc_out, acc_inner = step(jnp.exp(lb), subchain, s, k)
            if adapt:
                # Robbins-Monro on the EFFECTIVE acceptance: inner fraction x
                # outer survival. With an accurate surrogate the outer factor
                # is ~1 and this reduces to the usual inner-rate tuning; with
                # a biased surrogate it shrinks the step until the subchain's
                # accumulated (Phi_f - Phi_c) drift stops killing the outer
                # correction (the classic DA step-size pathology).
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                frac = acc_inner.astype(dtype) / dtype.type(subchain)
                frac = frac * acc_out.astype(dtype)
                lb = lb + eta * (frac - dtype.type(TARGET_ACCEPT))
                lb = jnp.clip(lb, jnp.log(1e-4), jnp.log(0.9999))
            return (s, lb, n_inner + acc_inner), None

        ts = jnp.arange(n_burn, dtype=dtype)
        (state, log_beta, _), _ = jax.lax.scan(
            burn_body, (state, log_beta0, state.n_accept * 0),
            (ts, jax.random.split(k_burn, n_burn)),
        )
        state = state._replace(n_accept=state.n_accept * 0)
    else:
        log_beta = log_beta0

    beta_final = jnp.exp(log_beta)

    def body(carry, k):
        s, n_inner = carry
        s, _, acc_inner = step(beta_final, subchain, s, k)
        return (s, n_inner + acc_inner), (s.theta, s.phi_f)

    n_keep = n_steps - n_burn
    (state, n_inner), (samples, phis) = jax.lax.scan(
        body, (state, state.n_accept * 0), jax.random.split(k_main, n_keep)
    )
    return DAResult(
        state=state,
        samples=samples,
        phi_trace=phis,
        accept_rate=state.n_accept.astype(jnp.float32) / max(n_keep, 1),
        inner_accept_rate=n_inner.astype(jnp.float32) / max(n_keep * subchain, 1),
        beta=beta_final,
        n_fine_evals=n_steps + 1,
    )


def run_da_pcn_segmented(
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    subchain: int = 8,
    segment: int = 64,
    batched_fine: bool = False,
    batched_coarse: bool = False,
) -> DAResult:
    """DA-pCN in fixed-size outer segments (watchdog-safe; infer.segmented).
    Chain state and adapted betas carry across segments; accept accounting
    covers the whole post-burn run."""
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments, inner_accept_rate_spec,
    )

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = run_da_pcn(
            misfit_fine, misfit_coarse, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchain=subchain,
            adapt=True, batched_fine=batched_fine, batched_coarse=batched_coarse,
            adapt_t0=jnp.asarray(start, theta0.dtype),
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn, segment=segment,
        rates={"accept": accept_rate_spec(), "inner": inner_accept_rate_spec(subchain)},
    )
    return DAResult(
        state=res.state,
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        inner_accept_rate=rates["inner"],
        beta=betas,
        n_fine_evals=n_steps + (n_steps + segment - 1) // segment,
    )
