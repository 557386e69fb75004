"""Delayed-acceptance pCN: the EXACT full-order posterior at near-ROM cost.

The three-way experiment (SURVEY.md Appendix C; scripts/three_way_posteriors)
shows the ROM+NN posterior is close to — but not exactly — the FOM posterior.
Delayed acceptance closes that gap without paying a FOM solve per step: run a
SUBCHAIN of S cheap steps targeting the surrogate posterior
pi_c ~ exp(-Phi_c) x prior (pCN random walk by default, or gradient-informed
MALA via inner="mala" — see InnerKernel), then Metropolis-correct the
subchain endpoint against the exact potential Phi_f (Christen & Fox 2005
surrogate-transition form; Liu 2001 §9.4). Because the S-step coarse kernel
Q is reversible w.r.t. pi_c, the outer acceptance ratio collapses to

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


class InnerKernel(NamedTuple):
    """The coarse subchain kernel, abstracted so DA can run pCN or MALA
    inner steps. Exactness only needs the S-step kernel to be reversible
    w.r.t. the coarse posterior pi_c — any MH kernel qualifies.

    init(theta, phi_c) -> inner state (phi_c is the known coarse misfit, so
    pCN pays no extra evaluation; MALA pays one vjp for the initial
    gradient). step(beta, state, key) -> (state, accept mask). theta/phi
    extract the endpoint in working coordinates and its coarse misfit.
    target is the Robbins-Monro acceptance target for the step-size
    adaptation (0.234 random-walk, 0.574 Langevin)."""

    init: Callable
    step: Callable
    theta: Callable
    phi: Callable
    target: float


def pcn_inner_kernel(misfit_coarse: Callable, prior: GaussianPrior, *, batched: bool) -> InnerKernel:
    def init(theta, phi_c):
        return PCNState(theta=theta, phi=phi_c, n_accept=(phi_c * 0).astype(jnp.int32))

    def step(beta, s, k):
        s2, acc = pcn_step(misfit_coarse, prior, beta, s, k, batched=batched)
        return s2, acc

    return InnerKernel(
        init=init, step=step, theta=lambda s: s.theta, phi=lambda s: s.phi,
        target=TARGET_ACCEPT,
    )


def mala_inner_kernel(misfit_coarse: Callable, prior: GaussianPrior, *, batched: bool) -> InnerKernel:
    """Gradient-informed subchains: the coarse misfit must be differentiable
    (api builds it via batched_forward_fn(..., differentiable=True) —
    every solve through lax.custom_linear_solve). The coarse model is
    matmuls+MLP, so its gradient costs ~one extra coarse evaluation per
    inner step — negligible next to the outer FOM correction — while the
    subchain decorrelates like MALA instead of a random walk (3.7-6.3x the
    ESS per step at d=8..64, tests/test_mala.py)."""
    from bayesianinferencedl_tpu.infer.mala import (
        TARGET_ACCEPT_MALA, MALAState, _inv_chol, _make_nlp, mala_step,
    )

    to_theta, eval_fn = _make_nlp(
        misfit_coarse, prior, prior.mean, prior.chol, batched=batched
    )
    Li = _inv_chol(prior.chol)
    hi = jax.lax.Precision.HIGHEST

    def init(theta, phi_c):
        y = jnp.dot(theta - prior.mean, Li.T, precision=hi)
        nlp, phi, grad = eval_fn(y)  # phi_c recomputed: the vjp needs it anyway
        return MALAState(
            y=y, nlp=nlp, phi=phi, grad=grad, n_accept=(nlp * 0).astype(jnp.int32)
        )

    def step(beta, s, k):
        return mala_step(eval_fn, beta, s, k)

    return InnerKernel(
        init=init, step=step, theta=lambda s: to_theta(s.y), phi=lambda s: s.phi,
        target=TARGET_ACCEPT_MALA,
    )


def make_inner_kernel(
    inner: str, misfit_coarse: Callable, prior: GaussianPrior, *, batched: bool
) -> InnerKernel:
    if inner == "pcn":
        return pcn_inner_kernel(misfit_coarse, prior, batched=batched)
    if inner == "mala":
        return mala_inner_kernel(misfit_coarse, prior, batched=batched)
    raise ValueError(f"unknown DA inner kernel {inner!r} (use 'pcn' or 'mala')")


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
    kernel: InnerKernel,
    beta: jax.Array,
    subchain: int,
    state: DAState,
    key: jax.Array,
    *,
    batched_fine: bool = False,
) -> tuple[DAState, jax.Array, jax.Array]:
    """One outer DA step: S coarse kernel steps, then one fine MH correction.

    Returns (state, outer_accept (n_chains,) bool, inner accept count int32).
    """
    k_sub, k_acc = jax.random.split(key)
    inner0 = kernel.init(state.theta, state.phi_c)

    def inner_body(s, k):
        s2, acc = kernel.step(beta, s, k)
        return s2, acc

    inner, accs = jax.lax.scan(inner_body, inner0, jax.random.split(k_sub, subchain))
    # explicit accumulator dtype: under x64 a plain int32 sum promotes to
    # int64 and breaks the outer scan's carry typing
    n_inner = jnp.sum(accs, axis=0, dtype=jnp.int32)
    theta_prop = kernel.theta(inner)
    phi_c_prop = kernel.phi(inner)

    phi_f_prop = (
        misfit_fine(theta_prop) if batched_fine else jax.vmap(misfit_fine)(theta_prop)
    )
    # alpha = exp[(phi_f - phi_f*) - (phi_c - phi_c*)]; if the subchain never
    # moved, both differences are 0 and the step is a (harmless) self-accept.
    log_alpha = (state.phi_f - phi_f_prop) - (state.phi_c - phi_c_prop)
    u = jax.random.uniform(k_acc, state.phi_f.shape, state.phi_f.dtype)
    accept = jnp.log(u) < log_alpha
    new = DAState(
        theta=jnp.where(accept[..., None], theta_prop, state.theta),
        phi_f=jnp.where(accept, phi_f_prop, state.phi_f),
        phi_c=jnp.where(accept, phi_c_prop, state.phi_c),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new, accept, n_inner


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fine", "misfit_coarse", "n_steps", "n_burn", "subchain",
        "adapt", "batched_fine", "batched_coarse", "inner",
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
    inner: str = "pcn",
) -> DAResult:
    """Delayed-acceptance pCN. n_steps/n_burn count OUTER steps (each outer
    step advances `subchain` coarse steps and runs ONE fine batch evaluation).

    theta0: (n_chains, d). During burn-in the inner step size adapts per
    chain toward the kernel's target inner acceptance (23.4% pCN / 57.4%
    MALA); the sampling phase runs the frozen kernel, whose invariant law is
    exactly the fine posterior.

    inner: "pcn" (random-walk subchains) or "mala" (gradient-informed
    subchains — misfit_coarse must be differentiable; the coarse model's
    gradient is ~free next to the outer fine correction, and the subchain
    decorrelates like MALA instead of a random walk, raising ESS per fine
    evaluation — the delayed-acceptance figure of merit)."""
    dtype = theta0.dtype
    kernel = make_inner_kernel(inner, misfit_coarse, prior, batched=batched_coarse)
    state = da_init(
        misfit_fine, misfit_coarse, theta0,
        batched_fine=batched_fine, batched_coarse=batched_coarse,
    )
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), state.phi_f.shape)
    log_beta0 = jnp.log(beta_arr) + state.phi_f * 0
    step = partial(da_step, misfit_fine, kernel, batched_fine=batched_fine)

    # pCN's beta lives in (0, 1) (sqrt(1-b^2)); MALA's h is unconstrained
    # above and may need to sink much lower during far-from-posterior burn-in
    # (the outer veto governs — see the effective-acceptance note below)
    lo_clip = jnp.log(1e-4) if inner == "pcn" else jnp.log(1e-8)
    hi_clip = jnp.log(0.9999) if inner == "pcn" else jnp.log(10.0)

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:

        def burn_body(carry, inp):
            s, lb, ema, n_inner = carry
            t, k = inp
            s, acc_out, acc_inner = step(jnp.exp(lb), subchain, s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                frac = acc_inner.astype(dtype) / dtype.type(subchain)
                if inner == "mala":
                    # Inner-rate tuning + outer-collapse penalty. The pCN
                    # rule below (drive the PRODUCT inner x outer to target)
                    # is unreachable for MALA's 0.574 target whenever the
                    # outer acceptance sits under 0.574 — it rails h to the
                    # floor and the subchain stops moving (measured: inner
                    # acc 0.96, R-hat 2.3 on the tempered fin). Instead tune
                    # the inner rate to its own target and subtract a
                    # penalty only when a running estimate of the outer
                    # acceptance collapses below 0.25 — smaller moves
                    # shrink the subchain's (Phi_f - Phi_c) drift, so the
                    # penalty is self-correcting, and it vanishes in the
                    # healthy regime.
                    ema = ema + dtype.type(0.05) * (acc_out.astype(dtype) - ema)
                    drive = (frac - dtype.type(kernel.target)) - dtype.type(
                        2.0
                    ) * jnp.maximum(dtype.type(0.0), dtype.type(0.25) - ema)
                else:
                    # Robbins-Monro on the EFFECTIVE acceptance: inner
                    # fraction x outer survival. With an accurate surrogate
                    # the outer factor is ~1 and this reduces to the usual
                    # inner-rate tuning; with a biased surrogate it shrinks
                    # the step until the subchain's accumulated
                    # (Phi_f - Phi_c) drift stops killing the outer
                    # correction (the classic DA step-size pathology).
                    drive = frac * acc_out.astype(dtype) - dtype.type(kernel.target)
                lb = jnp.clip(lb + eta * drive, lo_clip, hi_clip)
            return (s, lb, ema, n_inner + acc_inner), None

        ts = jnp.arange(n_burn, dtype=dtype)
        ema0 = state.phi_f * 0 + dtype.type(0.5)
        (state, log_beta, _, _), _ = jax.lax.scan(
            burn_body, (state, log_beta0, ema0, state.n_accept * 0),
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
    inner: str = "pcn",
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
            adapt_t0=jnp.asarray(start, theta0.dtype), inner=inner,
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
