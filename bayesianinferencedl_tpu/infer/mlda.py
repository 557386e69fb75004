"""Multilevel delayed acceptance (MLDA): a recursive surrogate ladder.

Plain delayed acceptance (infer/delayed_acceptance.py) screens proposals
through ONE surrogate before paying the exact model. When a model hierarchy
has more than one useful fidelity rung — here rom_nn (matmuls+MLP) ->
coarse-resolution FOM (cheap Pallas PCG) -> fine-resolution FOM — a single
screen wastes the middle rung: either the subchain is cheap but loosely
matched to the target (rom_nn vs fine FOM), or well matched but expensive
(coarse FOM per inner step). MLDA (Dodwell et al. 2015/2019; Lykkegaard et
al. 2023 "Multilevel delayed acceptance MCMC") nests the screens: each level
l proposes via S_l steps of the level-(l-1) MLDA kernel and Metropolis-
corrects with

    alpha_l = min{1, exp[(Phi_l(t) - Phi_l(t*)) - (Phi_{l-1}(t) - Phi_{l-1}(t*))]}

— the same collapsed Christen-Fox ratio as DA, applied recursively.

Exactness: an MH kernel is reversible w.r.t. its invariant law, and the
S-fold composition K^S of one reversible kernel K is again reversible
(detailed balance applied S times), so by induction every level-l kernel is
a valid MH kernel with invariant law EXACTLY pi_l ~ exp(-Phi_l) x prior;
the top level targets the exact fine posterior for ANY subchain lengths.
Level transfer is trivial on this problem: theta (the 5-vector / RFF
coefficients) is resolution-independent, so no prolongation/restriction
operators are needed — "coarse" means a coarser PDE mesh, not a coarser
parameter.

TPU shape (SURVEY.md §2c): the whole ladder is nested lax.scans x vmap over
chains — one XLA program per segment, zero host round-trips. Per outer step
the fine FOM is ONE batched Pallas PCG call; the coarse FOM runs S_top
batched calls on a mesh with ~4x fewer dof per halving; rom_nn runs
S_top*S_1 fused matmul passes. Step-size adaptation (base-level pCN beta)
runs per chain during burn-in only, driving the PRODUCT of per-level
acceptance fractions — the probability a base move survives every
correction — toward the base kernel's target, the multilevel analog of the
DA effective-acceptance rule.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.delayed_acceptance import (
    InnerKernel,
    make_inner_kernel,
)
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class MLKernel(NamedTuple):
    """A level of the MLDA ladder, usable as the subchain kernel of the
    level above. Same protocol as InnerKernel plus per-level rate
    introspection (`rates`) and stack depth.

    rates(state) -> (depth, n_chains): acceptance fractions observed during
    the state's last step, base level first (row 0 = base pCN/MALA accept
    fraction averaged through the nesting, last row = this level's own
    accept indicator). The product over rows estimates the probability that
    a base-level move survives every correction — the adaptation drive."""

    init: Callable  # (theta, phi_this) -> state
    step: Callable  # (beta, state, key) -> (state, accept mask)
    theta: Callable  # state -> (n_chains, d)
    phi: Callable  # state -> (n_chains,) this level's misfit
    rates: Callable  # state -> (depth, n_chains)
    depth: int
    target: float  # base kernel's acceptance target (for adaptation)


class _BaseState(NamedTuple):
    inner: Any  # wrapped InnerKernel state (PCNState / MALAState)
    acc: jax.Array  # (n_chains,) last-step accept as float


def wrap_base(kernel: InnerKernel) -> MLKernel:
    """Lift a DA InnerKernel (pcn/mala) into the MLKernel protocol."""

    def init(theta, phi):
        s = kernel.init(theta, phi)
        return _BaseState(inner=s, acc=phi * 0)

    def step(beta, s, k):
        s2, acc = kernel.step(beta, s.inner, k)
        return _BaseState(inner=s2, acc=acc.astype(s.acc.dtype)), acc

    return MLKernel(
        init=init,
        step=step,
        theta=lambda s: kernel.theta(s.inner),
        phi=lambda s: kernel.phi(s.inner),
        rates=lambda s: s.acc[None],
        depth=1,
        target=kernel.target,
    )


class LevelState(NamedTuple):
    theta: jax.Array  # (n_chains, d)
    phi: jax.Array  # (n_chains,) this level's misfit at theta
    phi_sub: jax.Array  # (n_chains,) level-below misfit at theta
    rate_stack: jax.Array  # (depth, n_chains) last-step per-level fractions


def level_kernel(
    eval_this: Callable,
    eval_sub: Callable,
    sub: MLKernel,
    subchain: int,
) -> MLKernel:
    """One DA rung: S=subchain steps of `sub` (targeting pi_sub), corrected
    against `eval_this`. eval_* are BATCH misfit evaluators
    (n_chains, d) -> (n_chains,)."""

    def init(theta, phi_this):
        phi_sub = eval_sub(theta)
        # derived from phi (not a fresh constant) so it inherits the
        # device-varying axis under shard_map (jax vma semantics)
        rate0 = jnp.repeat((phi_this * 0)[None], sub.depth + 1, axis=0)
        return LevelState(
            theta=theta, phi=phi_this, phi_sub=phi_sub, rate_stack=rate0
        )

    def step(beta, s, k):
        k_sub, k_acc = jax.random.split(k)
        sub0 = sub.init(s.theta, s.phi_sub)

        def body(st, kk):
            st2, acc = sub.step(beta, st, kk)
            return st2, (acc, sub.rates(st2))

        subN, (accs, rstacks) = jax.lax.scan(
            body, sub0, jax.random.split(k_sub, subchain)
        )
        theta_p = sub.theta(subN)
        phi_sub_p = sub.phi(subN)
        phi_p = eval_this(theta_p)
        # collapsed Christen-Fox ratio; a frozen subchain gives log_alpha=0
        # (harmless self-accept), exactly as in da_step.
        log_alpha = (s.phi - phi_p) - (s.phi_sub - phi_sub_p)
        u = jax.random.uniform(k_acc, s.phi.shape, s.phi.dtype)
        accept = jnp.log(u) < log_alpha
        rate_stack = jnp.concatenate(
            [jnp.mean(rstacks, axis=0), accept.astype(s.phi.dtype)[None]], axis=0
        )
        new = LevelState(
            theta=jnp.where(accept[..., None], theta_p, s.theta),
            phi=jnp.where(accept, phi_p, s.phi),
            phi_sub=jnp.where(accept, phi_sub_p, s.phi_sub),
            rate_stack=rate_stack,
        )
        return new, accept

    return MLKernel(
        init=init,
        step=step,
        theta=lambda s: s.theta,
        phi=lambda s: s.phi,
        rates=lambda s: s.rate_stack,
        depth=sub.depth + 1,
        target=sub.target,
    )


def build_mlda_kernel(
    misfits: Sequence[Callable],
    prior: GaussianPrior,
    subchains: Sequence[int],
    *,
    inner: str = "pcn",
    batched: bool = False,
) -> MLKernel:
    """misfits: cheapest -> finest (length L+1); subchains: length L, entry
    l is the number of level-l kernel steps per level-(l+1) proposal."""
    if len(misfits) < 2:
        raise ValueError("MLDA needs at least 2 misfit levels (use run_pcn for 1)")
    if len(subchains) != len(misfits) - 1:
        raise ValueError(
            f"need {len(misfits) - 1} subchain lengths for {len(misfits)} levels, "
            f"got {len(subchains)}"
        )
    ev = (lambda m: m) if batched else (lambda m: jax.vmap(m))
    kernel = wrap_base(make_inner_kernel(inner, misfits[0], prior, batched=batched))
    for lvl in range(1, len(misfits)):
        kernel = level_kernel(
            ev(misfits[lvl]), ev(misfits[lvl - 1]), kernel, subchains[lvl - 1]
        )
    return kernel


def mlda_evals_per_step(subchains: Sequence[int]) -> tuple[int, ...]:
    """Batch evaluations of each misfit level per TOP-level step, cheapest
    first (pCN base; a MALA base pays one extra base eval per level-1
    re-init). Level l's misfit is evaluated prod(subchains[l:]) times as
    base steps / corrections, plus prod(subchains[l+2:]) times inside
    level-(l+1) kernel re-inits (called once per level-(l+2) step)."""
    L = len(subchains)

    def prod(xs):
        p = 1
        for s in xs:
            p *= s
        return p

    return tuple(
        prod(subchains[lvl:]) + (prod(subchains[lvl + 2 :]) if lvl <= L - 2 else 0)
        for lvl in range(L + 1)
    )


class MLDAResult(NamedTuple):
    state: LevelState
    samples: jax.Array  # (n_kept, n_chains, d) — one per TOP step
    phi_trace: jax.Array  # (n_kept, n_chains) finest misfits
    accept_rate: jax.Array  # (n_chains,) top-level accept rate
    level_rates: jax.Array  # (n_levels, n_chains) mean per-level fractions, base first
    beta: jax.Array  # (n_chains,) final adapted base step sizes
    evals_per_step: tuple  # batch evals of each level per top step, cheapest first


@partial(
    jax.jit,
    static_argnames=(
        "misfits", "n_steps", "n_burn", "subchains", "adapt", "batched", "inner",
    ),
)
def _run_mlda_jit(
    misfits: tuple,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    subchains: tuple = (8, 4),
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
) -> MLDAResult:
    """Multilevel DA. n_steps/n_burn count TOP-level steps; each advances
    prod(subchains) base steps and pays ONE finest-level batch evaluation.

    misfits: tuple of misfit callables, cheapest first, finest (= the exact
    target) last. theta0: (n_chains, d). During burn-in the base step size
    adapts per chain toward the base kernel's target on the PRODUCT of
    per-level acceptance fractions (inner='pcn'); for inner='mala' the base
    rate is tuned to its own 0.574 target with the DA outer-collapse
    penalty generalized to the product of correction-level rates (see
    delayed_acceptance.run_da_pcn for the measured rationale)."""
    dtype = theta0.dtype
    kernel = build_mlda_kernel(
        misfits, prior, subchains, inner=inner, batched=batched
    )
    ev_top = misfits[-1] if batched else jax.vmap(misfits[-1])
    phi_top0 = ev_top(theta0)
    state = kernel.init(theta0, phi_top0)
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), phi_top0.shape)
    log_beta0 = jnp.log(beta_arr) + phi_top0 * 0

    lo_clip = jnp.log(1e-4) if inner == "pcn" else jnp.log(1e-8)
    hi_clip = jnp.log(0.9999) if inner == "pcn" else jnp.log(10.0)

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:

        def burn_body(carry, inp):
            s, lb, ema = carry
            t, k = inp
            s, _ = kernel.step(jnp.exp(lb), s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                r = kernel.rates(s)
                if inner == "mala":
                    # Multilevel variant of the DA mala rule (see
                    # delayed_acceptance.run_da_pcn): tune the base rate to
                    # its own 0.574 target, minus a penalty when the PRODUCT
                    # of correction-level rates collapses. The nested ladder
                    # needs a stiffer penalty than plain DA (threshold 0.4,
                    # weight 4): a MALA base mixes efficiently toward the
                    # BASE rung's posterior, so over-long steps land subchain
                    # endpoints in low-pi_1 regions and the mid rung vetoes
                    # them — measured on the doubly-biased linear-Gaussian
                    # oracle (tests/test_mlda.py): DA's 0.25/2 rule
                    # equilibrates at corr ~ 0.18 and visible small-sample
                    # bias; 0.4/4 restores corr ~ 0.3+ and the analytic
                    # posterior.
                    corr = jnp.prod(r[1:], axis=0)
                    ema = ema + dtype.type(0.05) * (corr - ema)
                    drive = (r[0] - dtype.type(kernel.target)) - dtype.type(
                        4.0
                    ) * jnp.maximum(dtype.type(0.0), dtype.type(0.4) - ema)
                else:
                    drive = jnp.prod(r, axis=0) - dtype.type(kernel.target)
                lb = jnp.clip(lb + eta * drive, lo_clip, hi_clip)
            return (s, lb, ema), None

        ts = jnp.arange(n_burn, dtype=dtype)
        ema0 = phi_top0 * 0 + dtype.type(0.5)
        (state, log_beta, _), _ = jax.lax.scan(
            burn_body, (state, log_beta0, ema0),
            (ts, jax.random.split(k_burn, n_burn)),
        )
    else:
        log_beta = log_beta0

    beta_final = jnp.exp(log_beta)

    def body(s, k):
        s, acc = kernel.step(beta_final, s, k)
        return s, (s.theta, s.phi, acc, kernel.rates(s))

    n_keep = n_steps - n_burn
    state, (samples, phis, accs, rstacks) = jax.lax.scan(
        body, state, jax.random.split(k_main, n_keep)
    )
    return MLDAResult(
        state=state,
        samples=samples,
        phi_trace=phis,
        accept_rate=jnp.mean(accs.astype(jnp.float32), axis=0),
        level_rates=jnp.mean(rstacks.astype(jnp.float32), axis=0),
        beta=beta_final,
        evals_per_step=(),  # filled in (statically) by run_mlda
    )


def run_mlda(
    misfits: tuple,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    subchains: tuple = (8, 4),
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
) -> MLDAResult:
    """See _run_mlda_jit. This wrapper keeps the static per-level eval
    accounting out of the jitted program (it would otherwise be returned as
    traced arrays)."""
    res = _run_mlda_jit(
        misfits, prior, theta0, key,
        n_steps=n_steps, n_burn=n_burn, beta=beta, subchains=tuple(subchains),
        adapt=adapt, batched=batched, adapt_t0=adapt_t0, inner=inner,
    )
    return res._replace(evals_per_step=mlda_evals_per_step(subchains))


def level_rates_spec(n_levels: int):
    """Per-level acceptance fractions: segment value = mean over kept steps."""
    return (
        lambda r: r.level_rates,
        lambda kept: kept,
        lambda total: max(total, 1),
    )


def run_mlda_segmented(
    misfits: tuple,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    subchains: tuple = (8, 4),
    segment: int = 64,
    batched: bool = False,
    inner: str = "pcn",
) -> MLDAResult:
    """MLDA in fixed-size top-level segments (watchdog-safe; infer.segmented).
    Chain state and adapted base betas carry across segments; rate accounting
    covers the whole post-burn run."""
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments,
    )

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = run_mlda(
            misfits, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchains=subchains,
            adapt=True, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype), inner=inner,
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment,
        rates={
            "accept": accept_rate_spec(),
            "levels": level_rates_spec(len(misfits)),
        },
    )
    return MLDAResult(
        state=res.state,
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        level_rates=rates["levels"],
        beta=betas,
        evals_per_step=res.evals_per_step,
    )
