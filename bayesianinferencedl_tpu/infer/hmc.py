"""Hamiltonian Monte Carlo — multi-step gradient trajectories on autodiff
likelihoods (SURVEY.md A.5 adjoint machinery; §2b MUQ2 row, completing the
gradient-sampler family next to infer/mala.py).

MALA moves one Langevin step per accept/reject; HMC integrates L leapfrog
steps of Hamiltonian dynamics before the single MH decision, so one
trajectory can cross the posterior's width — autocorrelation per GRADIENT
evaluation improves whenever distant proposals would be rejected step-by-
step. TPU shape: the leapfrog loop is a lax.scan of L fused forward+reverse
likelihood passes over the whole chain batch (identical program per step —
no data-dependent trajectory lengths; NUTS's recursive tree is exactly the
control flow XLA cannot tile, which is why this is fixed-L with JITTER
rather than a NUTS port).

Design, sharing infer/mala.py's frame machinery (_make_nlp):

* Whitened coordinates theta = m_ref + L_ref y, prior frame by default,
  Laplace frame via ref=(m_L, L_L) — identity mass matrix in y IS the
  preconditioner (prior- or posterior-covariance mass).
* One step: refresh p ~ N(0, I); integrate L leapfrog steps of per-chain
  size eps = h * u with u ~ Uniform[1-jitter, 1+jitter] drawn per chain per
  step (trajectory-length jitter breaks the periodic-orbit resonances of
  fixed-length HMC — the standard fix, cf. jittered HMC / ChEES); accept
  with exp(H(start) - H(end)), H = nlp + ||p||^2/2.
* The leapfrog force is the drift-CLIPPED gradient (mala._tamed): far from
  the posterior raw misfit gradients are ~1e3-1e4 and the integrator
  explodes before adaptation can react. Exactness is unaffected: leapfrog
  with ANY position-dependent force is volume-preserving and reversible
  under momentum flip, and the MH test uses the TRUE Hamiltonian — the
  integrator is corrected exactly, whatever force it used (same argument
  as MALA's explicit-q correction).
* Per-chain step size h adapts during burn-in (Robbins-Monro on log h
  toward the 0.651 HMC-optimal acceptance), then freezes — same contract
  as every kernel in this package (exactness applies to kept samples).

Cost: one HMC step = n_leap fused vjp passes (vs 1 for MALA, 0 for pCN).
Figure of merit is ESS per gradient evaluation — measured guidance in
docs/SAMPLERS.md (artifacts/hmc_ff_r3.json).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.mala import (
    MALAResult,
    MALAState,
    _inv_chol,
    _make_nlp,
    _tamed,
)
from bayesianinferencedl_tpu.infer.priors import GaussianPrior

TARGET_ACCEPT_HMC = 0.651


def hmc_step(
    eval_fn,
    h: jax.Array,
    n_leap: int,
    jitter: float,
    state: MALAState,
    key: jax.Array,
):
    """One jittered-trajectory HMC step for a batch of chains.

    h: per-chain (n_chains,) leapfrog step sizes. Returns (state, accept).
    State is MALAState (shared frame machinery); state.grad carries
    d(nlp)/dy so each step costs exactly n_leap evaluations."""
    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    dtype = state.y.dtype
    u = 1.0 + jitter * jax.random.uniform(
        k_jit, h.shape, dtype, minval=-1.0, maxval=1.0
    )
    eps = (h * u)[..., None]  # (n_chains, 1)

    p0 = jax.random.normal(k_mom, state.y.shape, dtype)
    H0 = state.nlp + 0.5 * jnp.sum(p0 * p0, axis=-1)

    # leapfrog: half-kick, L x (drift, kick), un-kick half at the end
    force0 = _tamed(state.grad, h)  # clipped d(nlp)/dy
    p = p0 - 0.5 * eps * force0

    def leap(carry, _):
        y, p, _, _, _ = carry
        y = y + eps * p
        nlp, phi, grad = eval_fn(y)
        f = _tamed(grad, h)
        p = p - eps * f
        return (y, p, nlp, phi, grad), None

    (y1, p1, nlp1, phi1, grad1), _ = jax.lax.scan(
        leap, (state.y, p, state.nlp, state.phi, state.grad), None,
        length=n_leap,
    )
    p1 = p1 + 0.5 * eps * _tamed(grad1, h)  # undo the trailing half-kick

    # guard against integrator overflow: a non-finite H is a reject
    H1 = nlp1 + 0.5 * jnp.sum(p1 * p1, axis=-1)
    log_alpha = jnp.where(jnp.isfinite(H1), H0 - H1, -jnp.inf)
    u_acc = jax.random.uniform(k_acc, state.nlp.shape, dtype)
    accept = jnp.log(u_acc) < log_alpha
    acol = accept[..., None]
    new = MALAState(
        y=jnp.where(acol, y1, state.y),
        nlp=jnp.where(accept, nlp1, state.nlp),
        phi=jnp.where(accept, phi1, state.phi),
        grad=jnp.where(acol, grad1, state.grad),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new, accept


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "n_steps", "n_burn", "n_leap", "thin", "adapt", "batched",
    ),
)
def run_hmc(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step: float = 0.1,
    n_leap: int = 8,
    jitter: float = 0.2,
    thin: int = 1,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    ref: Optional[tuple] = None,
) -> MALAResult:
    """Run preconditioned HMC chains: scan over steps x scan over leapfrog
    x whole chain batch per gradient evaluation, fully on-device.

    Same contract as run_mala (working coordinates in/out, per-chain h
    adaptation toward 65.1% during burn-in, ref=(mean, chol) overrides the
    whitening frame). n_steps/n_burn count TRAJECTORIES; each costs n_leap
    fused forward+reverse likelihood passes."""
    if n_leap < 1:
        raise ValueError(
            f"n_leap={n_leap}: run_hmc needs >= 1 leapfrog step (n_leap=0 "
            "means AUTO only at the api level — run_hmc_chees / "
            "api.run_inversion(hmc_leap=0); this path needs a fixed length)"
        )
    dtype = theta0.dtype
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    to_theta, eval_fn = _make_nlp(
        misfit_fn, prior, ref_mean, ref_chol, batched=batched
    )
    Li_ref = _inv_chol(ref_chol)
    y0 = jnp.dot(theta0 - ref_mean, Li_ref.T, precision=jax.lax.Precision.HIGHEST)
    nlp0, phi0, grad0 = eval_fn(y0)
    state = MALAState(
        y=y0, nlp=nlp0, phi=phi0, grad=grad0,
        n_accept=(nlp0 * 0).astype(jnp.int32),
    )
    h_arr = jnp.broadcast_to(jnp.asarray(step, dtype), state.nlp.shape)
    log_h0 = jnp.log(h_arr) + state.nlp * 0  # inherit vma axes (shard_map)
    step_fn = partial(hmc_step, eval_fn)

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:

        def burn_body(carry, inp):
            s, lh = carry
            t, k = inp
            s, acc = step_fn(jnp.exp(lh), n_leap, jitter, s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                lh = lh + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT_HMC))
                lh = jnp.clip(lh, jnp.log(1e-8), jnp.log(10.0))
            return (s, lh), None

        ts = jnp.arange(n_burn, dtype=dtype)
        (state, log_h), _ = jax.lax.scan(
            burn_body, (state, log_h0), (ts, jax.random.split(k_burn, n_burn))
        )
        state = state._replace(n_accept=state.n_accept * 0)
    else:
        log_h = log_h0

    h_final = jnp.exp(log_h)

    def keep_body(s, k):
        s2, _ = step_fn(h_final, n_leap, jitter, s, k)
        return s2, (to_theta(s2.y), s2.phi)

    def drop_body(s, k):
        s2, _ = step_fn(h_final, n_leap, jitter, s, k)
        return s2, None

    n_keep_steps = n_steps - n_burn
    if thin > 1:

        def thin_body(s, ks):
            s, _ = jax.lax.scan(drop_body, s, ks)
            return s, (to_theta(s.y), s.phi)

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
    return MALAResult(
        state=state, samples=samples, phi_trace=phis,
        accept_rate=accept_rate, step=h_final,
    )


def run_hmc_segmented(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step: float = 0.1,
    n_leap: int = 8,
    jitter: float = 0.2,
    segment: Optional[int] = None,
    batched: bool = False,
    ref: Optional[tuple] = None,
) -> MALAResult:
    """HMC in fixed-size host-dispatched segments (watchdog-safe for FOM
    likelihoods — each trajectory is n_leap batched solves PLUS adjoints).
    Chain state and adapted per-chain step sizes carry across segments.

    segment=None sizes the program to ~64 batched solves (the MALA-proven
    watchdog budget): max(1, 32 // n_leap) trajectories per program."""
    if segment is None:
        segment = max(1, 32 // n_leap)
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    steps0 = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, hs = carry
        res = run_hmc(
            misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, step=hs, n_leap=n_leap, jitter=jitter,
            thin=1, adapt=True, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype), ref=ref,
        )
        ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
        theta_now = ref_mean + jnp.dot(
            res.state.y, ref_chol.T, precision=jax.lax.Precision.HIGHEST
        )
        return res, (theta_now, res.step)

    res, (_, hs), samples, phis, rates, _ = drive_segments(
        seg, (theta0, steps0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return MALAResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], step=hs,
    )


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "n_leap", "n_adapt", "n_meas", "batched", "axis_name"
    ),
)
def _chees_probe(
    misfit_fn, prior, ref_mean, ref_chol, state, log_h, t0, key,
    *, n_leap, jitter, n_adapt, n_meas, batched, axis_name=None,
):
    """One trajectory-length probe: n_adapt steps of step-size adaptation at
    this n_leap, then n_meas frozen-h steps accumulating the ChEES statistic
    (Hoffman/Radul/Sountsov 2021): the mean squared change of the CENTERED
    squared radius, E[(||y'-mu||^2 - ||y-mu||^2)^2], mu = cross-chain mean.
    Rejected moves contribute 0 — the accepted-jump weighting. Divided by
    n_leap (by the caller) it is the criterion per gradient evaluation.
    Returns (state, log_h, chees, accept_rate).

    axis_name: set inside shard_map (parallel/sharding.sharded_hmc_chees) —
    the centering mean and the returned scalars become cross-DEVICE means
    (pmean), so every shard computes the identical criterion."""
    _, eval_fn = _make_nlp(misfit_fn, prior, ref_mean, ref_chol, batched=batched)
    dtype = state.y.dtype
    k_adapt, k_meas = jax.random.split(key)

    def adapt_body(carry, inp):
        s, lh = carry
        t, k = inp
        s, acc = hmc_step(eval_fn, jnp.exp(lh), n_leap, jitter, s, k)
        eta = 0.5 / (1.0 + t + t0) ** 0.6
        lh = lh + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT_HMC))
        lh = jnp.clip(lh, jnp.log(1e-8), jnp.log(10.0))
        return (s, lh), None

    ts = jnp.arange(n_adapt, dtype=dtype)
    (state, log_h), _ = jax.lax.scan(
        adapt_body, (state, log_h), (ts, jax.random.split(k_adapt, n_adapt))
    )

    h = jnp.exp(log_h)

    def meas_body(s, k):
        mu = jnp.mean(s.y, axis=0)
        if axis_name is not None:
            mu = jax.lax.pmean(mu, axis_name)
        r0 = jnp.sum((s.y - mu) ** 2, axis=-1)
        s2, acc = hmc_step(eval_fn, h, n_leap, jitter, s, k)
        r1 = jnp.sum((s2.y - mu) ** 2, axis=-1)
        return s2, (jnp.mean((r1 - r0) ** 2), jnp.mean(acc.astype(dtype)))

    state, (js, accs) = jax.lax.scan(
        meas_body, state, jax.random.split(k_meas, n_meas)
    )
    chees, acc = jnp.mean(js), jnp.mean(accs)
    if axis_name is not None:
        chees = jax.lax.pmean(chees, axis_name)
        acc = jax.lax.pmean(acc, axis_name)
    return state, log_h, chees, acc


def run_hmc_chees(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step: float = 0.1,
    leap_candidates=(1, 2, 4, 8, 16, 32),
    jitter: float = 0.2,
    n_adapt: int = 24,
    n_meas: int = 24,
    thin: int = 1,
    batched: bool = False,
    ref: Optional[tuple] = None,
):
    """HMC with the trajectory length CHOSEN BY MEASUREMENT instead of by
    the user: probe each candidate n_leap with the ChEES criterion per
    gradient evaluation and run the production chain at the argmax.

    NUTS answers "how long should this trajectory be?" with per-chain
    recursion — control flow XLA cannot tile (module docstring). ChEES-style
    tuning answers it with a CROSS-CHAIN statistic instead: with thousands
    of chains, one short probe per candidate measures the expected squared
    jump of the centered squared radius — the quantity whose stationarity
    governs the slowest (radial) component — at that trajectory length.
    That is the TPU-native trade: the batch axis replaces the tree, every
    probe is a fixed-shape program (one 20-40 s XLA compile per DISTINCT
    candidate, reused thereafter), and the production run is the already-
    optimal static-L jittered kernel (run_hmc).

    Probe schedule: half of n_burn runs first at the median candidate
    (reaching the typical set so probes measure mixing, not transient
    drift), then each candidate gets n_adapt step-size-adaptation steps +
    n_meas frozen measurement steps (chain state and per-chain h carry
    through — the probes double as additional burn-in), then run_hmc
    finishes the remaining burn-in and the kept run at the winner.

    Returns (MALAResult, info) with info = {"n_leap": chosen,
    "candidates": [...], "chees_per_grad": [...], "accept": [...]}.
    """
    dtype = theta0.dtype
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    cands = tuple(int(L) for L in leap_candidates)

    # phase 1: reach the typical set at the median candidate
    pre = max(n_burn // 2, 8)
    L_mid = cands[len(cands) // 2]
    k_pre, k_probe, k_main = jax.random.split(key, 3)
    res0 = run_hmc(
        misfit_fn, prior, theta0, k_pre,
        n_steps=pre, n_burn=pre, step=step, n_leap=L_mid, jitter=jitter,
        batched=batched, ref=ref,
    )
    state, log_h = res0.state._replace(n_accept=res0.state.n_accept * 0), jnp.log(res0.step)

    # phase 2: probe every candidate (state + per-chain h carry through)
    chees, accept = [], []
    for i, L in enumerate(cands):
        state, log_h, j, a = _chees_probe(
            misfit_fn, prior, ref_mean, ref_chol, state, log_h,
            jnp.asarray(pre + i * (n_adapt + n_meas), dtype),
            jax.random.fold_in(k_probe, i),
            n_leap=L, jitter=jitter, n_adapt=n_adapt, n_meas=n_meas,
            batched=batched,
        )
        chees.append(float(j) / L)  # per gradient evaluation
        accept.append(float(a))
    best = max(range(len(cands)), key=lambda i: chees[i])
    L_star = cands[best]

    # phase 3: remaining burn-in + kept run at the winner
    tail_burn = max(n_burn - pre, 8)
    theta_now = ref_mean + jnp.dot(
        state.y, ref_chol.T, precision=jax.lax.Precision.HIGHEST
    )
    res = run_hmc(
        misfit_fn, prior, theta_now, k_main,
        n_steps=(n_steps - n_burn) + tail_burn, n_burn=tail_burn,
        step=jnp.exp(log_h), n_leap=L_star, jitter=jitter, thin=thin,
        batched=batched, ref=ref,
    )
    info = {
        "n_leap": L_star,
        "candidates": list(cands),
        "chees_per_grad": chees,
        "accept": accept,
    }
    return res, info
