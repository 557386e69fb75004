"""Preconditioned MALA — gradient-based MCMC on autodiff likelihoods
(SURVEY.md A.5 adjoint machinery put to sampling work; §2b MUQ2 row).

The reference's sampler set is gradient-free (pCN random walk + Laplace
proposals). This framework's forward models are all differentiable end to
end — the ROM+NN surrogate is matmuls + MLP, and the FOM solve exposes exact
adjoint gradients through ``lax.custom_linear_solve`` (the TPU-native
replacement for the reference's hand-coded adjoints, SURVEY.md §2b) — so
gradient-informed proposals come at ~2x the cost of a likelihood evaluation
(one fused forward+reverse pass) and buy an order-of-magnitude better ESS
per step on concentrated posteriors.

Design: Metropolis-ADJUSTED Langevin in *whitened* coordinates with an
explicit proposal-density correction.

* Whitening: work in y with theta = m_ref + L_ref y. By default the
  reference frame is the PRIOR (m, L): the preconditioner is the prior
  covariance, the TPU analog of function-space MALA. Passing a Laplace
  approximation as the frame (``ref=(m_L, L_L)``) preconditions with the
  posterior's local covariance instead — near-iid steps on near-Gaussian
  posteriors while staying exact (unlike the independence sampler) when the
  posterior is not Gaussian.
* Target in y:  log pi(y) = -Phi(theta(y)) - 0.5 ||L^{-1}(theta(y) - m)||^2
  (data misfit + exact prior term; no Jacobian — the frame map is affine).
* Proposal:     y' = y + (h/2) grad log pi(y) + sqrt(h) xi,  xi ~ N(0, I)
* Acceptance:   standard MH with the explicit Gaussian q densities
  log q(y'|y) = -||y' - y - (h/2) g(y)||^2 / (2h). Because q is computed
  from the drift actually used, ANY drift is Metropolis-corrected exactly —
  correctness never depends on discretization coefficients.

Step size h is adapted per chain during burn-in (Robbins-Monro on log h
toward the MALA-optimal 0.574 acceptance), then frozen — same contract as
pcn.py's beta adaptation. One fused vjp per step yields (Phi, grad) for the
whole chain batch; the gradient of the current state is carried in the scan
state, so each step costs exactly one forward+reverse likelihood pass.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.priors import GaussianPrior

TARGET_ACCEPT_MALA = 0.574


class MALAState(NamedTuple):
    y: jax.Array  # (..., d) whitened coordinates
    nlp: jax.Array  # (...,) negative log posterior at y (misfit + prior)
    phi: jax.Array  # (...,) data misfit alone (for phi_trace parity)
    grad: jax.Array  # (..., d) d(nlp)/dy — carried so each step costs 1 vjp
    n_accept: jax.Array  # (...,) int32


class MALAResult(NamedTuple):
    state: MALAState
    samples: jax.Array  # (n_kept, n_chains, d) in WORKING coordinates (theta)
    phi_trace: jax.Array  # (n_kept, n_chains) data misfit
    accept_rate: jax.Array  # (n_chains,)
    step: jax.Array  # (n_chains,) final (possibly adapted) step sizes h


def _inv_chol(chol: jax.Array) -> jax.Array:
    eye = jnp.eye(chol.shape[0], dtype=chol.dtype)
    return jax.scipy.linalg.solve_triangular(chol, eye, lower=True)


def _make_nlp(
    misfit_fn: Callable,
    prior: GaussianPrior,
    ref_mean: jax.Array,
    ref_chol: jax.Array,
    *,
    batched: bool,
):
    """(nlp(Y), phi(Y), theta(Y)) machinery in the whitened frame.

    Returns (to_theta, eval_fn) with eval_fn(Y) -> (nlp, phi, grad) computed
    in ONE fused forward+reverse pass over the whole chain batch (rows of the
    pulled-back cotangent are per-chain gradients — chains are independent).
    """
    hi = jax.lax.Precision.HIGHEST
    Li = _inv_chol(prior.chol)

    def to_theta(Y):
        return ref_mean + jnp.dot(Y, ref_chol.T, precision=hi)

    def nlp_phi(Y):
        theta = to_theta(Y)
        phi = misfit_fn(theta) if batched else jax.vmap(misfit_fn)(theta)
        w = jnp.dot(theta - prior.mean, Li.T, precision=hi)
        return phi + 0.5 * jnp.sum(w * w, axis=-1), phi

    def eval_fn(Y):
        (nlp, phi), pullback = jax.vjp(nlp_phi, Y)
        (grad,) = pullback((jnp.ones_like(nlp), jnp.zeros_like(phi)))
        return nlp, phi, grad

    return to_theta, eval_fn


def _tamed(g: jax.Array, h: jax.Array, kappa: float = 2.0) -> jax.Array:
    """Noise-scale drift clip: g unchanged unless the drift move (h/2)||g||
    would exceed kappa x the proposal noise scale sqrt(h d), i.e.
    ||g|| <= 2 kappa sqrt(d/h).

    Far from the posterior the log-density gradient can be enormous (a
    1e-2-noise misfit at a prior-typical state has |g| ~ 1e3-1e4), and the
    raw drift (h/2) g then moves O(1) per step NO MATTER HOW SMALL h is —
    the step-size adaptation loses control of the move size, which stalls
    burn-in and (inside delayed acceptance) makes the outer correction veto
    every subchain. A norm CLIP at the noise scale restores (drift <=
    kappa sqrt(h d), so smaller h genuinely means smaller moves) while
    leaving the stationary regime EXACTLY untouched — there ||g|| ~ sqrt(d)
    and h ~ d^{-1/3}, so the clip radius 2 kappa sqrt(d/h) sits far above
    it. (Smooth Roberts-Tweedie taming g/(1+h||g||) was measured to cost
    ~4x ESS in that regime: h||g|| ~ 2 at d=16, so it divides every
    stationary drift by ~3.) The MH correction uses the clipped drift in
    its q densities, so exactness is unaffected — any drift is corrected
    exactly."""
    d = g.shape[-1]
    r = 2.0 * kappa * jnp.sqrt(d / h)[..., None]
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g * jnp.minimum(1.0, r / jnp.maximum(gn, jnp.finfo(g.dtype).tiny))


def mala_step(eval_fn, h: jax.Array, state: MALAState, key: jax.Array):
    """One (drift-clipped) MALA step for a batch of chains. h: per-chain
    (n_chains,) step sizes. Returns (state, accept mask)."""
    k_prop, k_acc = jax.random.split(key)
    dtype = state.y.dtype
    hcol = h[..., None]
    g = _tamed(-state.grad, h)  # drift-clipped gradient of LOG posterior
    xi = jax.random.normal(k_prop, state.y.shape, dtype)
    prop = state.y + 0.5 * hcol * g + jnp.sqrt(hcol) * xi

    nlp_p, phi_p, grad_p = eval_fn(prop)
    g_p = _tamed(-grad_p, h)
    # explicit Gaussian proposal densities (same per-chain h both directions)
    fwd = prop - state.y - 0.5 * hcol * g
    bwd = state.y - prop - 0.5 * hcol * g_p
    log_q_fwd = -jnp.sum(fwd * fwd, axis=-1) / (2.0 * h)
    log_q_bwd = -jnp.sum(bwd * bwd, axis=-1) / (2.0 * h)
    log_alpha = (state.nlp - nlp_p) + (log_q_bwd - log_q_fwd)

    u = jax.random.uniform(k_acc, state.nlp.shape, dtype)
    accept = jnp.log(u) < log_alpha
    acol = accept[..., None]
    new = MALAState(
        y=jnp.where(acol, prop, state.y),
        nlp=jnp.where(accept, nlp_p, state.nlp),
        phi=jnp.where(accept, phi_p, state.phi),
        grad=jnp.where(acol, grad_p, state.grad),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new, accept


@partial(jax.jit, static_argnames=("misfit_fn", "n_steps", "n_burn", "thin", "adapt", "batched"))
def run_mala(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step: float = 0.1,
    thin: int = 1,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
    ref: Optional[tuple] = None,
) -> MALAResult:
    """Run preconditioned MALA chains: scan over steps, whole chain batch per
    likelihood/gradient evaluation, fully on-device.

    theta0: (n_chains, d) in WORKING coordinates (same frame as run_pcn —
    log k for GaussianPrior, whitened z for BoxPrior). step: scalar or
    per-chain initial step size h; burn-in adapts per-chain log h toward
    57.4% acceptance when adapt=True. batched=True marks misfit_fn as
    whole-batch. ref=(mean, chol) overrides the whitening frame (e.g. a
    Laplace approximation — posterior-covariance preconditioning); default
    is the prior frame. adapt_t0: global-step offset so segmented drivers
    keep one annealing clock (see infer/segmented.py).
    """
    dtype = theta0.dtype
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    to_theta, eval_fn = _make_nlp(
        misfit_fn, prior, ref_mean, ref_chol, batched=batched
    )
    # initial whitened coords: y0 = L_ref^{-1} (theta0 - m_ref), batch-safe
    Li_ref = _inv_chol(ref_chol)
    y0 = jnp.dot(theta0 - ref_mean, Li_ref.T, precision=jax.lax.Precision.HIGHEST)
    nlp0, phi0, grad0 = eval_fn(y0)
    state = MALAState(
        y=y0, nlp=nlp0, phi=phi0, grad=grad0,
        n_accept=(nlp0 * 0).astype(jnp.int32),
    )
    h_arr = jnp.broadcast_to(jnp.asarray(step, dtype), state.nlp.shape)
    log_h0 = jnp.log(h_arr) + state.nlp * 0  # inherit vma axes (shard_map)

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:
        def burn_body(carry, inp):
            s, lh = carry
            t, k = inp
            s, acc = mala_step(eval_fn, jnp.exp(lh), s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                lh = lh + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT_MALA))
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
        s2, _ = mala_step(eval_fn, h_final, s, k)
        return s2, (to_theta(s2.y), s2.phi)

    def drop_body(s, k):
        s2, _ = mala_step(eval_fn, h_final, s, k)
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


def run_mala_segmented(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step: float = 0.1,
    segment: int = 64,
    batched: bool = False,
    ref: Optional[tuple] = None,
) -> MALAResult:
    """MALA split into fixed-size host-dispatched segments (watchdog-safe for
    FOM likelihoods — each step is a batched solve PLUS its adjoint solve).
    Chain state and adapted per-chain step sizes carry across segments."""
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    steps0 = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, hs = carry
        res = run_mala(
            misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, step=hs, thin=1, adapt=True,
            batched=batched, adapt_t0=jnp.asarray(start, theta0.dtype), ref=ref,
        )
        # carry WORKING coords (run_mala re-whitens); samples already are
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
