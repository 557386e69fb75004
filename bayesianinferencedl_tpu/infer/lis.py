"""Likelihood-informed subspace (LIS) pCN — operator-weighted proposals for
high-dimensional inversion (SURVEY.md A.5 dimension-robust samplers; §2a #4's
full-field coefficient space is the target regime).

The observation operator has m = n_obs outputs, so the Gauss-Newton Hessian
of the data misfit has rank <= m no matter how large the parameter dimension
d is: the data only inform an (at most) m-dimensional subspace, and the
posterior equals the prior on its orthogonal complement up to nonlinear
leakage. pCN with a single scalar step size wastes that structure — the one
beta must be small enough for the stiffest informed direction, so the
(d - r)-dimensional complement crawls at a rate set by directions it never
feels.

This module implements the classic fix (Cui, Law & Marzouk's DILI /
likelihood-informed dimension reduction, simplified to its exact
operator-weighted-pCN core):

* OFFLINE (``build_lis``): average the whitened Gauss-Newton Hessian
  ``H = mean_i J(z_i)^T J(z_i) / sigma^2`` over a few linearization points
  (MAP + Laplace draws — the "global LIS"), eigendecompose on the host in
  f64, and keep the eigenpairs with ``lam >= lam_tol``. Gradients come from
  the same autodiff machinery as everything else (FOM rows are exact adjoint
  solves through ``lax.custom_linear_solve``). This is the only place
  derivatives are used — the chain itself stays gradient-free.

* ONLINE (``run_lis_pcn``): pCN with DIRECTION-DEPENDENT step sizes
  ``beta_i = beta0 / sqrt(1 + lam_i)`` (lam = 0 on the complement, so the
  uninformed directions move at beta0 ~ O(1) while informed directions take
  posterior-scaled steps). The proposal is ``y' = B y + G xi`` with
  ``B = V diag(c_r) V^T + c0 (I - V V^T)`` and ``B^2 + G^2 = I``: B is
  symmetric and commutes with the (whitened) prior covariance I, so the
  proposal is prior-reversible and the acceptance ratio stays the plain pCN
  misfit difference — EXACT for any posterior, multimodal or not, with any
  subspace estimate (a bad V only costs mixing, never correctness). Each
  step adds two (batch, d) @ (d, r) matvecs to a standard pCN step — noise
  next to the likelihood.

Relation to the neighbors: ``gpcn``/``laplace_mh`` (infer/samplers.py) use
the FULL Laplace covariance — right frame, but dense in d and tied to one
expansion point; ``mala`` pays a likelihood gradient EVERY step. LIS-pCN
pays a handful of Jacobians once, then samples at pCN cost with
per-direction steps. Burn-in adapts per-chain log beta0 toward 23.4%
acceptance (same Robbins-Monro contract as pcn.py), then freezes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.pcn import TARGET_ACCEPT, PCNResult, PCNState
from bayesianinferencedl_tpu.infer.priors import GaussianPrior

HI = jax.lax.Precision.HIGHEST


class LIS(NamedTuple):
    """Likelihood-informed subspace in WHITENED prior coordinates.

    V:   (d, r) orthonormal eigenvectors of the averaged whitened GN Hessian
    lam: (r,)   matching eigenvalues (posterior precision excess: the Laplace
         posterior variance along V[:, i] is 1 / (1 + lam[i]))
    """

    V: jax.Array
    lam: jax.Array

    @property
    def rank(self) -> int:
        return self.V.shape[1]


def build_lis(
    forward_fn: Callable,
    prior: GaussianPrior,
    z_points: jax.Array,
    noise_sigma: float,
    *,
    lam_tol: float = 0.1,
    rank_max: int | None = None,
) -> LIS:
    """Estimate the global LIS from linearization points.

    forward_fn: per-sample ``z -> y (m,)`` in WORKING coordinates,
    differentiable (the rom_nn surrogate is matmuls+MLP; the fom route is m
    adjoint solves per point via ``lax.custom_linear_solve``).
    z_points: (n_points, d) working-coordinate linearization points — the MAP
    plus Laplace/posterior draws is the standard choice; prior draws work
    when no MAP is available.

    The whitened Jacobian is ``J_w = J L`` (L = prior Cholesky); the averaged
    Hessian ``mean J_w^T J_w / sigma^2`` is eigendecomposed on the host in
    f64 (offline, conditioning squares — the same policy as rom/pod.py), and
    eigenpairs with ``lam >= lam_tol`` are kept (at least one, at most
    rank_max). lam_tol = 0.1 keeps directions where the data shrink the
    prior variance by >= ~9%.
    """

    def fwd_white(y):
        return forward_fn(prior.mean + jnp.dot(prior.chol, y, precision=HI))

    Li = jax.scipy.linalg.solve_triangular(
        prior.chol, jnp.eye(prior.chol.shape[0], dtype=prior.chol.dtype), lower=True
    )
    y_points = jnp.dot(z_points - prior.mean, Li.T, precision=HI)
    Js = jax.vmap(jax.jacrev(fwd_white))(y_points)  # (n_points, m, d)
    H = np.asarray(
        jnp.mean(
            jnp.einsum("pmi,pmj->pij", Js, Js, precision=HI), axis=0
        )
    ).astype(np.float64) / float(noise_sigma) ** 2
    lam, V = np.linalg.eigh((H + H.T) / 2.0)
    lam, V = lam[::-1], V[:, ::-1]  # descending
    r = max(1, int(np.sum(lam >= lam_tol)))
    if rank_max is not None:
        r = min(r, int(rank_max))
    dtype = z_points.dtype
    return LIS(V=jnp.asarray(V[:, :r], dtype), lam=jnp.asarray(np.maximum(lam[:r], 0.0), dtype))


def _dir_steps(lis: LIS, beta0: jax.Array):
    """Per-direction (b, c) pairs from the per-chain scalar beta0 (B,).

    Returns (b0, c0, br, cr): complement and informed step/contraction
    factors, shaped (B, 1) and (B, r). b^2 + c^2 = 1 per direction."""
    b0 = beta0[..., None]
    c0 = jnp.sqrt(1.0 - b0 * b0)
    br = b0 / jnp.sqrt(1.0 + lis.lam)[None, :]
    cr = jnp.sqrt(1.0 - br * br)
    return b0, c0, br, cr


def lis_pcn_step(
    misfit_fn: Callable,
    lis: LIS,
    to_theta: Callable,
    beta0: jax.Array,
    state: PCNState,
    key: jax.Array,
    *,
    batched: bool = False,
):
    """One operator-weighted pCN step in whitened coordinates.

    state.theta holds WHITENED y; misfit_fn eats WORKING coordinates via
    to_theta. beta0: per-chain (B,) scalar step scale. Returns
    (state, accept mask)."""
    k_prop, k_acc = jax.random.split(key)
    dtype = state.theta.dtype
    y = state.theta
    xi = jax.random.normal(k_prop, y.shape, dtype)
    b0, c0, br, cr = _dir_steps(lis, jnp.asarray(beta0, dtype))
    a = jnp.dot(y, lis.V, precision=HI)  # (B, r) informed components
    xa = jnp.dot(xi, lis.V, precision=HI)
    prop = (
        c0 * y
        + b0 * xi
        + jnp.dot((cr - c0) * a + (br - b0) * xa, lis.V.T, precision=HI)
    )
    th = to_theta(prop)
    phi_prop = misfit_fn(th) if batched else jax.vmap(misfit_fn)(th)
    u = jax.random.uniform(k_acc, state.phi.shape, dtype)
    accept = jnp.log(u) < (state.phi - phi_prop)
    new = PCNState(
        theta=jnp.where(accept[..., None], prop, y),
        phi=jnp.where(accept, phi_prop, state.phi),
        n_accept=state.n_accept + accept.astype(jnp.int32),
    )
    return new, accept


@partial(jax.jit, static_argnames=("misfit_fn", "n_steps", "n_burn", "thin", "adapt", "batched"))
def run_lis_pcn(
    misfit_fn: Callable,
    prior: GaussianPrior,
    lis: LIS,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.5,
    thin: int = 1,
    adapt: bool = True,
    batched: bool = False,
    adapt_t0=0.0,
) -> PCNResult:
    """Run LIS-pCN chains: scan over steps, vmap over chains, on-device.

    Same contract as run_pcn (theta0 (n_chains, d) in working coordinates,
    samples returned in working coordinates, per-chain beta0 adapted toward
    23.4% during burn-in then frozen) with the operator-weighted proposal.
    beta here is the COMPLEMENT step size beta0 — informed directions move
    at beta0 / sqrt(1 + lam_i), so beta0 can sit far above a plain-pCN beta
    (0.5 default vs 0.25): the posterior-flat directions mix at near-
    independence rates while informed directions take Laplace-scaled steps.
    """
    dtype = theta0.dtype
    Li = jax.scipy.linalg.solve_triangular(
        prior.chol, jnp.eye(prior.chol.shape[0], dtype=prior.chol.dtype), lower=True
    )

    def to_theta(Y):
        return prior.mean + jnp.dot(Y, prior.chol.T, precision=HI)

    y0 = jnp.dot(theta0 - prior.mean, Li.T, precision=HI)
    th0 = to_theta(y0)
    phi0 = misfit_fn(th0) if batched else jax.vmap(misfit_fn)(th0)
    state = PCNState(theta=y0, phi=phi0, n_accept=(phi0 * 0).astype(jnp.int32))
    step_fn = partial(lis_pcn_step, batched=batched)

    beta_arr = jnp.broadcast_to(jnp.asarray(beta, dtype), state.phi.shape)
    log_beta0 = jnp.log(beta_arr) + state.phi * 0  # inherit vma axes

    k_burn, k_main = jax.random.split(key)
    if n_burn > 0:
        def burn_body(carry, inp):
            s, lb = carry
            t, k = inp
            s, acc = step_fn(misfit_fn, lis, to_theta, jnp.exp(lb), s, k)
            if adapt:
                eta = 0.5 / (1.0 + t + jnp.asarray(adapt_t0, dtype)) ** 0.6
                lb = lb + eta * (acc.astype(dtype) - dtype.type(TARGET_ACCEPT))
                lb = jnp.clip(lb, jnp.log(1e-4), jnp.log(0.9999))
            return (s, lb), None

        ts = jnp.arange(n_burn, dtype=dtype)
        (state, log_beta), _ = jax.lax.scan(
            burn_body, (state, log_beta0), (ts, jax.random.split(k_burn, n_burn))
        )
        state = state._replace(n_accept=state.n_accept * 0)
    else:
        log_beta = log_beta0

    beta_final = jnp.exp(log_beta)

    def keep_body(s, k):
        s2, _ = step_fn(misfit_fn, lis, to_theta, beta_final, s, k)
        return s2, (to_theta(s2.theta), s2.phi)

    def drop_body(s, k):
        s2, _ = step_fn(misfit_fn, lis, to_theta, beta_final, s, k)
        return s2, None

    n_keep_steps = n_steps - n_burn
    if thin > 1:
        def thin_body(s, ks):
            s, _ = jax.lax.scan(drop_body, s, ks)
            return s, (to_theta(s.theta), s.phi)

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
    # state back in WORKING coordinates so resume/segment carries compose
    # with the other samplers' contracts
    state = state._replace(theta=to_theta(state.theta))
    return PCNResult(
        state=state, samples=samples, phi_trace=phis,
        accept_rate=accept_rate, beta=beta_final,
    )


def run_lis_pcn_segmented(
    misfit_fn: Callable,
    prior: GaussianPrior,
    lis: LIS,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.5,
    segment: int = 64,
    batched: bool = False,
) -> PCNResult:
    """LIS-pCN in fixed-size host-dispatched segments (watchdog-safe for FOM
    likelihoods; infer.segmented). Chain state and adapted per-chain beta0
    carry across segments."""
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = run_lis_pcn(
            misfit_fn, prior, lis, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, thin=1, adapt=True,
            batched=batched, adapt_t0=jnp.asarray(start, theta0.dtype),
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
