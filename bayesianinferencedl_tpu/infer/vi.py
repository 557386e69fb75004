"""Automatic differentiation variational inference (ADVI): a gradient-based
Gaussian posterior approximation (SURVEY.md A.5 inversion layer — a
beyond-reference capability; Kucukelbir et al. 2017).

Completes the fast-approximation triangle next to EKI (derivative-free
ensemble transport, infer/eki.py) and the Laplace fit (local quadratic at
the MAP, infer/map.py): ADVI fits q(Y) = N(mu, L L^T) over the WHITENED
coordinates by stochastic gradient ascent on the ELBO — global (it
integrates the posterior, not a point expansion), gradient-informed (one
fused forward+reverse pass per Monte Carlo draw, the same vjp machinery
the MALA/HMC kernels use), and deterministic in output shape.

TPU mapping: the n_mc Monte Carlo draws ARE the batch axis — each ADVI step
is one batched differentiable forward over (n_mc, d) plus a d x d triangular
matmul, so the whole optimization is a single lax.scan'd XLA program
(segmented for the watchdog like every other long scan in the repo). The
entropy is analytic (sum log diag L), so the only stochasticity is the
reparameterized path term Y = mu + eps L^T.

Honest contract (the same one EKI carries, docs/SAMPLERS.md): q is Gaussian
in the whitened frame — exact when the posterior is Gaussian there (the
full-rank family recovers the linear-Gaussian posterior EXACTLY,
tests/test_vi.py), a mode-seeking KL(q||p) approximation otherwise:
mean-field underestimates correlated marginals, and a multimodal posterior
yields ONE basin. For certified posteriors run the MCMC kernels; ADVI is
the fast gradient-based first look and a natural MCMC initializer.

Frames: like the samplers, `ref=(mean, chol)` re-centers the whitening
(e.g. a Laplace frame) — q lives in that frame, and theta_mean/theta_chol
push the fit back to working coordinates exactly (affine frame => exact).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.mala import _inv_chol
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.models.surrogate import adam_init, adam_update


class VIResult(NamedTuple):
    mu: jax.Array  # (d,) variational mean, whitened ref frame
    L: jax.Array  # (d, d) variational Cholesky factor, whitened ref frame
    # (mean-field fits store the diagonal matrix — one code path downstream)
    theta_mean: jax.Array  # (d,) posterior mean, WORKING coordinates
    theta_chol: jax.Array  # (d, d) posterior Cholesky, WORKING coordinates
    elbo_trace: jax.Array  # (n_steps,) per-step MC ELBO estimate
    n_forward: int  # total differentiable forward evaluations (n_mc * steps)


def vi_sample(res: VIResult, key: jax.Array, shape=()) -> jax.Array:
    """Draw theta ~ q in WORKING coordinates: theta = theta_mean + eps @
    theta_chol^T (exact push-forward of the whitened fit)."""
    d = res.theta_mean.shape[0]
    eps = jax.random.normal(key, (*shape, d), res.theta_mean.dtype)
    hi = jax.lax.Precision.HIGHEST
    return res.theta_mean + jnp.dot(eps, res.theta_chol.T, precision=hi)


def _chol_of(params, rank: str):
    """Unconstrained params -> lower-triangular L with positive diagonal."""
    if rank == "meanfield":
        return jnp.diag(jnp.exp(params["raw"]))
    return jnp.tril(params["raw"], -1) + jnp.diag(jnp.exp(jnp.diag(params["raw"])))


def _log_det(params, rank: str) -> jax.Array:
    raw = params["raw"]
    return jnp.sum(raw) if rank == "meanfield" else jnp.sum(jnp.diag(raw))


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "rank", "n_mc", "n_steps", "n_total", "batched", "axis_name"
    ),
)
def _advi_segment(
    misfit_fn, prior, ref_mean, ref_chol, params, opt, key, t0,
    *, rank, n_mc, n_steps, n_total, lr, lr_decay, batched, axis_name=None,
):
    """n_steps Adam steps on the negative ELBO, one scan'd XLA program.

    Loss per step = mean_MC[nlp(Y)] - log|det L| (the mu-independent entropy
    constant dropped). The step size decays linearly from lr to lr*lr_decay
    over the n_total GLOBAL steps (t0 = this segment's global offset) — the
    stochastic-approximation schedule that parks the final iterate AT the
    optimum instead of in an lr-sized noise ball around it. axis_name: set
    inside shard_map — each device draws its own n_mc slice (the caller
    folds the axis index into `key`), local MC means combine by the repo's
    vma convention (grads of the replicated params arrive pre-psum'd;
    dividing by the axis size makes every term, including the replicated
    entropy, a cross-device mean). t0 also offsets the per-step RNG folds so
    segments never reuse keys."""
    # the samplers' whitened-frame nlp (infer/mala.py _make_nlp) without its
    # fused-vjp wrapper — value_and_grad below IS the reverse pass here
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    dtype = ref_mean.dtype
    Li = _inv_chol(prior.chol)

    def nlp_of(Y):
        theta = ref_mean + jnp.dot(Y, ref_chol.T, precision=hi)
        phi = misfit_fn(theta) if batched else jax.vmap(misfit_fn)(theta)
        w = jnp.dot(theta - prior.mean, Li.T, precision=hi)
        return phi + 0.5 * jnp.sum(w * w, axis=-1)

    def loss_fn(p, eps):
        L = _chol_of(p, rank)
        Y = p["mu"] + jnp.dot(eps, L.T, precision=hi)
        return jnp.mean(nlp_of(Y)) - _log_det(p, rank)

    def body(carry, i):
        p, o = carry
        eps = jax.random.normal(jax.random.fold_in(key, t0 + i), (n_mc, d), dtype)
        loss, grads = jax.value_and_grad(loss_fn)(p, eps)
        if axis_name is not None:
            # vma: replicated-param grads arrive psum'd over the mesh
            grads = jax.tree.map(lambda g: g / jax.lax.axis_size(axis_name), grads)
            loss = jax.lax.pmean(loss, axis_name)
        frac = (t0 + i).astype(dtype) / max(n_total, 1)
        lr_i = lr * (1.0 - (1.0 - lr_decay) * frac)
        p, o = adam_update(p, grads, o, lr_i)
        return (p, o), -loss  # ELBO up to the dropped entropy constant

    (params, opt), elbo = jax.lax.scan(
        body, (params, opt), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return params, opt, elbo


def run_advi(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_steps: int = 1500,
    n_mc: int = 32,
    rank: str = "full",
    lr: float = 0.05,
    lr_decay: float = 0.05,
    batched: bool = False,
    theta0: Optional[jax.Array] = None,
    ref=None,
    segment: Optional[int] = None,
) -> VIResult:
    """Fit q = N(mu, L L^T) in the whitened ref frame by maximizing the
    reparameterized ELBO; returns the fit pushed back to working
    coordinates. misfit_fn takes WORKING coordinates (compose to_theta
    outside, exactly like the samplers); batched=True means misfit_fn
    accepts the (n_mc, d) Monte Carlo batch directly.

    rank: 'full' (dense lower-triangular L — exact on Gaussian posteriors)
    or 'meanfield' (diagonal — cheaper, underestimates correlated
    marginals). lr decays linearly to lr*lr_decay over the run (the final
    iterate IS the estimate — no averaging needed). segment: scan chunk
    size (watchdog rule — each step costs n_mc fused forward+reverse
    passes; default one program, segment it for expensive likelihoods)."""
    if rank not in ("full", "meanfield"):
        raise ValueError(f"rank must be 'full' or 'meanfield', got {rank!r}")
    d = prior.dim
    hi = jax.lax.Precision.HIGHEST
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype

    # init: mu at theta0 (whitened), L at the identity (the ref frame's own
    # scale — the prior/Laplace frame is the natural unit ball)
    if theta0 is None:
        mu0 = jnp.zeros((d,), dtype)
    else:
        Li_ref = _inv_chol(ref_chol)
        mu0 = jnp.dot(theta0 - ref_mean, Li_ref.T, precision=hi)
    raw0 = jnp.zeros((d,) if rank == "meanfield" else (d, d), dtype)
    params = {"mu": mu0, "raw": raw0}
    opt = adam_init(params)

    seg = int(segment) if segment else n_steps
    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        params, opt, elbo = _advi_segment(
            misfit_fn, prior, ref_mean, ref_chol, params, opt, key, done,
            rank=rank, n_mc=n_mc, n_steps=this, n_total=n_steps, lr=lr,
            lr_decay=lr_decay, batched=batched,
        )
        traces.append(elbo)
        done += this

    L = _chol_of(params, rank)
    theta_mean = ref_mean + jnp.dot(params["mu"], ref_chol.T, precision=hi)
    theta_chol = jnp.dot(ref_chol, L, precision=hi)
    return VIResult(
        mu=params["mu"], L=L, theta_mean=theta_mean, theta_chol=theta_chol,
        elbo_trace=jnp.concatenate(traces), n_forward=n_mc * n_steps,
    )
