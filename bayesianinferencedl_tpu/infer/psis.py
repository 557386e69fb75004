"""Pareto-smoothed importance sampling (PSIS): certify and correct the fast
posterior approximations (SURVEY.md §4 posterior-quality oracles extended to
the approximation layer; Vehtari, Simpson, Gelman, Yao, Gabry 2024).

The fast-approximation kernels (infer/vi.py ADVI, infer/eki.py EKI,
infer/map.py Laplace) return a Gaussian q that is exact only in the
linear-Gaussian limit. PSIS closes the gap: draw K samples from q, weight
them by w = p/q (unnormalized), smooth the heaviest tail weights by a fitted
generalized Pareto distribution, and estimate posterior expectations by the
self-normalized weighted average. Two things fall out:

- **Asymptotically exact moments** wherever q covers the posterior: the
  importance-weighted mean/covariance converge to the truth as K grows,
  turning a biased Gaussian fit into a consistent estimate for one more
  batched forward sweep.
- **A measurable quality gate**: the fitted Pareto shape k-hat IS the
  diagnostic. k < 0.5: reliable, plain CLT rates. 0.5 <= k < 0.7: usable,
  slower convergence. k >= 0.7: the proposal does NOT cover the posterior
  (variance effectively infinite) — the verdict every honest-contract
  docstring in this repo points to, now computed instead of assumed.

TPU mapping: the K draws are ONE batched forward through the identical
fused likelihood route the samplers use — the expensive physics stays on
device in a single dispatch; the order statistics, Pareto fit, and weighted
moments are O(K log K + K d) host f64 NumPy per the repo's offline-algebra
convention (CLAUDE.md rule 5 — tiny next to the forward sweep, and robust
tail quantile fitting wants f64).

The generalized Pareto fit is the Zhang & Stephens (2009) profile-posterior
estimator used by the reference PSIS implementation: b-grid profile over
the scale, posterior-mean b, analytic k given b, with the small-sample
prior regularization k <- (M k + 5)/(M + 10).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class PSISResult(NamedTuple):
    mean: np.ndarray  # (d,) importance-weighted posterior mean (working coords)
    cov: np.ndarray  # (d, d) importance-weighted posterior covariance
    k_hat: float  # Pareto tail shape: <0.5 good, 0.5-0.7 ok, >=0.7 FAIL
    ess: float  # importance-sampling effective sample size (Kong estimator)
    log_weights: np.ndarray  # (K,) smoothed, max-subtracted log weights
    samples: jax.Array  # (K, d) the proposal draws the weights refer to
    reliable: bool  # k_hat < 0.7 (the published usability threshold)
    log_evidence: float  # log E_mu0[exp(-Phi)] from the RAW weights —
    # unbiased in Z, same prior-predictive convention as infer/evidence.py
    # and infer/smc.py, so Bayes factors cross-check across all three
    # estimators. Trust it under the same k_hat gate as the moments.


def _gpd_fit(x: np.ndarray) -> tuple[float, float, float]:
    """Zhang-Stephens profile-posterior fit of the generalized Pareto to
    exceedances x > 0 (sorted ascending). Returns (xi, sigma, k_hat): xi is
    the STANDARD shape (heavy tail = positive; the b-grid spans negative b
    for heavy tails, where Zhang-Stephens' own k = -xi), sigma > 0, and
    k_hat is xi with the small-sample (n xi + 5)/(n + 10) regularization."""
    n = x.size
    if n < 5:
        return np.inf, np.nan, np.inf  # cannot certify a tail from <5 points
    m = 30 + int(np.sqrt(n))
    bs = 1.0 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    bs = bs / (3.0 * x[n // 4]) + 1.0 / x[-1]
    # profile log-likelihood of b, with the ZS-parameterization k(b)
    ks = -np.mean(np.log1p(-bs[:, None] * x[None, :]), axis=1)
    ls = n * (np.log(bs / ks) + ks - 1.0)
    ws = 1.0 / np.sum(np.exp(ls[None, :] - ls[:, None]), axis=1)
    b = float(np.sum(bs * ws))
    xi = float(np.mean(np.log1p(-b * x)))  # = -k_ZS: the standard shape
    sigma = -xi / b if b != 0.0 else np.nan
    k_hat = (n * xi + 5.0) / (n + 10.0)
    return xi, sigma, k_hat


def psis_smooth(log_w: np.ndarray) -> tuple[np.ndarray, float]:
    """Smooth the raw log importance weights: fit a generalized Pareto to
    the M = min(0.2 K, 3 sqrt(K)) largest, replace them by the fitted
    quantiles at (j - 0.5)/M (capped at the observed max), return
    (smoothed log_w, k_hat). Pure host f64 — order statistics and a 1-D
    profile fit."""
    lw = np.asarray(log_w, np.float64)
    K = lw.size
    lw = lw - lw.max()
    M = int(min(np.ceil(0.2 * K), 3.0 * np.sqrt(K)))
    if M < 5:
        return lw, np.inf
    order = np.argsort(lw)
    tail_idx = order[-M:]
    cut = lw[order[-M - 1]]  # weight just below the tail
    x = np.exp(lw[tail_idx]) - np.exp(cut)  # exceedances, already ascending
    # degenerate tail: (near-)constant weights leave only float noise above
    # the cut — there is no tail to fit (the GPD estimator would return an
    # arbitrary shape from numeric dust). That is the IDEAL case: report a
    # maximally light tail and smooth nothing.
    if x[-1] <= 0 or x[x.size // 4] <= 0 or x[-1] < 1e-10 * np.exp(cut):
        return lw, -np.inf
    xi, sigma, k_hat = _gpd_fit(x)
    if np.isfinite(k_hat) and np.isfinite(sigma) and sigma > 0:
        n = x.size
        q = (np.arange(1, n + 1) - 0.5) / n
        if abs(xi) < 1e-12:
            quant = -sigma * np.log1p(-q)
        else:
            quant = sigma / xi * (np.power(1.0 - q, -xi) - 1.0)
        smoothed = np.log(np.maximum(quant + np.exp(cut), 1e-300))
        smoothed = np.minimum(smoothed, 0.0)  # cap at the observed max (=0)
        out = lw.copy()
        out[tail_idx] = smoothed  # tail_idx is ascending in lw, q ascending
        out -= out.max()
        return out, k_hat
    return lw, k_hat


def psis_correct_draws(
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta: jax.Array,
    log_q: jax.Array,
    *,
    batched: bool = False,
    mesh=None,
) -> PSISResult:
    """PSIS certify-and-correct from EXPLICIT proposal draws: theta (K, d)
    samples from any proposal q over WORKING coordinates with their log
    density log_q (K,) in this module's convention — the (2 pi)^{d/2} base
    constant dropped, all determinants included (a Gaussian q = N(m, L L^T)
    reports -0.5|z|^2 - log|det L|; a flow reports the base log-density
    minus the accumulated log-determinant, infer/flow.py flow_sample).

    This is the proposal-agnostic core psis_correct wraps: one batched
    forward sweep for the misfit, host f64 tail smoothing, importance-
    weighted moments, k-hat gate, and the evidence estimate — identical
    semantics for Gaussian and flow proposals, so Bayes factors and
    reliability verdicts compare across the whole approximation layer."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if theta.shape[0] % mesh.size:
            raise ValueError(
                f"n_draws={theta.shape[0]} must divide by mesh size {mesh.size}"
            )
        theta = jax.device_put(
            theta, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        )

    # device: the physics — one batched misfit sweep
    phi = misfit_fn(theta) if batched else jax.vmap(misfit_fn)(theta)

    # host f64: log p (unnormalized) - log q
    th = np.asarray(theta, np.float64)
    phi64 = np.asarray(phi, np.float64)
    pm = np.asarray(prior.mean, np.float64)
    pc = np.asarray(prior.chol, np.float64)
    w_prior = np.linalg.solve(pc, (th - pm).T).T
    log_p = -phi64 - 0.5 * np.sum(w_prior * w_prior, axis=1)
    log_w_raw = log_p - np.asarray(log_q, np.float64)

    # Non-finite weights (a NaN/overflowed forward at an extreme proposal
    # draw — seen when a degenerate flow fit reaches unphysical parameter
    # space) would propagate NaN through the max-subtraction and poison
    # every output. Zero those draws out (-inf log weight: the posterior
    # density where the forward cannot even be evaluated is treated as 0)
    # and VOID the certificate — a proposal with mass where the model is
    # non-evaluable does not cover the posterior, whatever the fitted tail
    # shape says.
    bad = ~np.isfinite(log_w_raw)
    n_bad = int(bad.sum())
    if n_bad == log_w_raw.size:
        d = th.shape[1]
        return PSISResult(
            mean=np.full(d, np.nan), cov=np.full((d, d), np.nan),
            k_hat=np.inf, ess=0.0, log_weights=log_w_raw, samples=theta,
            reliable=False, log_evidence=-np.inf,
        )
    log_w_raw = np.where(bad, -np.inf, log_w_raw)

    # evidence from the RAW weights (unbiased in Z): the target above is
    # exp(-Phi) times the UNNORMALIZED prior density; dividing by the prior
    # normalization |det prior.chol| (the (2 pi)^{d/2} cancels against q's)
    # yields Z = E_mu0[exp(-Phi)] — the infer/evidence.py convention
    log_det_p = float(np.sum(np.log(np.abs(np.diag(pc)))))
    mx = log_w_raw.max()
    log_evidence = float(
        mx + np.log(np.mean(np.exp(log_w_raw - mx))) - log_det_p
    )

    log_w, k_hat = psis_smooth(log_w_raw)
    w = np.exp(log_w - log_w.max())
    w /= w.sum()
    mean = w @ th
    c = th - mean
    cov = (c * w[:, None]).T @ c / max(1.0 - float(w @ w), 1e-12)
    ess = float(1.0 / np.sum(w * w))
    return PSISResult(
        mean=mean, cov=cov, k_hat=float(k_hat), ess=ess,
        log_weights=log_w, samples=theta,
        reliable=bool(k_hat < 0.7) and n_bad == 0,
        log_evidence=log_evidence,
    )


def psis_correct(
    misfit_fn: Callable,
    prior: GaussianPrior,
    q_mean: jax.Array,
    q_chol: jax.Array,
    key: jax.Array,
    *,
    n_draws: int = 4096,
    batched: bool = False,
    mesh=None,
) -> PSISResult:
    """Importance-correct a Gaussian approximation q = N(q_mean, q_chol
    q_chol^T) over WORKING coordinates toward the exact posterior
    p ∝ exp(-misfit - prior) — one batched forward sweep + host tail
    smoothing. Accepts any (mean, chol) pair: a VIResult's
    (theta_mean, theta_chol), a Laplace fit, or moment-matched EKI output.

    Returns PSISResult with importance-weighted mean/cov, the k-hat
    diagnostic, and the smoothed weights for custom expectations.

    mesh: optional jax.sharding.Mesh — the draw axis shards over ICI for the
    forward sweep (embarrassingly parallel, the run_eki pattern; n_draws
    must divide by the mesh size). The O(K d) host algebra gathers."""
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    dtype = prior.mean.dtype
    q_mean = jnp.asarray(q_mean, dtype)
    q_chol = jnp.asarray(q_chol, dtype)

    eps = jax.random.normal(key, (n_draws, d), dtype)
    theta = q_mean + jnp.dot(eps, q_chol.T, precision=hi)
    # log q at theta: eps are exactly the whitened coords under q
    log_det_q = jnp.sum(jnp.log(jnp.abs(jnp.diag(q_chol))))
    log_q = -0.5 * jnp.sum(eps * eps, axis=1) - log_det_q
    return psis_correct_draws(
        misfit_fn, prior, theta, log_q, batched=batched, mesh=mesh
    )
