"""Model evidence by thermodynamic integration over the PT ladder
(SURVEY.md Appendix C: the three-way FOM / ROM / ROM+NN model comparison,
made quantitative as log Bayes factors).

The tempered samplers already simulate the whole path of distributions

    pi_lambda(theta) ∝ exp(-lambda Phi(theta)) mu0(theta),   lambda in (0, 1],

and the thermodynamic identity

    d/d lambda  log Z(lambda) = -E_{pi_lambda}[Phi]
    =>  log Z(1) = -∫_0^1 E_{pi_lambda}[Phi] d lambda      (Z(0) = 1)

turns the per-level post-burn mean misfits the samplers accumulate anyway
(`PTResult.phi_level_mean`) into the log evidence

    Z = ∫ exp(-Phi(theta)) mu0(d theta)

— the prior-predictive mass of the data under the misfit Phi, the quantity
whose ratios are Bayes factors between forward models evaluated on the SAME
data and prior. No extra sampling passes: one prior Monte-Carlo batch pins
the lambda -> 0 endpoint (E_{mu0}[Phi], exact iid draws), and the integral
is a trapezoid over the (sorted) ladder points. With `adapt_ladder` the
quadrature nodes are per chain group; the estimate is returned per group so
the cross-group spread doubles as a Monte-Carlo error bar.

TPU mapping: everything here is O(K*G) elementwise work on arrays the
sampler already returned; the only device work is the single batched
prior-misfit call.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.priors import GaussianPrior


class EvidenceEstimate(NamedTuple):
    log_z: float  # mean over chain groups
    log_z_std: float  # std of the per-group estimates (MC error bar)
    log_z_groups: jax.Array  # (G,) per-group estimates
    phi_prior_mean: float  # the lambda->0 endpoint E_mu0[Phi]


def prior_phi_moments(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    n: int = 4096,
    *,
    batched: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """(E_{mu0}[Phi], E_{mu0}[Phi^2]) by exact iid prior Monte Carlo — the
    lambda = 0 endpoint of the thermodynamic integral (the one point no
    tempered chain visits). misfit_fn takes WORKING coordinates, like the
    samplers."""
    th = prior.sample(key, (n,))
    phi = misfit_fn(th) if batched else jax.vmap(misfit_fn)(th)
    return jnp.mean(phi), jnp.mean(phi * phi)


def log_evidence_ti(
    lambdas: jax.Array,  # (K,) or (K, G) ladder, sorted ascending, lam[-1]=1
    phi_level_mean: jax.Array,  # (K, G) post-burn E_{pi_lambda}[Phi]
    phi_prior_mean: jax.Array,  # scalar E_{mu0}[Phi]
    phi2_level_mean: jax.Array | None = None,  # (K, G) E_{pi_lambda}[Phi^2]
    phi2_prior_mean: jax.Array | None = None,  # scalar E_{mu0}[Phi^2]
) -> EvidenceEstimate:
    """Thermodynamic integration per chain group.

    Nodes: (0, E_mu0[Phi]) then the ladder points. Without second moments
    this is the plain trapezoid; with them it is the two-point Hermite
    (corrected-trapezoid) rule using the thermodynamic identity
    dE/d lambda = -Var_lambda[Phi]:

        ∫_a^b E ≈ (h/2)(E_a + E_b) + (h²/12)(Var_b - Var_a),  h = b - a,

    which cancels the trapezoid's O(h²) bias. Measured (linear-Gaussian
    oracle): the corrected rule is exact-to-MC-error on geometric ladders
    at K >= 4 (plain trapezoid needs K ~ 12), but on swap-rate-adapted
    ladders — whose spacing is optimized for state exchange, not
    quadrature — a ~0.6 bias survives even with the correction. For those,
    use the stepping-stone estimator (log_evidence_ss), which has no
    quadrature error at all; TI remains the independent cross-check."""
    K, G = phi_level_mean.shape
    lam = jnp.broadcast_to(
        lambdas[:, None] if lambdas.ndim == 1 else lambdas, (K, G)
    ).astype(phi_level_mean.dtype)
    zero = jnp.zeros((1, G), lam.dtype)
    nodes = jnp.concatenate([zero, lam], axis=0)  # (K+1, G)
    vals = jnp.concatenate(
        [jnp.broadcast_to(phi_prior_mean, (1, G)).astype(lam.dtype), phi_level_mean],
        axis=0,
    )
    dl = jnp.diff(nodes, axis=0)  # (K, G)
    integral = jnp.sum(0.5 * (vals[1:] + vals[:-1]) * dl, axis=0)
    if phi2_level_mean is not None:
        e2_0 = (
            phi2_prior_mean
            if phi2_prior_mean is not None
            else phi_prior_mean * phi_prior_mean  # zero-variance fallback
        )
        e2 = jnp.concatenate(
            [jnp.broadcast_to(e2_0, (1, G)).astype(lam.dtype), phi2_level_mean],
            axis=0,
        )
        var = jnp.maximum(e2 - vals * vals, 0.0)
        integral = integral + jnp.sum((dl * dl / 12.0) * (var[1:] - var[:-1]), axis=0)
    log_z_groups = -integral
    return EvidenceEstimate(
        log_z=float(jnp.mean(log_z_groups)),
        log_z_std=float(jnp.std(log_z_groups)),
        log_z_groups=log_z_groups,
        phi_prior_mean=float(phi_prior_mean),
    )


def hot_panel_refinement(
    phi_prior: jax.Array,  # (n,) misfits of iid prior draws
    lam1: jax.Array,  # (G,) hottest ladder level per group
    n_sub: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """∫_0^{lam1} E_lambda[Phi] d lambda by self-normalized importance
    reweighting of ONE prior batch:

        E_lambda[Phi] = E_mu0[Phi e^{-lambda Phi}] / E_mu0[e^{-lambda Phi}],

    evaluated on n_sub log-dense sub-nodes and trapezoid-integrated. This is
    the panel no tempered chain covers — and precisely where reweighting is
    accurate (the weights e^{-lambda Phi} are flattest at small lambda).
    Helps when lambda_1 is coarse (shallow fixed ladders); on swap-rate-
    adapted ladders lambda_1 is usually already tiny and the residual TI
    bias lives in the INTERIOR panels — use log_evidence_ss there. Returns
    (integral (G,), weight-ESS fraction at lam1 (G,) — below ~0.1 the
    refinement itself is under-sampled and should be treated as rough)."""
    n = phi_prior.shape[0]
    # sub-nodes per group: lam1 * r^j with r spanning 3 decades
    expo = jnp.linspace(-3.0, 0.0, n_sub, dtype=phi_prior.dtype)  # (S,)
    nodes = lam1[None, :] * (10.0 ** expo)[:, None]  # (S, G)
    # log weights (S, G, n); subtract per-node max for stability
    lw = -nodes[..., None] * phi_prior[None, None, :]
    lw = lw - jnp.max(lw, axis=-1, keepdims=True)
    w = jnp.exp(lw)
    wsum = jnp.sum(w, axis=-1)
    e_nodes = jnp.sum(w * phi_prior[None, None, :], axis=-1) / wsum  # (S, G)
    ess_frac = (wsum**2 / jnp.sum(w * w, axis=-1)) / n  # (S, G)
    # trapezoid over [0, node_0] + [node_0 .. lam1]; E(0) is the plain mean
    e0 = jnp.mean(phi_prior)
    first = 0.5 * (e0 + e_nodes[0]) * nodes[0]
    dl = jnp.diff(nodes, axis=0)
    rest = jnp.sum(0.5 * (e_nodes[1:] + e_nodes[:-1]) * dl, axis=0)
    return first + rest, ess_frac[-1]


def log_evidence_ss(
    lambdas: jax.Array,  # (K,) or (K, G) ladder, sorted ascending, lam[-1]=1
    ss_level_mean: jax.Array,  # (K-1, G) E_{lambda_j}[e^{-(l_{j+1}-l_j) Phi}]
    phi_prior: jax.Array,  # (n,) misfits of iid prior draws
) -> EvidenceEstimate:
    """Stepping-stone evidence (Xie et al. 2011): telescope the per-level
    normalizing-constant ratios

        Z(l_{j+1}) / Z(l_j) = E_{pi_{l_j}}[exp(-(l_{j+1} - l_j) Phi)] ,

    which the tempered samplers accumulate in-scan (`ss_level_mean`), plus
    the prior-to-hottest ratio Z(l_1) = E_mu0[exp(-l_1 Phi)] from the iid
    prior batch. Unlike thermodynamic integration there is NO quadrature
    error — the estimator is consistent for ANY ladder spacing, and the
    0.234 swap-rate target the adaptive ladder enforces is exactly the
    moderate-overlap regime where each ratio has low variance (a swap and a
    stepping stone both hinge on exp(-d lambda * d Phi) being O(1))."""
    K = ss_level_mean.shape[0] + 1
    G = ss_level_mean.shape[1]
    lam = jnp.broadcast_to(
        lambdas[:, None] if lambdas.ndim == 1 else lambdas, (K, G)
    ).astype(phi_prior.dtype)
    n = phi_prior.shape[0]
    # log E_mu0[e^{-l_1 Phi}] per group, stably
    log_r0 = jax.scipy.special.logsumexp(
        -lam[0][:, None] * phi_prior[None, :], axis=-1
    ) - jnp.log(jnp.asarray(float(n), phi_prior.dtype))
    log_z_groups = log_r0 + jnp.sum(jnp.log(ss_level_mean), axis=0)
    e0 = jnp.mean(phi_prior)
    return EvidenceEstimate(
        log_z=float(jnp.mean(log_z_groups)),
        log_z_std=float(jnp.std(log_z_groups)),
        log_z_groups=log_z_groups,
        phi_prior_mean=float(e0),
    )


def log_evidence_from_pt(
    result,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_prior: int = 4096,
    batched: bool = True,
    method: str = "ss",
    refine_hot_panel: bool = True,
) -> EvidenceEstimate:
    """Evidence straight from a PTResult / PTMALAResult / PTDAResult, plus
    one prior Monte-Carlo batch. method="ss" (default): stepping-stone on
    the in-scan `ss_level_mean` ratios — no quadrature error on any ladder,
    including the swap-rate-adapted ones. method="ti": variance-corrected
    thermodynamic integration on `phi_level_mean`/`phi2_level_mean` with
    optional hot-panel importance refinement — a useful cross-check (the
    two estimators share no failure mode beyond the chains themselves).
    For PTDAResult the misfit_fn must be the FINE misfit (that is what the
    accumulated curves hold)."""
    th = prior.sample(key, (n_prior,))
    phi_prior = misfit_fn(th) if batched else jax.vmap(misfit_fn)(th)
    if method == "ss":
        return log_evidence_ss(result.lambdas, result.ss_level_mean, phi_prior)
    if method != "ti":
        raise ValueError(f"unknown evidence method {method!r} (use 'ss' or 'ti')")
    e0 = jnp.mean(phi_prior)
    est = log_evidence_ti(
        result.lambdas, result.phi_level_mean, e0,
        phi2_level_mean=getattr(result, "phi2_level_mean", None),
        phi2_prior_mean=jnp.mean(phi_prior * phi_prior),
    )
    if not refine_hot_panel:
        return est
    # replace the [0, lam1] trapezoid panel (including its Hermite term)
    # with the importance-refined integral
    K, G = result.phi_level_mean.shape
    lam = result.lambdas
    lam = jnp.broadcast_to(lam[:, None] if lam.ndim == 1 else lam, (K, G))
    lam1 = lam[0]
    e1 = result.phi_level_mean[0]
    coarse = 0.5 * (e0 + e1) * lam1
    phi2 = getattr(result, "phi2_level_mean", None)
    if phi2 is not None:
        var0 = jnp.maximum(jnp.mean(phi_prior * phi_prior) - e0 * e0, 0.0)
        var1 = jnp.maximum(phi2[0] - e1 * e1, 0.0)
        coarse = coarse + (lam1 * lam1 / 12.0) * (var1 - var0)
    refined, _ess = hot_panel_refinement(phi_prior, lam1)
    log_z_groups = est.log_z_groups + coarse - refined
    return EvidenceEstimate(
        log_z=float(jnp.mean(log_z_groups)),
        log_z_std=float(jnp.std(log_z_groups)),
        log_z_groups=log_z_groups,
        phi_prior_mean=float(e0),
    )
