"""Stein variational gradient descent (SVGD): particle-transport posterior
approximation (SURVEY.md A.5 inversion layer — a beyond-reference
capability; Liu & Wang 2016, annealing per D'Angelo & Fortuin 2021).

Completes the approximation square next to EKI (derivative-free Gaussian
ansatz, infer/eki.py), ADVI (gradient-based Gaussian family, infer/vi.py)
and the flow fit (parametric non-Gaussian density, infer/flow.py): SVGD is
gradient-based AND nonparametric — J interacting particles follow the
kernelized Wasserstein gradient of KL(q||p), so the terminal ensemble can
be skewed, curved, or (with annealing) multi-basin without committing to
any density family. No density is fitted, so no PSIS certificate applies
(the k-hat gate needs an evaluable q); the honest check is the moment match
against the MCMC kernels, measured in tests/test_svgd.py.

TPU mapping: the particle ensemble IS the batch axis, and the interaction
is two (J, J) x (J, d) matmuls — MXU food. One SVGD step =
  1. one batched differentiable forward+reverse over all J particles (the
     identical fused vjp route MALA/HMC/ADVI use),
  2. the RBF kernel matrix K = exp(-|Y_i - Y_j|^2 / h) from one
     Gram matmul, with the bandwidth h re-derived every step by the median
     heuristic (jnp.median of the squared-distance matrix — a sort, fine on
     TPU),
  3. the Stein direction (K @ g + (2/h)(Y * rowsum(K) - K @ Y)) / J.
The whole optimization is one lax.scan'd XLA program (segmented for the
~60 s watchdog like every long scan in the repo), driven by Adam with the
same linearly-decaying step schedule ADVI uses.

Annealing (anneal_steps > 0) ramps the likelihood weight beta linearly
0 -> 1 over the first anneal_steps steps while the whitened-prior term
stays on: particles start spread over the prior (where the repulsion term
dominates and spaces them out) and the basins switch on gradually —
the standard fix for SVGD's mode-collapse failure on multimodal targets,
measured in tests/test_svgd.py::test_annealed_svgd_keeps_both_basins.

Honest contract (docs/SAMPLERS.md): SVGD is a biased approximation at
finite J — the kernelized repulsion underestimates tails/spread in high
dimensions (variance collapse grows with d/J), and an un-annealed run on a
multimodal target collapses to one basin. Means/spreads track the MCMC
reference on the fin posterior (tests); for certified posteriors run the
MCMC kernels. Frames: `ref=(mean, chol)` re-centers the whitening exactly
like ADVI/the samplers — particles transport in that frame and push back
affinely.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.models.surrogate import adam_init, adam_update


class SVGDResult(NamedTuple):
    particles: jax.Array  # (J, d) terminal ensemble, WORKING coordinates
    mean: jax.Array  # (d,) ensemble mean, working coordinates
    std: jax.Array  # (d,) ensemble marginal std (posterior spread estimate
    # — biased low at small J / large d; see module docstring)
    misfit_trace: jax.Array  # (n_steps,) ensemble-mean data misfit Phi
    n_forward: int  # total differentiable forward evaluations (J * steps)


def _stein_direction(Y, g, J_total):
    """Kernelized Stein update for rows Y given score rows g.

    Y: (J, d) particle block (the FULL ensemble — the sharded driver
    all-gathers before calling, see parallel/sharding.sharded_svgd).
    g: (J, d) score d/dY log p(Y). Returns (J, d) directions.

    RBF kernel with the per-step median bandwidth h = med(|dY|^2)/log(J+1)
    (the J diagonal zeros bias the median by O(1/J) — immaterial at the
    ensemble sizes used here and kept for one fewer masked sort).
    """
    hi = jax.lax.Precision.HIGHEST
    sq = jnp.sum(Y * Y, axis=-1)
    D = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(Y, Y.T, precision=hi)
    D = jnp.maximum(D, 0.0)
    h = jnp.median(D) / jnp.log(J_total + 1.0)
    h = jnp.maximum(h, 1e-8)
    K = jnp.exp(-D / h)
    drift = jnp.dot(K, g, precision=hi)
    repulse = (2.0 / h) * (Y * jnp.sum(K, axis=1)[:, None]
                           - jnp.dot(K, Y, precision=hi))
    return (drift + repulse) / J_total


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "n_steps", "n_total", "anneal_steps", "batched",
        "axis_name", "j_total",
    ),
)
def _svgd_segment(
    misfit_fn, prior, ref_mean, ref_chol, Y, opt, t0,
    *, n_steps, n_total, anneal_steps, lr, lr_decay, batched,
    axis_name=None, j_total=None,
):
    """n_steps Stein/Adam steps, one scan'd XLA program.

    Y: (J_local, d) particle block in the whitened ref frame. Deterministic
    given the initial ensemble — no per-step RNG. axis_name: set inside
    shard_map — the score pass runs on the local block (the physics, which
    is what sharding buys), then (Y, g) all-gather over ICI so every device
    forms the identical full-ensemble Stein direction and keeps its rows;
    arithmetic matches the unsharded path exactly (pinned in
    tests/test_svgd.py). The annealing schedule and lr decay run on the
    GLOBAL step index t0 + i so segmentation never changes the trajectory.
    """
    hi = jax.lax.Precision.HIGHEST
    dtype = ref_mean.dtype
    J_local = Y.shape[0]
    J = j_total if j_total is not None else J_local

    def nlp_sum(Yb, beta):
        theta = ref_mean + jnp.dot(Yb, ref_chol.T, precision=hi)
        phi = misfit_fn(theta) if batched else jax.vmap(misfit_fn)(theta)
        nlp = beta * phi + 0.5 * jnp.sum(Yb * Yb, axis=-1)
        return jnp.sum(nlp), phi

    def body(carry, i):
        Yc, o = carry
        frac = (t0 + i).astype(dtype)
        beta = jnp.where(
            anneal_steps > 0, jnp.minimum(1.0, (frac + 1.0) / max(anneal_steps, 1)),
            1.0,
        ).astype(dtype)
        # score of the (annealed) target: particles are independent through
        # the forward, so grad-of-sum IS the per-particle score stack
        (_, phi), g = jax.value_and_grad(nlp_sum, has_aux=True)(Yc, beta)
        g = -g
        if axis_name is not None:
            Y_all = jax.lax.all_gather(Yc, axis_name, tiled=True)
            g_all = jax.lax.all_gather(g, axis_name, tiled=True)
            direction = _stein_direction(Y_all, g_all, J)
            idx = jax.lax.axis_index(axis_name)
            direction = jax.lax.dynamic_slice_in_dim(
                direction, idx * J_local, J_local, axis=0
            )
            phi_mean = jax.lax.pmean(jnp.mean(phi), axis_name)
        else:
            direction = _stein_direction(Yc, g, J)
            phi_mean = jnp.mean(phi)
        lr_i = lr * (1.0 - (1.0 - lr_decay) * frac / max(n_total, 1))
        # Adam MINIMIZES: feed the negative Stein direction as the gradient
        Yc, o = adam_update(Yc, -direction, o, lr_i)
        return (Yc, o), phi_mean

    (Y, opt), phi_trace = jax.lax.scan(
        body, (Y, opt), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return Y, opt, phi_trace


def run_svgd(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_particles: int = 512,
    n_steps: int = 800,
    lr: float = 0.05,
    lr_decay: float = 0.05,
    anneal_steps: Optional[int] = None,
    batched: bool = False,
    theta0: Optional[jax.Array] = None,
    ref=None,
    segment: Optional[int] = None,
) -> SVGDResult:
    """Transport J = n_particles prior draws to the posterior by SVGD.

    misfit_fn takes WORKING coordinates (compose to_theta outside, exactly
    like the samplers); batched=True means misfit_fn accepts the whole
    (J, d) particle batch directly (the fused likelihood routes).

    anneal_steps: likelihood ramp length (default n_steps // 2; pass 0 to
    disable — full likelihood from step one, the classic SVGD that can
    collapse on multimodal targets). theta0: optional (J, d) working-coord
    initial ensemble (default: prior draws). segment: scan chunk size
    (watchdog rule — each step costs J fused forward+reverse passes).
    """
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype
    if anneal_steps is None:
        anneal_steps = n_steps // 2

    if theta0 is None:
        Y = jax.random.normal(key, (n_particles, d), dtype)
    else:
        from bayesianinferencedl_tpu.infer.mala import _inv_chol

        Y = jnp.dot(theta0 - ref_mean, _inv_chol(ref_chol).T, precision=hi)
    # J comes from the ACTUAL ensemble: a supplied theta0 overrides
    # n_particles, and n_forward must count what actually ran (ADVICE r3)
    n_particles = int(Y.shape[0])
    opt = adam_init(Y)

    seg = int(segment) if segment else n_steps
    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        Y, opt, tr = _svgd_segment(
            misfit_fn, prior, ref_mean, ref_chol, Y, opt,
            jnp.asarray(done, jnp.int32),
            n_steps=this, n_total=n_steps, anneal_steps=int(anneal_steps),
            lr=lr, lr_decay=lr_decay, batched=batched,
        )
        traces.append(tr)
        done += this

    particles = ref_mean + jnp.dot(Y, ref_chol.T, precision=hi)
    return SVGDResult(
        particles=particles,
        mean=jnp.mean(particles, axis=0),
        std=jnp.std(particles, axis=0),
        misfit_trace=jnp.concatenate(traces),
        n_forward=n_particles * n_steps,
    )
