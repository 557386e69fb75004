"""Normalizing-flow variational inference and flow-preconditioned (NeuTra)
MCMC (SURVEY.md A.5 inversion layer — a beyond-reference capability; Rezende
& Mohamed 2015, Hoffman et al. 2019 "NeuTra").

The Gaussian approximation layer (infer/vi.py ADVI, infer/map.py Laplace,
infer/eki.py moment-matched EKI) shares one structural ceiling: q is Gaussian
in the whitened frame, so a skewed, banana, or multimodal posterior is
approximated by the nearest ellipsoid — and the PSIS gate (infer/psis.py)
can only certify *coverage where q has support*, so a cleanly missed far
basin passes k-hat while holding half the mass (the mode-missing blind spot,
pinned by tests/test_flow.py::test_psis_mode_missing_blind_spot — the PSIS
analog of SBC's data-averaged blind spot, infer/sbc.py).

This module removes the family ceiling instead of the gate: q = push-forward
of N(0, I) through an invertible RealNVP-style coupling flow whose FIRST
layer is exactly ADVI's full-rank affine map (mu + L z), so flow-VI strictly
contains full-rank ADVI (zero-initialized couplings ARE the identity) and
falls back to it gracefully when the posterior is Gaussian. Two consumers:

- **Flow-VI**, two training directions with MEASURED domains of validity
  (tests/test_flow.py): `run_flow_vi` maximizes the reparameterized ELBO
  (reverse KL; the log-determinant of a coupling is the sum of its bounded
  log-scales — analytic, no Jacobian materialization) with an optional
  tempering ramp (`anneal_steps`) — right for unimodal non-Gaussian
  targets, but on well-separated basins EVERY annealed schedule tried
  collapses to one mode, and so does a short refinement warm-started from a
  perfectly covering fit: within the coupling family, reverse KL's penalty
  on the thin inter-mode bridge mass exceeds the log-2 gain of coverage.
  The production multimodal route is therefore `fit_flow_mle` — forward-KL
  (mass-covering) maximum likelihood on a particle population from the
  estimators this repo already trusts (tempered SMC, PT cold samples, an
  EKI ensemble), where a dropped basin costs unbounded NLL on that basin's
  particles and collapse is structurally impossible.
- **NeuTra** (`neutra_misfit` + `run_neutra_pcn`): re-express the EXACT
  posterior in the flow's latent coordinates, p(Z) ∝ exp(-nlp(theta(Z)) +
  logdet J(Z)), and run any existing kernel there against a standard-normal
  reference measure. The flow flattens the geometry the kernel sees —
  basins the flow connects through latent space become one pCN-traversable
  blob — while MH keeps exactness regardless of flow quality (a bad flow
  costs mixing, never correctness). With the identity flow this reduces
  EXACTLY to the ordinary whitened pCN kernel.

TPU mapping: identical to ADVI — the n_mc Monte Carlo draws are the batch
axis; each training step is one batched differentiable forward over
(n_mc, d) plus a handful of tiny MLP matmuls (couplings are (n_mc, d/2) x
(d/2, hidden) — MXU work), the whole optimization one lax.scan'd XLA
program, segmented for the watchdog. The flow's parameters are O(n_couplings
* hidden * d) floats — replicated, updated identically on every device when
the MC axis shards over the mesh (parallel/sharding.sharded_flow_vi).

Honest contract: flow-VI is still variational — certify with PSIS
(`flow_psis_certify` draws carry exact log q via the base density minus the
accumulated log-determinant) and remember the blind spot above; for certified
posteriors run the MCMC kernels (NeuTra makes them cheaper, not optional).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.mala import _inv_chol
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.models.surrogate import MLP, adam_init, adam_update

_HI = jax.lax.Precision.HIGHEST


class CouplingFlow(NamedTuple):
    """Static flow architecture; params are a separate pytree.

    Layer 0 is a full-rank affine map Y = mu + L z (exactly the ADVI family,
    infer/vi.py), followed by `n_couplings` affine coupling layers with
    alternating even/odd masks: the active half is scaled/shifted by an MLP
    of the passive half, log-scales bounded to (-s_max, s_max) by tanh so
    the map (and its log-determinant) stays Lipschitz — the NeuTra potential
    is then bounded below and gradient kernels stay stable."""

    dim: int
    n_couplings: int = 6
    hidden: int = 32
    s_max: float = 3.0

    def _mask_ids(self, layer: int):
        ids = np.arange(self.dim)
        active = ids[(ids + layer) % 2 == 0]
        passive = ids[(ids + layer) % 2 == 1]
        return active, passive

    def _mlp(self, layer: int) -> MLP:
        active, passive = self._mask_ids(layer)
        return MLP(
            sizes=(len(passive), self.hidden, self.hidden, 2 * len(active)),
            activation="tanh",
        )

    def init(self, key: jax.Array, dtype=jnp.float32):
        """Identity-initialized params: affine layer at (mu=0, L=I) and every
        coupling MLP with a ZERO last layer, so flow(Z) = Z and logdet = 0 —
        training starts from the whitened reference frame itself."""
        if self.dim < 2 and self.n_couplings > 0:
            raise ValueError("coupling layers need dim >= 2 (use n_couplings=0)")
        couplings = []
        for layer in range(self.n_couplings):
            key, sub = jax.random.split(key)
            p = self._mlp(layer).init(sub, dtype)
            W, b = p[-1]
            p[-1] = (jnp.zeros_like(W), jnp.zeros_like(b))
            couplings.append(p)
        return {
            "mu": jnp.zeros((self.dim,), dtype),
            "raw": jnp.zeros((self.dim, self.dim), dtype),
            "couplings": couplings,
        }

    def _affine_chol(self, params):
        raw = params["raw"]
        return jnp.tril(raw, -1) + jnp.diag(jnp.exp(jnp.diag(raw)))

    def forward(self, params, Z: jax.Array):
        """Y = f(Z) with log|det df/dZ|; Z: (..., d) -> (Y, logdet (...,))."""
        L = self._affine_chol(params)
        Y = params["mu"] + jnp.dot(Z, L.T, precision=_HI)
        logdet = jnp.sum(jnp.diag(params["raw"])) + jnp.zeros(Z.shape[:-1], Z.dtype)
        for layer in range(self.n_couplings):
            active, passive = self._mask_ids(layer)
            st = self._mlp(layer).apply(params["couplings"][layer], Y[..., passive])
            s = self.s_max * jnp.tanh(st[..., : len(active)] / self.s_max)
            t = st[..., len(active):]
            Y = Y.at[..., active].set(Y[..., active] * jnp.exp(s) + t)
            logdet = logdet + jnp.sum(s, axis=-1)
        return Y, logdet

    def inverse(self, params, Y: jax.Array):
        """Z = f^{-1}(Y) with log|det df/dZ| AT that Z (so forward(inverse(Y))
        round-trips both values). Couplings invert analytically; the affine
        layer by one triangular solve."""
        logdet = jnp.zeros(Y.shape[:-1], Y.dtype)
        for layer in reversed(range(self.n_couplings)):
            active, passive = self._mask_ids(layer)
            st = self._mlp(layer).apply(params["couplings"][layer], Y[..., passive])
            s = self.s_max * jnp.tanh(st[..., : len(active)] / self.s_max)
            t = st[..., len(active):]
            Y = Y.at[..., active].set((Y[..., active] - t) * jnp.exp(-s))
            logdet = logdet + jnp.sum(s, axis=-1)
        L = self._affine_chol(params)
        # batched triangular solve as a matmul against the (d, d) inverse —
        # d is small and this handles arbitrary leading batch dims
        Z = jnp.dot(Y - params["mu"], _inv_chol(L).T, precision=_HI)
        logdet = logdet + jnp.sum(jnp.diag(params["raw"]))
        return Z, logdet


class FlowVIResult(NamedTuple):
    flow: CouplingFlow  # static architecture
    params: dict  # trained flow parameters (latent frame = whitened ref)
    ref_mean: jax.Array  # (d,) frame pushing latent Y to working coordinates
    ref_chol: jax.Array  # (d, d)
    elbo_trace: jax.Array  # (n_steps,) per-step MC ELBO (up to a constant)
    theta_mean: jax.Array  # (d,) MC moment summary in WORKING coordinates
    theta_cov: jax.Array  # (d, d) MC covariance (reporting only — sample
    # from the flow via flow_sample for anything downstream)
    n_forward: int  # total differentiable forward evaluations


def flow_sample(
    res: FlowVIResult, key: jax.Array, shape=(), *, with_logq: bool = False,
    base_scale: float = 1.0,
):
    """Draw theta ~ q_flow in WORKING coordinates. with_logq=True also
    returns log q(theta) in the psis.py convention (the (2 pi)^{d/2} base
    constant dropped, frame determinant included) — exact, because the draws
    carry their own latent coordinates.

    base_scale > 1 widens the BASE distribution to N(0, base_scale^2 I)
    before the flow push — defensive importance sampling: the pushed-forward
    proposal inherits fatter tails everywhere while log q stays exact, the
    standard cure when a fit is mildly under-dispersed and k-hat sits just
    above the gate (flow_psis_certify(base_scale=...))."""
    d = res.flow.dim
    dtype = res.ref_mean.dtype
    s = jnp.asarray(base_scale, dtype)
    Z = s * jax.random.normal(key, (*shape, d), dtype)
    Y, logdet = res.flow.forward(res.params, Z)
    theta = res.ref_mean + jnp.dot(Y, res.ref_chol.T, precision=_HI)
    if not with_logq:
        return theta
    log_det_ref = jnp.sum(jnp.log(jnp.abs(jnp.diag(res.ref_chol))))
    log_q = (
        -0.5 * jnp.sum((Z / s) ** 2, axis=-1)
        - d * jnp.log(s) - logdet - log_det_ref
    )
    return theta, log_q


@partial(
    jax.jit,
    static_argnames=(
        "misfit_fn", "flow", "n_mc", "n_steps", "n_total", "anneal_steps",
        "batched", "axis_name",
    ),
)
def _flow_segment(
    misfit_fn, prior, ref_mean, ref_chol, flow, params, opt, key, t0,
    *, n_mc, n_steps, n_total, anneal_steps, lambda0, lr, lr_decay, batched,
    axis_name=None,
):
    """n_steps Adam steps on the negative annealed ELBO, one scan'd program.

    Loss per step = mean_MC[lambda_t * phi + prior_nlp](theta(f(Z))) -
    mean_MC[logdet f] (base entropy constant dropped). lambda_t ramps
    geometrically lambda0 -> 1 over the first anneal_steps GLOBAL steps —
    the flow covers the tempered (flattened) posterior first, then tracks it
    as the likelihood sharpens, which is what defeats mode-seeking collapse
    (same diagnosis as infer/tempering.py, applied to the variational
    objective). Sharding conventions identical to vi._advi_segment."""
    d = prior.dim
    dtype = ref_mean.dtype
    Li = _inv_chol(prior.chol)

    def parts_of(Y):
        theta = ref_mean + jnp.dot(Y, ref_chol.T, precision=_HI)
        phi = misfit_fn(theta) if batched else jax.vmap(misfit_fn)(theta)
        w = jnp.dot(theta - prior.mean, Li.T, precision=_HI)
        return phi, 0.5 * jnp.sum(w * w, axis=-1)

    def loss_fn(p, eps, lam):
        Y, logdet = flow.forward(p, eps)
        phi, prior_nlp = parts_of(Y)
        # the TRUE (lambda=1) negative ELBO is reported for the trace; the
        # annealed one is what we differentiate
        nelbo_t = jnp.mean(lam * phi + prior_nlp) - jnp.mean(logdet)
        nelbo_1 = jnp.mean(phi + prior_nlp) - jnp.mean(logdet)
        return nelbo_t, nelbo_1

    def body(carry, i):
        p, o = carry
        eps = jax.random.normal(jax.random.fold_in(key, t0 + i), (n_mc, d), dtype)
        g = (t0 + i).astype(dtype)
        if anneal_steps > 0:
            frac = jnp.minimum(g / anneal_steps, 1.0)
            lam = jnp.exp(jnp.log(jnp.asarray(lambda0, dtype)) * (1.0 - frac))
        else:
            lam = jnp.asarray(1.0, dtype)
        (loss, elbo1), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, eps, lam)
        if axis_name is not None:
            grads = jax.tree.map(lambda x: x / jax.lax.axis_size(axis_name), grads)
            elbo1 = jax.lax.pmean(elbo1, axis_name)
        frac_lr = g / max(n_total, 1)
        lr_i = lr * (1.0 - (1.0 - lr_decay) * frac_lr)
        p, o = adam_update(p, grads, o, lr_i)
        return (p, o), -elbo1

    (params, opt), elbo = jax.lax.scan(
        body, (params, opt), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return params, opt, elbo


def run_flow_vi(
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_couplings: int = 6,
    hidden: int = 32,
    n_steps: int = 3000,
    n_mc: int = 64,
    lr: float = 0.01,
    lr_decay: float = 0.05,
    anneal_steps: Optional[int] = None,
    lambda0: float = 0.05,
    batched: bool = False,
    ref=None,
    segment: Optional[int] = None,
    params=None,
    n_summary: int = 4096,
) -> FlowVIResult:
    """Fit the coupling-flow family by annealed reparameterized ELBO ascent;
    returns the trained flow plus a Monte Carlo moment summary in working
    coordinates. misfit_fn takes WORKING coordinates (compose to_theta
    outside, exactly like run_advi); batched=True means it accepts the
    (n_mc, d) batch directly.

    anneal_steps: misfit tempering ramp (default n_steps // 2; 0 disables —
    plain mode-seeking ELBO, appropriate for unimodal posteriors). NOTE the
    measured limit (tests/test_flow.py): on well-separated modes EVERY
    annealed reverse-KL schedule tried still collapses to one basin — for
    multimodal targets pretrain mass-covering with fit_flow_mle on an
    SMC/PT/EKI population and pass the result as `params` with a SHORT
    refinement here (anneal_steps=0). n_couplings=0 degenerates to
    full-rank ADVI with the MC entropy estimator.
    params: optional warm start (e.g. a fit_flow_mle result's)."""
    if n_steps <= 0:
        raise ValueError("run_flow_vi needs n_steps > 0")
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype
    flow = CouplingFlow(dim=d, n_couplings=n_couplings, hidden=hidden)
    k_init, k_run, k_sum = jax.random.split(key, 3)
    if params is None:
        params = flow.init(k_init, dtype)
    opt = adam_init(params)
    if anneal_steps is None:
        anneal_steps = n_steps // 2

    seg = int(segment) if segment else n_steps
    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        params, opt, elbo = _flow_segment(
            misfit_fn, prior, ref_mean, ref_chol, flow, params, opt, k_run,
            done, n_mc=n_mc, n_steps=this, n_total=n_steps,
            anneal_steps=anneal_steps, lambda0=lambda0, lr=lr,
            lr_decay=lr_decay, batched=batched,
        )
        traces.append(elbo)
        done += this

    res = FlowVIResult(
        flow=flow, params=params, ref_mean=ref_mean, ref_chol=ref_chol,
        elbo_trace=jnp.concatenate(traces),
        theta_mean=jnp.zeros((d,), dtype), theta_cov=jnp.eye(d, dtype=dtype),
        n_forward=n_mc * n_steps,
    )
    th = flow_sample(res, k_sum, (n_summary,))
    mean = jnp.mean(th, axis=0)
    c = th - mean
    cov = jnp.dot(c.T, c, precision=_HI) / (n_summary - 1)
    return res._replace(theta_mean=mean, theta_cov=cov)


@partial(jax.jit, static_argnames=("flow", "n_batch", "n_steps", "n_total"))
def _mle_segment(
    flow, params, opt, Yp, w, jit_scale, key, t0,
    *, n_batch, n_steps, n_total, lr, lr_decay,
):
    """n_steps Adam steps on the weighted negative log-likelihood of the
    (whitened) particles under the flow — one scan'd XLA program. Each step
    resamples a minibatch of n_batch particle indices by their weights
    (uniform weights = plain bootstrap minibatching), adds FRESH jitter
    eps * jit_scale (per-dim; the KDE smoothing that makes the target a
    proper density — see fit_flow_mle), inverts the flow analytically, and
    scores against the base: -log q(y) = 0.5|f^{-1}(y)|^2 + logdet(f at
    that preimage) + const."""
    n = Yp.shape[0]
    d = Yp.shape[1]
    mu_w, sd_w, h = jit_scale  # Liu-West kernel: (per-dim mean, std, bandwidth)
    a = jnp.sqrt(jnp.maximum(1.0 - h * h, 0.0))

    def nll(p, yb):
        Z, logdet = flow.inverse(p, yb)
        return jnp.mean(0.5 * jnp.sum(Z * Z, axis=-1) + logdet)

    def body(carry, i):
        p, o = carry
        k = jax.random.fold_in(key, t0 + i)
        k_idx, k_jit = jax.random.split(k)
        idx = jax.random.choice(k_idx, n, (n_batch,), replace=True, p=w)
        eps = jax.random.normal(k_jit, (n_batch, d), Yp.dtype)
        yb = mu_w + a * (Yp[idx] - mu_w) + h * sd_w * eps
        loss, grads = jax.value_and_grad(nll)(p, yb)
        frac = (t0 + i).astype(Yp.dtype) / max(n_total, 1)
        lr_i = lr * (1.0 - (1.0 - lr_decay) * frac)
        p, o = adam_update(p, grads, o, lr_i)
        return (p, o), loss

    (params, opt), nll_trace = jax.lax.scan(
        body, (params, opt), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return params, opt, nll_trace


def fit_flow_mle(
    particles: jax.Array,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    weights: Optional[jax.Array] = None,
    n_couplings: int = 6,
    hidden: int = 32,
    n_steps: int = 2000,
    n_batch: int = 256,
    lr: float = 0.01,
    lr_decay: float = 0.05,
    jitter: Optional[float] = None,
    ref=None,
    params=None,
    n_summary: int = 4096,
) -> FlowVIResult:
    """Fit the flow by (weighted) maximum likelihood on posterior particles —
    the FORWARD-KL direction, which is mass-covering where the ELBO's
    reverse KL is mode-seeking. This is the collapse-proof route to a
    multimodal flow: any particle population that touches every basin (an
    SMC population, infer/smc.py; PT cold-level samples, infer/tempering.py;
    an EKI ensemble, infer/eki.py) pins mass there, because a basin the flow
    drops costs unbounded NLL on that basin's particles — measured on the
    bimodal oracle in tests/test_flow.py, where every annealed reverse-KL
    schedule tried collapses to one mode and MLE never does.

    particles: (N, d) in WORKING coordinates; weights: optional (N,)
    importance weights (e.g. an SMC population's), normalized internally.
    jitter: smoothing bandwidth h of the Liu-West shrinkage kernel — each
    minibatch draw is replaced by mu + sqrt(1-h^2)(y-mu) + h*sd*eps with
    FRESH eps, so the MLE target is a covariance-preserving kernel density
    (a proper density), not the empirical atom measure. Load-bearing, not
    cosmetic: a resampled SMC population at tight noise can carry only
    dozens of UNIQUE points (mutation acceptance collapses at cold
    temperatures), and exact MLE on atoms is degenerate — the flow gains
    unbounded likelihood collapsing onto them while stretching wildly
    between (measured: 32 unique points tiled to 4096 -> sample std up to
    1400x the truth; a small fixed 5% jitter without shrinkage still blew
    up 1.8e4x). None (default) = Silverman's bandwidth from the UNIQUE
    row count, (4/(d+2))^(1/(d+4)) * n_unique^(-1/(d+4)) capped at 0.8 —
    wide exactly when the population is degenerate, with zero covariance
    bias by the shrinkage construction. jitter=0 disables entirely.
    params: optional warm start (e.g. continue from a previous fit).
    Production composition (api.run_flow_vi_inversion): tempered SMC for a
    rough-but-everywhere population -> fit_flow_mle -> flow_psis_certify,
    with NO reverse-KL refinement — measured on the bimodal oracle, even a
    short ELBO polish from a perfectly covering warm start re-collapses to
    one basin (within this family the reverse-KL cost of the thin
    inter-mode bridge exceeds the log-2 gain of covering both; the MLE fit
    keeps the bridge because the particles pin the basins)."""
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype
    flow = CouplingFlow(dim=d, n_couplings=n_couplings, hidden=hidden)
    k_init, k_run, k_sum = jax.random.split(key, 3)
    if params is None:
        params = flow.init(k_init, dtype)
    opt = adam_init(params)

    Li_ref = _inv_chol(ref_chol)
    Yp = jnp.dot(jnp.asarray(particles, dtype) - ref_mean, Li_ref.T, precision=_HI)
    if weights is None:
        w = jnp.full((Yp.shape[0],), 1.0 / Yp.shape[0], dtype)
    else:
        w = jnp.asarray(weights, dtype)
        w = w / jnp.sum(w)

    # Liu-West kernel in the whitened frame: per-dim weighted moments + a
    # Silverman bandwidth from the UNIQUE row count (host — the population
    # is already host-sized data)
    mu_w = jnp.sum(w[:, None] * Yp, axis=0)
    var_w = jnp.sum(w[:, None] * (Yp - mu_w) ** 2, axis=0)
    sd_w = jnp.sqrt(jnp.maximum(var_w, jnp.finfo(dtype).tiny))
    if jitter is None:
        n_unique = np.unique(np.asarray(Yp), axis=0).shape[0]
        h = min(
            0.8,
            (4.0 / (d + 2)) ** (1.0 / (d + 4)) * n_unique ** (-1.0 / (d + 4)),
        )
    else:
        h = float(jitter)
    jit_scale = (mu_w, sd_w, jnp.asarray(h, dtype))

    params, opt, nll_trace = _mle_segment(
        flow, params, opt, Yp, w, jit_scale, k_run, 0,
        n_batch=n_batch, n_steps=n_steps, n_total=n_steps, lr=lr,
        lr_decay=lr_decay,
    )

    res = FlowVIResult(
        flow=flow, params=params, ref_mean=ref_mean, ref_chol=ref_chol,
        elbo_trace=-nll_trace,  # NLL trace (sign-flipped: improvement is up)
        theta_mean=jnp.zeros((d,), dtype), theta_cov=jnp.eye(d, dtype=dtype),
        n_forward=0,
    )
    th = flow_sample(res, k_sum, (n_summary,))
    mean = jnp.mean(th, axis=0)
    c = th - mean
    cov = jnp.dot(c.T, c, precision=_HI) / (n_summary - 1)
    return res._replace(theta_mean=mean, theta_cov=cov)


def flow_fit_pipeline(
    misfit_b: Callable,
    misfit_bd: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_couplings: int = 6,
    hidden: int = 32,
    pretrain: str = "smc",
    pretrain_particles: int = 2048,
    pretrain_steps: int = 2000,
    n_mutations: int = 5,
    max_stages: int = 64,
    n_steps: Optional[int] = None,
    n_mc: int = 64,
    lr: float = 0.003,
    anneal_steps: Optional[int] = None,
    mesh=None,
) -> tuple[FlowVIResult, Optional[int]]:
    """The production flow-fit composition, shared by the five-param and
    full-field API layers: tempered SMC (infer/smc.py, islands over the
    mesh) -> mass-covering MLE distillation -> optional reverse-KL ELBO
    refinement (OFF by default after pretraining — measured to re-collapse
    covering fits; see fit_flow_mle). misfit_b: batched non-differentiable
    misfit (the fast likelihood route, for SMC); misfit_bd: batched
    differentiable misfit (for the ELBO direction). Returns
    (FlowVIResult, smc_stages_or_None).

    max_stages: the SMC tempering-stage bound. Tight-noise posteriors need
    a LONG adaptive schedule (the lambda range scales like 1/noise^2 —
    measured on the 1e-3-noise fin, 64 stages is NOT enough), and a
    population stopped at lambda < 1 is a hot, too-wide pseudo-posterior
    that silently poisons the MLE fit — so an unfinished schedule raises
    here instead of returning garbage."""
    if pretrain not in ("smc", "none"):
        raise ValueError(f"pretrain must be 'smc' or 'none', got {pretrain!r}")
    k_smc, k_mle, k_run = jax.random.split(key, 3)
    params = None
    n_stages = None
    res = None
    if n_steps is None:
        n_steps = 0 if pretrain == "smc" else 3000
    if pretrain == "smc":
        from bayesianinferencedl_tpu.infer.smc import run_smc

        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_smc

            smc_res, _ = sharded_smc(
                mesh, misfit_b, prior, k_smc,
                n_particles=pretrain_particles, n_mutations=n_mutations,
                max_stages=max_stages, batched=True,
            )
        else:
            smc_res = run_smc(
                misfit_b, prior, k_smc,
                n_particles=pretrain_particles, n_mutations=n_mutations,
                max_stages=max_stages, batched=True,
            )
        n_stages = int(np.max(np.asarray(smc_res.n_stages)))
        lam_final = float(np.min(np.asarray(smc_res.lambdas)[..., -1]))
        if n_stages >= max_stages and lam_final < 1.0:
            raise RuntimeError(
                f"SMC pretraining hit max_stages={max_stages} at lambda="
                f"{lam_final:.3e} < 1: the population is a hot (too-wide) "
                "pseudo-posterior and the MLE fit would inherit it. Raise "
                "max_stages (tight-noise posteriors need a long adaptive "
                "schedule) and/or n_mutations."
            )
        res = fit_flow_mle(
            smc_res.particles, prior, k_mle,
            n_couplings=n_couplings, hidden=hidden, n_steps=pretrain_steps,
        )
        params = res.params
        anneal_steps = 0  # warm-started refinement never re-anneals

    if n_steps > 0 or res is None:
        kwargs = dict(
            n_couplings=n_couplings, hidden=hidden, n_steps=n_steps,
            n_mc=n_mc, lr=lr, anneal_steps=anneal_steps, batched=True,
            params=params,
        )
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_flow_vi

            res = sharded_flow_vi(mesh, misfit_bd, prior, k_run, **kwargs)
        else:
            res = run_flow_vi(misfit_bd, prior, k_run, **kwargs)
    return res, n_stages


def flow_psis_certify(
    misfit_fn: Callable,
    prior: GaussianPrior,
    res: FlowVIResult,
    key: jax.Array,
    *,
    n_draws: int = 4096,
    batched: bool = False,
    base_scale: float = 1.0,
    mesh=None,
):
    """PSIS certify-and-correct for a flow fit (infer/psis.py with the flow
    as the proposal): the draws carry exact log q via their own latent
    coordinates, so no density inversion is needed. Returns PSISResult —
    same k-hat gate, same evidence convention (and the same mode-missing
    blind spot; see the module docstring). base_scale > 1 certifies with a
    base-widened proposal (defensive IS — see flow_sample), the move when
    k-hat sits just above the gate from mild under-dispersion."""
    from bayesianinferencedl_tpu.infer.psis import psis_correct_draws

    theta, log_q = flow_sample(
        res, key, (n_draws,), with_logq=True, base_scale=base_scale
    )
    return psis_correct_draws(
        misfit_fn, prior, theta, log_q, batched=batched, mesh=mesh
    )


def neutra_misfit(
    res: FlowVIResult,
    misfit_fn: Callable,
    prior: GaussianPrior,
    *,
    batched: bool = False,
):
    """Re-express the exact posterior in the flow's latent coordinates.

    Returns (misfit_Z, base_prior, to_theta): running ANY kernel in this repo
    with (misfit_Z, base_prior) over Z targets p(Z) ∝ exp(-Phi(theta(Z)) -
    prior_nlp(theta(Z)) + logdet f(Z)) — the exact pullback of the posterior,
    so pushed-forward samples to_theta(Z) are exact posterior draws whatever
    the flow's quality. base_prior is N(0, I): pCN proposals in Z are then
    FLOW-PRECONDITIONED (the reference measure is the flow's own base), and
    with the identity flow everything reduces to the ordinary whitened
    kernel. misfit_Z is differentiable — MALA/HMC work too (one extra tiny
    MLP pullback per gradient).

    The returned misfit_Z is batched iff the input misfit is wrapped
    accordingly: batched=True means misfit_fn takes (B, d) directly (and
    misfit_Z then also takes (B, d))."""
    Li = _inv_chol(prior.chol)

    def theta_of(Z):
        Y, logdet = res.flow.forward(res.params, Z)
        theta = res.ref_mean + jnp.dot(Y, res.ref_chol.T, precision=_HI)
        return theta, logdet

    def to_theta(Z):
        return theta_of(Z)[0]

    def misfit_Z(Z):
        theta, logdet = theta_of(Z)
        # same arity either way: the kernels vmap an unbatched misfit_Z
        # themselves, and the flow push handles any leading batch dims
        phi = misfit_fn(theta)
        w = jnp.dot(theta - prior.mean, Li.T, precision=_HI)
        prior_nlp = 0.5 * jnp.sum(w * w, axis=-1)
        base_nlp = 0.5 * jnp.sum(Z * Z, axis=-1)
        return phi + prior_nlp - logdet - base_nlp

    base_prior = GaussianPrior.iid(prior.dim, mean=0.0, sigma=1.0,
                                   dtype=prior.mean.dtype)
    return misfit_Z, base_prior, to_theta


def run_neutra_pcn(
    res: FlowVIResult,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_chains: int = 256,
    n_steps: int = 2000,
    n_burn: int = 1000,
    beta: float = 0.3,
    thin: int = 1,
    batched: bool = False,
):
    """Flow-preconditioned pCN: the exact posterior sampled in the flow's
    latent space (Hoffman et al. 2019's NeuTra, with pCN as the kernel —
    gradient-free, so the per-step cost is ONE forward plus the tiny flow
    push). Chains start from the flow's own base draws (the variational fit
    IS the warm start). Returns (PCNResult with .samples already pushed to
    WORKING coordinates, accept_rate info dict).

    Why this exists next to pt_pcn: tempering buys convergence with K extra
    replica ladders; NeuTra buys it with an offline flow fit — per-step cost
    stays ONE misfit evaluation. When the flow has genuinely connected the
    basins, latent pCN crosses them freely (tests/test_flow.py pins a case
    plain pCN fails at matched budget)."""
    from bayesianinferencedl_tpu.infer.pcn import run_pcn

    misfit_Z, base_prior, to_theta = neutra_misfit(
        res, misfit_fn, prior, batched=batched
    )
    k0, k_run = jax.random.split(key)
    Z0 = jax.random.normal(k0, (n_chains, prior.dim), res.ref_mean.dtype)
    out = run_pcn(
        misfit_Z, base_prior, Z0, k_run,
        n_steps=n_steps, n_burn=n_burn, beta=beta, thin=thin, batched=batched,
    )
    # push kept latent samples to working coordinates (exact, per-draw).
    # Chunked along the kept axis: one dispatch over the full (kept*C, d)
    # sample tensor materializes (kept*C, hidden) coupling activations —
    # measured OOM at 8k kept x 4096 chains — while per-chunk pushes are a
    # few hundred MB and reuse one compiled program.
    kept, C, d = out.samples.shape
    chunk = max(1, min(kept, (1 << 20) // max(C, 1)))  # ~1M rows per dispatch
    push = jax.jit(to_theta)
    parts = [
        push(out.samples[i : i + chunk].reshape(-1, d)).reshape(-1, C, d)
        for i in range(0, kept, chunk)
    ]
    theta = jnp.concatenate(parts, axis=0)
    return out._replace(samples=theta)
