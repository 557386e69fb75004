"""MCMC diagnostics: ESS, R-hat, acceptance (SURVEY.md §5 metrics row;
BASELINE figure of merit "MCMC effective samples/sec").

All computed on-device so multi-chip runs can psum-reduce them over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocorr_fft(x: jax.Array) -> jax.Array:
    """Normalized autocorrelation of a 1-D series via FFT.

    Always computed in float32: ESS is a diagnostic (f32 is plenty) and TPU
    has no complex128 FFT, so f64 chains would fail to compile otherwise."""
    n = x.shape[0]
    x = x.astype(jnp.float32)
    x = x - jnp.mean(x)
    nfft = 2 * n  # power-of-2 not required by XLA FFT
    f = jnp.fft.rfft(x, n=nfft)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=nfft)[:n]
    return acf / jnp.maximum(acf[0], jnp.finfo(x.dtype).tiny)


def effective_sample_size(chains: jax.Array) -> jax.Array:
    """ESS per scalar component, Geyer initial-monotone-ish estimator.

    chains: (n_steps, n_chains, d) or (n_steps, n_chains). Returns (d,) (or
    scalar) total ESS across chains: per-chain ESS summed.

    Uses the truncated positive-pair-sum rule on the chain-averaged
    autocorrelation (standard split-free variant; SURVEY.md §4 posterior
    diagnostics).
    """
    if chains.ndim == 2:
        chains = chains[..., None]
    n, c, d = chains.shape

    def per_series(x):  # (n,)
        rho = _autocorr_fft(x)
        # pair sums rho[2t+1] + rho[2t+2]
        n_pairs = (n - 1) // 2
        pair = rho[1 : 1 + 2 * n_pairs].reshape(n_pairs, 2).sum(1)
        pos = pair > 0
        # keep pairs until the first non-positive one (monotone cut)
        keep = jnp.cumprod(pos.astype(x.dtype))
        tau = 1.0 + 2.0 * jnp.sum(pair * keep)
        return n / jnp.maximum(tau, 1.0)

    # sequential over the parameter axis (lax.map) so the FFT workspace is
    # one dimension's chains at a time — keeps memory bounded for large
    # chain counts (the all-at-once vmap materializes d * c spectra)
    ess = jax.lax.map(
        lambda x: jax.vmap(per_series, in_axes=1)(x), jnp.moveaxis(chains, 2, 0)
    )  # (d, c)
    return jnp.sum(ess, axis=1)


def ks_distance(samples_a: jax.Array, samples_b: jax.Array) -> jax.Array:
    """Two-sample Kolmogorov-Smirnov distance per marginal (SURVEY.md §4
    'KS distance between chains' posterior-quality oracle).

    samples_*: (N, d) flattened chain samples. Returns (d,) sup-norm ECDF
    differences. On-device (sort + searchsorted)."""
    a = samples_a.reshape(-1, samples_a.shape[-1])
    b = samples_b.reshape(-1, samples_b.shape[-1])

    def per_dim(x, y):
        xs = jnp.sort(x)
        ys = jnp.sort(y)
        grid = jnp.concatenate([xs, ys])
        Fa = jnp.searchsorted(xs, grid, side="right") / x.shape[0]
        Fb = jnp.searchsorted(ys, grid, side="right") / y.shape[0]
        return jnp.max(jnp.abs(Fa - Fb))

    return jax.vmap(per_dim, in_axes=1)(a, b)


def rhat(chains: jax.Array) -> jax.Array:
    """Gelman-Rubin potential scale reduction over chains.

    chains: (n_steps, n_chains, d) -> (d,).
    """
    if chains.ndim == 2:
        chains = chains[..., None]
    if chains.shape[1] < 2:
        raise ValueError(
            "rhat needs >= 2 chains (cross-chain variance is undefined for "
            f"one); got shape {chains.shape}"
        )
    n = chains.shape[0]
    chain_means = jnp.mean(chains, axis=0)  # (c, d)
    chain_vars = jnp.var(chains, axis=0, ddof=1)  # (c, d)
    W = jnp.mean(chain_vars, axis=0)
    B = n * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / jnp.maximum(W, jnp.finfo(chains.dtype).tiny))


# --- rank-normalized split estimators (Vehtari, Gelman, Simpson, Carpenter,
# Bürkner 2021, "Rank-normalization, folding, and localization: an improved
# R-hat for assessing convergence of MCMC"). These are the production gates:
# plain Gelman-Rubin and per-chain-summed ESS are exactly the two estimators
# most prone to flattering a multimodal posterior held together by tempering
# (SURVEY.md §4 posterior-quality oracles; VERDICT r2 item 2). -----------------


def _split_chains(chains: jax.Array) -> jax.Array:
    """(n, c, d) -> (n//2, 2c, d): each chain split into halves. Splitting
    detects within-chain drift (a chain that wanders between modes looks
    converged to unsplit R-hat)."""
    if chains.ndim == 2:
        chains = chains[..., None]
    n, c, d = chains.shape
    n2 = n // 2
    # drop a trailing odd step so halves match
    return chains[: 2 * n2].reshape(2, n2, c, d).transpose(1, 0, 2, 3).reshape(n2, 2 * c, d)


def _rank_normalize_2d(x: jax.Array) -> jax.Array:
    """Pooled fractional ranks -> normal scores for ONE parameter dim.

    x: (n, c). Ranks over the pooled n*c draws (average-rank tie handling is
    immaterial for continuous chains) via double argsort — sort-based, no
    scatter: at production chain counts (36.9M draws per dim) the scatter
    lowering of rank assignment allocated 18.9 GB on a 16 GB chip. Mapped
    through the blom offset (r - 3/8)/(N + 1/4) and the normal quantile; f32
    throughout (diagnostics), and callers stream one dim at a time.

    The upper half of the ranks goes through the COMPLEMENTARY rank and
    ndtri's antisymmetry: above ~1e7 pooled draws, (r + 0.625)/(N + 0.25)
    rounds to exactly 1.0 in f32 for the top ranks, and ndtri(1.0) = +inf
    poisoned every production-scale R-hat/ESS with NaN (observed at 36.9M
    draws in the round-3 bench). q = N - 1 - r is exact in int32, so the
    mirrored u stays a small, well-resolved f32 on both tails."""
    n, c = x.shape
    flat = x.reshape(-1).astype(jnp.float32)
    N = n * c
    r = jnp.argsort(jnp.argsort(flat))  # 0-based ranks, int32, exact
    q = (N - 1) - r  # 0-based rank from the top, exact
    lo = r <= q  # lower-half draws (u <= ~0.5)
    # blom offset: u = (rank_1based - 0.375) / (N + 0.25) = (r + 0.625)/(N + 0.25)
    u_small = (jnp.where(lo, r, q).astype(jnp.float32) + 0.625) / (N + 0.25)
    z = jax.scipy.special.ndtri(u_small)
    return jnp.where(lo, z, -z).reshape(n, c)


def _rhat_2d(z: jax.Array) -> jax.Array:
    """Gelman-Rubin statistic of one (n, c) set of (already split,
    rank-normalized) chains."""
    n = z.shape[0]
    W = jnp.mean(jnp.var(z, axis=0, ddof=1))
    B = n * jnp.var(jnp.mean(z, axis=0), ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / jnp.maximum(W, jnp.finfo(z.dtype).tiny))


def split_rhat(chains: jax.Array) -> jax.Array:
    """Rank-normalized split-R-hat: max of the bulk (rank-normalized) and
    tail (folded rank-normalized) statistics. chains: (n, c, d) -> (d,).

    Gate at < 1.01 for certification-grade convergence; < 1.05 as the loose
    benchmark gate this repo uses for throughput-oriented runs. Streams one
    parameter dim at a time (sorts over all pooled draws are the memory
    hot-spot at production chain counts)."""
    s = _split_chains(chains)

    def per_dim(sd):  # (n2, c2)
        bulk = _rhat_2d(_rank_normalize_2d(sd))
        folded = jnp.abs(sd - jnp.median(sd))
        tail = _rhat_2d(_rank_normalize_2d(folded))
        return jnp.maximum(bulk, tail)

    return jax.lax.map(per_dim, jnp.moveaxis(s, 2, 0))


def _combined_tau(z: jax.Array) -> jax.Array:
    """Integrated autocorrelation time of (n, c) split rank-normalized draws
    using the BETWEEN-CHAIN combined estimator:

        rho_t = 1 - (W - mean_c(s_c^2 rho_{c,t})) / var_plus

    so chains stuck in different modes (per-chain rho decays fast, but
    between-chain variance is large) get the long tau they deserve — the
    correction the per-chain-summed estimator misses. Geyer initial positive
    + monotone sequence on pair sums."""
    n, c = z.shape
    s2 = jnp.var(z, axis=0, ddof=1)  # (c,)
    W = jnp.mean(s2)
    Bv = n * jnp.var(jnp.mean(z, axis=0), ddof=1) if c > 1 else 0.0
    var_plus = (n - 1) / n * W + Bv / n
    rho_c = jax.vmap(_autocorr_fft, in_axes=1, out_axes=1)(z)  # (n, c) normalized
    # un-normalize per chain (autocorr_fft divides by lag-0), weight by s_c^2
    mean_rho = jnp.mean(s2[None, :] * rho_c * (n - 1) / n, axis=1)  # (n,)
    rho = 1.0 - (W - mean_rho) / jnp.maximum(var_plus, jnp.finfo(z.dtype).tiny)
    # Geyer pairs P_t = rho_{2t} + rho_{2t+1}; initial positive sequence +
    # monotone nonincreasing enforcement (running minimum); tau = -1 + 2*sum P
    n_pairs = n // 2
    pair = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(1)
    keep = jnp.cumprod((pair > 0).astype(z.dtype))
    pair_mono = jax.lax.associative_scan(jnp.minimum, jnp.where(keep > 0, pair, jnp.inf))
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(keep > 0, pair_mono, 0.0))
    return jnp.maximum(tau, 1.0 / jnp.asarray(n * c, z.dtype))


def ess_bulk(chains: jax.Array) -> jax.Array:
    """Bulk ESS on rank-normalized split chains with the combined
    between-chain autocorrelation estimator (Vehtari et al. 2021).

    chains: (n, c, d) or (n, c) -> (d,) (or scalar). This is the honest
    total-ESS figure: N_total / tau with tau seeing cross-chain disagreement.
    """
    squeeze = chains.ndim == 2
    s = _split_chains(chains)  # (n2, 2c, d)
    n2, c2, _ = s.shape
    tau = jax.lax.map(
        lambda sd: _combined_tau(_rank_normalize_2d(sd)), jnp.moveaxis(s, 2, 0)
    )  # (d,)
    ess = (n2 * c2) / tau
    # cap at the optimistic iid-plus limit like Stan does (antithetic chains)
    ess = jnp.minimum(ess, jnp.asarray(n2 * c2 * jnp.log10(jnp.asarray(n2 * c2, jnp.float32))))
    return ess[0] if squeeze else ess


def ess_tail(chains: jax.Array) -> jax.Array:
    """Tail ESS (Vehtari et al. 2021): the smaller of the ESS of the 5% and
    95% pooled-quantile exceedance indicators, on split chains with the
    combined between-chain autocorrelation estimator.

    chains: (n, c, d) or (n, c) -> (d,) (or scalar). Bulk ESS certifies the
    center of the posterior; credible-interval endpoints converge at the
    TAIL rate, which is slower whenever tails mix worse than the bulk
    (heavy tails, metastable modes) — report both, gate intervals on this
    one. Indicators are bounded, so no rank normalization is needed
    (Stan's ess_quantile construction)."""
    squeeze = chains.ndim == 2
    s = _split_chains(chains)  # (n2, 2c, d)
    n2, c2, _ = s.shape

    def per_dim(sd):  # (n2, c2)
        def ess_of_indicator(q):
            ind = (sd <= q).astype(jnp.float32)
            return (n2 * c2) / _combined_tau(ind)

        e05 = ess_of_indicator(jnp.quantile(sd, 0.05))
        e95 = ess_of_indicator(jnp.quantile(sd, 0.95))
        return jnp.minimum(e05, e95)

    ess = jax.lax.map(per_dim, jnp.moveaxis(s, 2, 0))
    ess = jnp.minimum(ess, jnp.asarray(n2 * c2 * jnp.log10(jnp.asarray(n2 * c2, jnp.float32))))
    return ess[0] if squeeze else ess
