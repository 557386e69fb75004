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
