"""Priors for the inverse problem (SURVEY.md A.5).

Two prior families:

* :class:`GaussianPrior` — working coordinates are theta = log k (unbounded)
  with a Gaussian prior N(mean, C): the log-normal-conductivity setup under
  which pCN is directly well-defined.
* :class:`BoxPrior` — the reference repo's uniform / log-uniform priors on k,
  handled the classical way (SURVEY.md A.5: "transform to unbounded
  coordinates first"): the working coordinate is z with the STANDARD Gaussian
  as pCN's reference measure, and the prior is realized as the probit
  push-forward k = T(z). Because a uniform prior on k is *exactly* N(0, I)
  on z = Phi^{-1}((k-a)/(b-a)), the pCN acceptance ratio needs no Jacobian
  term — the data misfit alone is still the correct potential, and every
  sampler (pcn / laplace_mh / gpcn) works unchanged in z-space.

Both expose ``to_theta(working) -> log k`` so the inversion layer composes the
forward model uniformly: G(exp(to_theta(x)))."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaussianPrior(NamedTuple):
    """N(mean, C) with C given by its Cholesky factor (C = L L^T)."""

    mean: jax.Array  # (d,)
    chol: jax.Array  # (d, d) lower-triangular

    @classmethod
    def iid(cls, dim: int, mean: float = 0.0, sigma: float = 0.6, dtype=jnp.float32):
        return cls(
            mean=jnp.full((dim,), mean, dtype),
            chol=jnp.eye(dim, dtype=dtype) * jnp.asarray(sigma, dtype),
        )

    @property
    def dim(self) -> int:
        return self.mean.shape[0]

    def sample(self, key: jax.Array, shape: tuple = ()) -> jax.Array:
        z = jax.random.normal(key, (*shape, self.dim), dtype=self.mean.dtype)
        return self.mean + jnp.dot(z, self.chol.T, precision=jax.lax.Precision.HIGHEST)

    def log_density(self, theta: jax.Array) -> jax.Array:
        """Unnormalized Gaussian log-density (whitened)."""
        w = jax.scipy.linalg.solve_triangular(self.chol, theta - self.mean, lower=True)
        return -0.5 * jnp.sum(w * w, axis=-1)

    def whiten(self, theta: jax.Array) -> jax.Array:
        return jax.scipy.linalg.solve_triangular(self.chol, theta - self.mean, lower=True)

    def unwhiten(self, z: jax.Array) -> jax.Array:
        return self.mean + jnp.dot(z, self.chol.T, precision=jax.lax.Precision.HIGHEST)

    def precision_apply(self, v: jax.Array) -> jax.Array:
        """C^{-1} v (for MAP objectives / Laplace Hessians)."""
        w = jax.scipy.linalg.cho_solve((self.chol, True), v)
        return w

    def to_theta(self, theta: jax.Array) -> jax.Array:
        """Working coordinates ARE theta = log k for the Gaussian prior."""
        return theta

    def from_theta(self, theta: jax.Array) -> jax.Array:
        return theta


class BoxPrior(NamedTuple):
    """Uniform or log-uniform prior on k over the box [low, high]^d
    (SURVEY.md A.5), expressed in unbounded coordinates z with reference
    N(0, I).

    kind encoding (an array leaf, so the pytree stays jit-passable):
    is_log[i] = 1.0 -> log-uniform on k_i; 0.0 -> uniform on k_i. Mixed
    per-component kinds are allowed.

    The probit map is exact: z ~ N(0, I)  =>  k = T(z) has the requested
    box distribution, so pCN in z with the plain data-misfit potential
    targets the correct posterior — no Jacobian correction (the prior IS
    the reference measure). f32 saturation of Phi(z) for |z| > ~5.3 merely
    clamps k to the box edge (no NaN/inf: theta stays at log(bound)).
    """

    mean: jax.Array  # (d,) zeros — the z-space reference mean (pCN m̄)
    chol: jax.Array  # (d, d) identity — the z-space reference Cholesky
    low: jax.Array  # (d,) lower bounds on k
    high: jax.Array  # (d,) upper bounds on k
    is_log: jax.Array  # (d,) 1.0 = log-uniform, 0.0 = uniform

    @classmethod
    def create(
        cls,
        dim: int,
        low: float = 0.1,
        high: float = 10.0,
        kind: str = "log_uniform",
        dtype=jnp.float32,
    ) -> "BoxPrior":
        if kind not in ("uniform", "log_uniform"):
            raise ValueError(f"kind must be 'uniform' or 'log_uniform', got {kind!r}")
        return cls(
            mean=jnp.zeros((dim,), dtype),
            chol=jnp.eye(dim, dtype=dtype),
            low=jnp.full((dim,), low, dtype),
            high=jnp.full((dim,), high, dtype),
            is_log=jnp.full((dim,), 1.0 if kind == "log_uniform" else 0.0, dtype),
        )

    @property
    def dim(self) -> int:
        return self.mean.shape[0]

    # --- the z-space reference measure (what the samplers see) -------------
    def sample(self, key: jax.Array, shape: tuple = ()) -> jax.Array:
        return jax.random.normal(key, (*shape, self.dim), dtype=self.mean.dtype)

    def log_density(self, z: jax.Array) -> jax.Array:
        return -0.5 * jnp.sum(z * z, axis=-1)

    def whiten(self, z: jax.Array) -> jax.Array:
        return z

    def unwhiten(self, z: jax.Array) -> jax.Array:
        return z

    def precision_apply(self, v: jax.Array) -> jax.Array:
        return v

    # --- the push-forward --------------------------------------------------
    def to_theta(self, z: jax.Array) -> jax.Array:
        """z -> theta = log k. Elementwise, so it broadcasts over any batch."""
        u = jax.scipy.stats.norm.cdf(z)
        # a uniform prior may legitimately have low <= 0; guard the UNSELECTED
        # log-uniform branch so its -inf/NaN can't leak into jnp.where
        # gradients (0 * NaN = NaN in reverse mode)
        safe_lo = jnp.maximum(self.low, jnp.finfo(z.dtype).tiny)
        log_lo, log_hi = jnp.log(safe_lo), jnp.log(self.high)
        theta_log = log_lo + (log_hi - log_lo) * u  # log-uniform branch
        theta_lin = jnp.log(self.low + (self.high - self.low) * u)  # uniform branch
        return jnp.where(self.is_log > 0.5, theta_log, theta_lin)

    def from_theta(self, theta: jax.Array) -> jax.Array:
        """theta = log k -> z (probit inverse), for initializing chains at a
        known conductivity. Clipped away from {0, 1} to keep ndtri finite."""
        log_lo, log_hi = jnp.log(self.low), jnp.log(self.high)
        u_log = (theta - log_lo) / (log_hi - log_lo)
        u_lin = (jnp.exp(theta) - self.low) / (self.high - self.low)
        u = jnp.where(self.is_log > 0.5, u_log, u_lin)
        eps = jnp.asarray(1e-6, theta.dtype)
        return jax.scipy.special.ndtri(jnp.clip(u, eps, 1 - eps))
