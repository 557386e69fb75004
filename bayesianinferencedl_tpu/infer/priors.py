"""Priors for the inverse problem (SURVEY.md A.5).

The working coordinates are theta = log k (unbounded), with a Gaussian prior
N(mean, C) — the log-normal-conductivity setup that makes pCN well-defined
(pCN requires a Gaussian reference measure; the reference repo's uniform
priors are handled the same way it is done classically, by transforming to
unbounded coordinates — SURVEY.md A.5)."""

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
        return self.mean + z @ self.chol.T

    def log_density(self, theta: jax.Array) -> jax.Array:
        """Unnormalized Gaussian log-density (whitened)."""
        w = jax.scipy.linalg.solve_triangular(self.chol, theta - self.mean, lower=True)
        return -0.5 * jnp.sum(w * w, axis=-1)

    def whiten(self, theta: jax.Array) -> jax.Array:
        return jax.scipy.linalg.solve_triangular(self.chol, theta - self.mean, lower=True)

    def unwhiten(self, z: jax.Array) -> jax.Array:
        return self.mean + z @ self.chol.T

    def precision_apply(self, v: jax.Array) -> jax.Array:
        """C^{-1} v (for MAP objectives / Laplace Hessians)."""
        w = jax.scipy.linalg.cho_solve((self.chol, True), v)
        return w
