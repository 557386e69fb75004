"""The corrected forward model G~(k) = y_ROM(k) + NN(k) (SURVEY.md §2a #8).

This is the fused cheap likelihood kernel of the whole framework: an r x r
dense solve plus a tiny MLP, all pure JAX — so when the pCN chain step inlines
it, the entire MCMC loop compiles to one XLA program with no host round-trips
(BASELINE north-star)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.models.surrogate import TrainedSurrogate
from bayesianinferencedl_tpu.rom.galerkin import ReducedOperator


class CorrectedForward(NamedTuple):
    """Callable pytree: log_k -> y_ROM(exp(log_k)) + e_hat(log_k)."""

    rom: ReducedOperator
    surrogate: TrainedSurrogate

    def __call__(self, log_k: jax.Array) -> jax.Array:
        y_rom = self.rom.forward(jnp.exp(log_k))
        return y_rom + self.surrogate.predict(log_k)

    def batch(self, log_ks: jax.Array) -> jax.Array:
        return jax.vmap(self)(log_ks)
