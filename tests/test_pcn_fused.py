"""Fused pCN kernel: structural test in interpreter mode (the interpreter's
hardware PRNG returns constant bits, so statistical validation runs on the
real chip — scripts/bench_fused_kernel.py; measured exact vs the XLA
sampler there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bayesianinferencedl_tpu.api import build_pipeline
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)
from bayesianinferencedl_tpu.experimental.pcn_fused import run_pcn_fused


def test_fused_kernel_structure():
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-7, cg_maxiter=500),
        rom=ROMConfig(n_snapshots=48, basis_size=12),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=20),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32, use_pallas=False)
    data = pipe.forward_fn("rom_nn")(jnp.zeros(5))
    theta0 = pipe.prior.sample(jax.random.PRNGKey(0), (32,))
    with pltpu.force_tpu_interpret_mode():
        res = run_pcn_fused(
            pipe.rom, pipe.P0, pipe.surrogate.params, pipe.surrogate.norm,
            pipe.prior, data, 1e-2, theta0, jnp.int32(3),
            n_steps=20, n_burn=5, beta=0.3, cg_iters=15,
        )
    assert res.samples.shape == (15, 32, 5)
    assert res.phi_trace.shape == (15, 32)
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.isfinite(np.asarray(res.phi_trace)).all()
    # the interpreter PRNG is degenerate (constant bits), so only structure
    # is asserted here; the chain must still be a valid Markov chain state
    assert np.isfinite(np.asarray(res.beta)).all()
