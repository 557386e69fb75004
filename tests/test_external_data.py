"""External-observation inversion (production mode): run_inversion(data=...)
and the `fom --save-obs` / `invert --data` CLI round trip.

The reference's user story ends at inverting MEASURED subfin temperatures;
the synthetic path (BASELINE config 5) is the benchmark mode. Contract:
passing the synthesized observations back in externally reproduces the
synthetic run bit-for-bit (same key -> same init/chain streams), and the
data-shape contract is validated eagerly."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.api import build_pipeline, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig, MCMCConfig, MeshConfig, PipelineConfig, ROMConfig,
    SurrogateConfig,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pipe():
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(biot=0.1, cg_tol=1e-8, cg_maxiter=1000),
        rom=ROMConfig(n_snapshots=32, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=30),
        mcmc=MCMCConfig(
            n_chains=16, n_steps=300, n_burn=100, noise_sigma=1e-2,
            likelihood="rom_nn", sampler="pcn",
        ),
    )
    return build_pipeline(cfg, dtype=jnp.float64)


def test_external_data_reproduces_synthetic_run(pipe):
    key = jax.random.PRNGKey(3)
    inv_syn = run_inversion(pipe, key=key)
    inv_ext = run_inversion(pipe, data=inv_syn.data, key=key)
    np.testing.assert_array_equal(
        np.asarray(inv_syn.result.samples), np.asarray(inv_ext.result.samples)
    )
    np.testing.assert_array_equal(np.asarray(inv_syn.data), np.asarray(inv_ext.data))


def test_external_data_shape_validated(pipe):
    with pytest.raises(ValueError, match="external data"):
        run_inversion(pipe, data=jnp.zeros(3))


def test_external_data_recovers_generator(pipe):
    """Invert observations produced OUTSIDE run_inversion (the production
    flow): the posterior mean must track the generating conductivities."""
    theta_gen = jnp.asarray([0.3, -0.2, 0.4, -0.1, 0.2], jnp.float64)
    y = pipe.fin.forward(jnp.exp(theta_gen))
    d = y + 1e-2 * jax.random.normal(jax.random.PRNGKey(9), y.shape, jnp.float64)
    inv = run_inversion(pipe, data=d, key=jax.random.PRNGKey(4))
    post = np.asarray(inv.result.samples).reshape(-1, 5).mean(0)
    # 5 noisy observables at 1e-2: identified to a loose tolerance
    assert np.linalg.norm(post - np.asarray(theta_gen)) < 0.8
    # the data misfit at the posterior mean beats the prior mean's
    mis_post = float(jnp.linalg.norm(pipe.fin.forward(jnp.exp(jnp.asarray(post))) - d))
    mis_prior = float(jnp.linalg.norm(pipe.fin.forward(jnp.exp(pipe.prior.mean)) - d))
    assert mis_post < mis_prior


def test_ff_external_data_reproduces_synthetic():
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline, run_full_field_inversion,
    )

    pipe = build_full_field_pipeline(
        resolution=1, dtype=jnp.float64, n_features=8, n_snapshots=24,
        basis_size=6, k_basis_size=16, n_train=96, surrogate_hidden=(16,),
        surrogate_steps=300, cg_tol=1e-10, cg_maxiter=2000, use_pallas=False,
    )
    key = jax.random.PRNGKey(5)
    res_a, _, data_a, *_ = run_full_field_inversion(
        pipe, n_chains=8, n_steps=120, n_burn=40, noise_sigma=1e-2, key=key
    )
    res_b, _, data_b, *_ = run_full_field_inversion(
        pipe, n_chains=8, n_steps=120, n_burn=40, noise_sigma=1e-2, key=key,
        data=data_a,
    )
    np.testing.assert_array_equal(np.asarray(res_a.samples), np.asarray(res_b.samples))
    with pytest.raises(ValueError, match="external data"):
        run_full_field_inversion(pipe, data=jnp.zeros(2), key=key)


def test_cli_save_obs_invert_data_roundtrip(tmp_path):
    """fom --save-obs -> invert --data: the production CLI flow."""
    obs_path = str(tmp_path / "obs.npz")

    def _run(args, timeout=900):
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv=['cli']+%r;"
            "from bayesianinferencedl_tpu.cli import main; main()"
        ) % (args,)
        return subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd=REPO, timeout=timeout,
        )

    out = _run([
        "fom", "--resolution", "1", "--k", "1.5", "0.8", "1.2", "0.9", "1.1",
        "--save-obs", obs_path,
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    z = np.load(obs_path)
    assert z["data"].shape == (5,)

    out = _run([
        "invert", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--chains", "16", "--steps", "200",
        "--burn", "100", "--noise", "1e-2", "--data", obs_path,
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    j = json.loads(out.stdout.strip().splitlines()[-1])
    assert j["theta_true"] is None  # external data: truth unknown
    assert np.all(np.isfinite(j["posterior_mean_log_k"]))
