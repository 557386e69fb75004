"""Pipeline artifact save/load roundtrip (SURVEY.md §2a #12)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.api import Pipeline, build_pipeline
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)


def test_pipeline_save_load_roundtrip(tmp_path):
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-7, cg_maxiter=500),
        rom=ROMConfig(n_snapshots=48, basis_size=10),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=64, epochs=20),
    )
    pipe = build_pipeline(cfg, dtype=jnp.float32, use_pallas=False)
    path = tmp_path / "pipeline.npz"
    pipe.save(path)

    pipe2 = Pipeline.load(path, dtype=jnp.float32)
    # identical forward predictions from the restored artifacts
    thetas = jax.random.normal(jax.random.PRNGKey(1), (8, 5), jnp.float32) * 0.4
    for like in ["rom", "rom_nn"]:
        y1 = jax.vmap(pipe.forward_fn(like))(thetas)
        y2 = jax.vmap(pipe2.forward_fn(like))(thetas)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    assert pipe2.rom_pcg_iters == pipe.rom_pcg_iters
    np.testing.assert_array_equal(np.asarray(pipe2.dataset.log_k), np.asarray(pipe.dataset.log_k))
