"""Checkpoint / metrics subsystem tests (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.infer.pcn import PCNState
from bayesianinferencedl_tpu.models.surrogate import MLP, adam_init
from bayesianinferencedl_tpu.utils import MetricsLogger, load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip_params(tmp_path):
    mlp = MLP(sizes=(5, 8, 3))
    params = mlp.init(jax.random.PRNGKey(0))
    opt = adam_init(params)
    save_checkpoint(tmp_path / "ck.npz", (params, opt), meta={"step": 7})
    (p2, o2), meta = load_checkpoint(tmp_path / "ck.npz", (params, opt))
    assert meta["step"] == 7
    for (W1, _), (W2, _) in zip(params, p2):
        np.testing.assert_array_equal(np.asarray(W1), np.asarray(W2))


def test_checkpoint_chain_state_resume(tmp_path):
    """Kill-and-resume: chain state round-trips exactly (SURVEY.md §5
    failure-recovery row)."""
    state = PCNState(
        theta=jnp.ones((16, 5)), phi=jnp.zeros(16), n_accept=jnp.arange(16, dtype=jnp.int32)
    )
    key = jax.random.PRNGKey(9)
    save_checkpoint(tmp_path / "chain.npz", (state, key), meta={"step": 123})
    (s2, k2), meta = load_checkpoint(tmp_path / "chain.npz", (state, key))
    assert meta["step"] == 123
    np.testing.assert_array_equal(np.asarray(state.theta), np.asarray(s2.theta))
    np.testing.assert_array_equal(np.asarray(key), np.asarray(k2))


def test_profile_trace_smoke(tmp_path):
    """jax.profiler trace wrapper (SURVEY.md §5 tracing row): produces trace
    output and never raises even if profiling is unavailable."""
    from bayesianinferencedl_tpu.utils.metrics import profile_trace

    with profile_trace(tmp_path / "trace"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        x.block_until_ready()
    # best-effort: if the profiler is active, it must have written something
    import os

    if (tmp_path / "trace").exists():
        assert any(os.scandir(tmp_path / "trace"))


def test_metrics_jsonl(tmp_path):
    log = MetricsLogger(tmp_path / "m.jsonl", run_config={"resolution": 2})
    log.log("cg_solve", iters=37, relres=1e-9)
    with log.timer("stage"):
        pass
    lines = (tmp_path / "m.jsonl").read_text().strip().split("\n")
    assert len(lines) == 3
    import json

    recs = [json.loads(l) for l in lines]
    assert recs[0]["event"] == "run_config"
    assert recs[1]["iters"] == 37
    assert "seconds" in recs[2]
    assert log.summary()["cg_solve"]["iters"] == 37
