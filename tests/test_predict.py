"""Posterior push-forward prediction (utils/predict.py, api.predict_temperature,
api_full_field.predict_temperature_ff / predict_conductivity_ff).

Oracles:
- P1 interpolation of the FEM solution is EXACT for any nodal field that is
  itself piecewise linear — interp_rows must reproduce linear functions to
  rounding;
- a posterior concentrated at theta_true must predict the true temperature
  field (mean -> u(theta_true), epistemic std -> 0);
- a dispersed posterior's credible intervals must cover the truth at
  points the data never observed (well-specified model);
- the predictive SD for a new reading adds the noise in quadrature.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinferencedl_tpu.api import build_pipeline, predict_temperature, run_inversion
from bayesianinferencedl_tpu.config import (
    FEMConfig,
    MCMCConfig,
    MeshConfig,
    PipelineConfig,
    ROMConfig,
    SurrogateConfig,
)
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh
from bayesianinferencedl_tpu.utils.predict import interp_rows, predict_field


@pytest.fixture(scope="module")
def mesh():
    return build_fin_mesh(2)


def test_interp_rows_exact_for_linear(mesh):
    """P1 interpolation reproduces linear fields exactly at arbitrary
    in-domain points (interior, on an edge, at a node)."""
    a, b, c = 0.7, -0.3, 0.45
    field = a + b * mesh.nodes[:, 0] + c * mesh.nodes[:, 1]
    pts = np.array([
        [0.13, 2.41],     # post interior
        [-2.2, 0.85],     # lower-left subfin wing
        [0.0, 0.0],       # root corner region (node)
        [0.25, 3.875],    # top subfin
    ])
    ids, w = interp_rows(mesh, pts)
    got = (field[ids] * w).sum(axis=1)
    want = a + b * pts[:, 0] + c * pts[:, 1]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-12)


def test_interp_rows_outside_raises(mesh):
    with pytest.raises(ValueError, match="outside"):
        interp_rows(mesh, np.array([[0.0, 4.5]]))
    with pytest.raises(ValueError, match="outside"):
        # between subfins: inside the bounding box, outside the fin
        interp_rows(mesh, np.array([[2.0, 1.5]]))


def test_predict_field_stats_and_noise():
    """predict_field statistics + the quadrature rule for predictive SD."""
    mesh = build_fin_mesh(1)
    n = mesh.n_nodes
    rng = np.random.default_rng(0)
    draws = 1.0 + 0.1 * rng.standard_normal((4096, n))
    pred = predict_field(
        draws, np.arange(n), mesh,
        points=np.array([[0.0, 2.0]]), noise_sigma=0.2,
    )
    np.testing.assert_allclose(pred.mean, 1.0, atol=0.02)
    np.testing.assert_allclose(pred.std, 0.1, atol=0.02)
    assert pred.q05[0] < pred.q50[0] < pred.q95[0]
    # new-reading SD: epistemic + aleatoric in quadrature
    np.testing.assert_allclose(
        pred.point_pred_std[0],
        np.sqrt(pred.point_std[0] ** 2 + 0.2**2),
        rtol=1e-12,
    )
    rows = pred.summary_rows()
    assert len(rows) == 1 and "pred_sd" in rows[0]


@pytest.fixture(scope="module")
def pipe():
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        fem=FEMConfig(cg_tol=1e-11, cg_maxiter=2000),
        rom=ROMConfig(n_snapshots=48, basis_size=16),
        surrogate=SurrogateConfig(hidden=(16, 16), n_train=128, epochs=40, batch_size=64),
        mcmc=MCMCConfig(n_chains=24, n_steps=1200, n_burn=400, beta=0.3, noise_sigma=1e-2),
    )
    return build_pipeline(cfg, dtype=jnp.float64)


def test_predict_degenerate_posterior_recovers_truth(pipe):
    """Samples concentrated at theta_true -> mean field == u(theta_true),
    epistemic std ~ 0, and the point prediction equals the P1 interpolant."""
    theta_true = jnp.asarray(np.log([1.3, 0.7, 2.0, 0.5, 1.0]))
    samples = jnp.broadcast_to(theta_true, (8, 4, 5))
    pts = np.array([[0.2, 3.1], [-2.6, 1.875]])
    pred = predict_temperature(pipe, samples, points=pts, n_draws=16)

    u = np.asarray(
        solve_fom(pipe.fin.op, jnp.exp(theta_true), tol=1e-12, maxiter=4000)
    )
    from bayesianinferencedl_tpu.infer.oed import solution_indices

    u_nodes = u[solution_indices(pipe.fin)]
    np.testing.assert_allclose(pred.mean, u_nodes, rtol=1e-8)
    assert pred.std.max() < 1e-10
    ids, w = interp_rows(pipe.fin.mesh, pts)
    np.testing.assert_allclose(
        pred.point_mean, (u_nodes[ids] * w).sum(axis=1), rtol=1e-8
    )


def test_predict_after_inversion_covers_truth(pipe):
    """End to end: invert noisy observations, predict the temperature at
    points the subfin-average data never directly observed, and check the
    90% credible interval covers the true value (well-specified model) while
    the epistemic spread stays small relative to the field scale."""
    inv = run_inversion(pipe, likelihood="rom_nn", sampler="pcn")
    pts = np.array([[0.0, 3.95], [-1.5, 2.875], [2.5, 0.875]])
    pred = predict_temperature(
        pipe, inv.result.samples, points=pts, n_draws=128,
        noise_sigma=float(pipe.config.mcmc.noise_sigma),
    )
    u_true = np.asarray(
        solve_fom(
            pipe.fin.op, jnp.exp(inv.theta_true), tol=1e-12, maxiter=4000
        )
    )
    from bayesianinferencedl_tpu.infer.oed import solution_indices

    ids, w = interp_rows(pipe.fin.mesh, pts)
    truth = (u_true[solution_indices(pipe.fin)][ids] * w).sum(axis=1)
    # statistical sanity, robust to the tiny surrogate's residual bias and
    # single-seed interval misses: truth within a few posterior SDs (plus a
    # small relative slack for the NN bias floor), intervals ordered, and
    # the epistemic SD well under the field magnitude
    assert np.all(
        np.abs(truth - pred.point_mean)
        <= 5.0 * pred.point_std + 0.03 * np.abs(truth)
    )
    assert np.all(pred.point_q05 < pred.point_q50) and np.all(
        pred.point_q50 < pred.point_q95
    )
    assert np.all(pred.point_std < 0.1 * np.abs(u_true).max())
    # save/reload round-trip
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "pred.npz")
        pred.save_npz(path)
        z = np.load(path)
        np.testing.assert_allclose(z["point_mean"], pred.point_mean)
        np.testing.assert_allclose(z["mean"], pred.mean)


def test_predict_full_field():
    """Full-field variants: degenerate posterior at z_true recovers the true
    temperature field AND the true log-conductivity field per mesh node."""
    from bayesianinferencedl_tpu.api_full_field import (
        build_full_field_pipeline,
        predict_conductivity_ff,
        predict_temperature_ff,
    )

    pipe = build_full_field_pipeline(
        resolution=1, n_features=12, n_snapshots=24, basis_size=10,
        k_basis_size=10, n_train=32, surrogate_steps=30, dtype=jnp.float64,
        cg_tol=1e-11, cg_maxiter=3000,
    )
    z_true = jax.random.normal(jax.random.PRNGKey(2), (12,), jnp.float64)
    samples = jnp.broadcast_to(z_true, (6, 4, 12))
    pts = np.array([[0.1, 1.9]])
    pred_u = predict_temperature_ff(pipe, samples, points=pts, n_draws=8)
    mesh, gid = pipe.node_mesh_ids()
    u_true = np.asarray(
        solve_fom(pipe.op, pipe.conductivity(z_true), tol=1e-12, maxiter=4000)
    )[np.asarray(gid)]
    np.testing.assert_allclose(pred_u.mean, u_true, rtol=1e-7)
    assert pred_u.std.max() < 1e-9

    pred_k = predict_conductivity_ff(pipe, samples, n_draws=8)
    np.testing.assert_allclose(
        pred_k.mean, np.asarray(pipe.node_theta(z_true)), rtol=1e-10
    )
