"""Hand-coded adjoint oracle vs autodiff (SURVEY.md §4 'Adjoint gradient'
row: autodiff vs finite differences AND vs an independently hand-coded
adjoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.models.five_param import FiveParamFin
from bayesianinferencedl_tpu.utils.adjoint import adjoint_gn_hvp, adjoint_gradient

K0 = jnp.asarray([0.7, 1.4, 2.2, 0.9, 1.1])
SIGMA = 0.01


def _fin(op):
    return FiveParamFin(mesh=None, host=None, op=op, cg_tol=1e-13, cg_maxiter=4000)


def test_autodiff_matches_handcoded_adjoint(op_r1_f64):
    fin = _fin(op_r1_f64)
    data = fin.forward(jnp.ones(5)) * 1.02
    g_auto = np.asarray(fin.gradient(K0, data, SIGMA))
    g_hand = np.asarray(adjoint_gradient(op_r1_f64, K0, data, SIGMA))
    np.testing.assert_allclose(g_auto, g_hand, rtol=1e-7, atol=1e-10)


def test_gn_hvp_matches_handcoded(op_r1_f64):
    fin = _fin(op_r1_f64)
    v = jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.4])
    h_auto = np.asarray(fin.gn_hvp(K0, v, SIGMA))
    h_hand = np.asarray(adjoint_gn_hvp(op_r1_f64, K0, v, SIGMA))
    np.testing.assert_allclose(h_auto, h_hand, rtol=1e-6, atol=1e-9)


def test_full_hvp_symmetric(op_r1_f64):
    fin = _fin(op_r1_f64)
    data = fin.forward(jnp.ones(5))
    v1 = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0])
    h12 = float(jnp.vdot(v2, fin.hvp(K0, v1, data, SIGMA)))
    h21 = float(jnp.vdot(v1, fin.hvp(K0, v2, data, SIGMA)))
    assert abs(h12 - h21) < 1e-6 * max(1.0, abs(h12))
