"""The 5-parameter thermal-fin model (SURVEY.md §2a #1/#3).

Rebuilds the reference's ``Fin`` class + ``five_param`` helpers as a thin
façade over the mesh/FEM/ROM layers: piecewise-constant conductivity (one k_i
per subfin pair + post), affine assembly, FOM/ROM forwards, QoI, and
autodiff gradients/HVPs (replacing the reference's hand-coded adjoints,
SURVEY.md §2a #11 — the hand-coded version survives as a test oracle in
``utils.adjoint``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.fem.assemble import FinFEMHost, assemble_fin
from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.geometry.mesh import FinMesh, build_fin_mesh


@dataclass
class FiveParamFin:
    """Thermal fin with 5 piecewise-constant conductivities."""

    mesh: FinMesh
    host: FinFEMHost
    op: FinOperator
    cg_tol: float = 1e-10
    cg_maxiter: int = 3000

    @classmethod
    def create(
        cls,
        resolution: int = 4,
        biot: float = 0.1,
        dtype=jnp.float32,
        pad_to: int = 128,
        cg_tol: float = 1e-10,
        cg_maxiter: int = 3000,
        layout: str = "dia",
    ) -> "FiveParamFin":
        """layout: 'dia' (gather-free stencil on the full structured grid —
        the TPU-fast path) or 'ell' (compacted gather layout, the reference
        oracle path). Both satisfy the same operator protocol."""
        mesh = build_fin_mesh(resolution)
        if layout == "dia":
            from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia

            # prefer the native C++ assembler when its library is available;
            # the NumPy path is the oracle (tests pin them equal)
            host = None
            try:
                from bayesianinferencedl_tpu.native import (
                    assemble_fin_dia_native,
                    native_available,
                )

                if native_available():
                    host = assemble_fin_dia_native(resolution, pad_to=pad_to)
            except Exception:
                host = None
            if host is None:
                host = assemble_fin_dia(mesh, pad_to=pad_to)
            op = StencilOperator.from_host(host, biot=biot, dtype=dtype)
        else:
            host = assemble_fin(mesh, pad_to=pad_to)
            op = FinOperator.from_host(host, biot=biot, dtype=dtype)
        return cls(mesh=mesh, host=host, op=op, cg_tol=cg_tol, cg_maxiter=cg_maxiter)

    def deflation_basis(self, m: Optional[int] = None):
        """Lazily build (and cache) the two-level deflation basis for the
        fused Pallas CG kernels (ops/deflation.py): the lowest generalized
        eigenvectors of (A(1), D(1)) + affine-Galerkin coarse components,
        host f64 once per mesh (cosine-mode fallback if the eigensolve
        fails). Returns None for the ELL layout (no structured grid).

        m defaults to 128 (a full MXU/lane tile). It must STAY a multiple of
        128: the kernels' deflation matmuls put m on the lane axis, and m=64
        SIGABRTs the Mosaic compile helper on the lane-alignment check
        (measured 2026-08-17). At res16 (n~99k) the bf16 Wt copy is ~25 MB —
        still inside the 127 MB kernel VMEM budget with the S=8 sublane
        tile."""
        if not hasattr(self.host, "to_scipy_components"):
            return None
        if getattr(self, "_deflation", None) is None:
            from bayesianinferencedl_tpu.ops.deflation import DeflationBasis

            if m is None:
                m = 128
            self._deflation = DeflationBasis.create(self.host, biot=self.op.biot, m=m)
        return self._deflation

    # --- forward maps -----------------------------------------------------
    def solve(self, k: jax.Array, F: Optional[jax.Array] = None) -> jax.Array:
        """Full-order solution field u(k) (the reference's Fin.forward)."""
        return solve_fom(self.op, k, F, tol=self.cg_tol, maxiter=self.cg_maxiter)

    def qoi(self, u: jax.Array) -> jax.Array:
        """Subfin-average observables (the reference's qoi_operator)."""
        return self.op.observe(u)

    def forward(self, k: jax.Array) -> jax.Array:
        """G_FOM: k -> y."""
        return self.qoi(self.solve(k))

    def forward_batch(self, ks: jax.Array) -> jax.Array:
        return jax.vmap(self.forward)(ks)

    # --- inverse-problem derivatives (autodiff; SURVEY.md A.5) ------------
    def misfit(self, k: jax.Array, data: jax.Array, noise_sigma: float) -> jax.Array:
        r = self.forward(k) - data
        return 0.5 * jnp.sum(r * r) / noise_sigma**2

    def gradient(self, k: jax.Array, data: jax.Array, noise_sigma: float) -> jax.Array:
        """d misfit / dk via implicit differentiation through the solve —
        mathematically the adjoint method (SURVEY.md §2a #11)."""
        return jax.grad(self.misfit)(k, data, noise_sigma)

    def hvp(self, k: jax.Array, v: jax.Array, data: jax.Array, noise_sigma: float) -> jax.Array:
        """Full Hessian-vector product via forward-over-reverse."""
        g = lambda kk: self.gradient(kk, data, noise_sigma)
        return jax.jvp(g, (k,), (v,))[1]

    def gn_hvp(self, k: jax.Array, v: jax.Array, noise_sigma: float) -> jax.Array:
        """Gauss-Newton HVP: J^T J v / sigma^2 with J = dG/dk (jvp-of-vjp,
        SURVEY.md A.5) — drops the second-order PDE term, always PSD."""
        y, Jv = jax.jvp(self.forward, (k,), (v,))
        _, vjp = jax.vjp(self.forward, k)
        return vjp(Jv)[0] / noise_sigma**2
