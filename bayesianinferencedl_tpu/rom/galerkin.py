"""Galerkin-projected reduced operator and online solves (SURVEY.md A.3).

The affine structure A(k) = sum_i k_i A_i + Bi M_ext projects exactly:
Ahat(k) = sum_i k_i (V^T A_i V) + Bi (V^T M_ext V). The offline projection
uses the full operator's matrix-free component applies; online solves are
r x r dense Cholesky solves, vmapped so a batch of parameters becomes one
MXU-friendly batched solve (SURVEY.md §2b LAPACK row).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from bayesianinferencedl_tpu.fem.operators import FinOperator


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Ahat", "Mhat", "Fhat", "Bhat", "V"],
    meta_fields=["biot"],
)
@dataclasses.dataclass(frozen=True)
class ReducedOperator:
    """Reduced affine operator. Shapes: Ahat (5, r, r), Mhat (r, r),
    Fhat (r,), Bhat (n_obs, r), V (n, r)."""

    Ahat: jax.Array
    Mhat: jax.Array
    Fhat: jax.Array
    Bhat: jax.Array
    V: jax.Array
    biot: float

    @property
    def r(self) -> int:
        return self.Ahat.shape[-1]

    @classmethod
    def project(cls, op: FinOperator, V: jax.Array) -> "ReducedOperator":
        """Offline Galerkin projection of the affine components onto span(V)."""
        hi = jax.lax.Precision.HIGHEST  # TPU matmuls default to bf16 passes
        # A_i V via matrix-free component applies, vmapped over basis columns.
        AiV = jnp.stack(
            [jax.vmap(lambda v, i=i: op.apply_component(i, v), in_axes=1, out_axes=1)(V) for i in range(5)]
        )  # (5, n, r)
        Ahat = jnp.einsum("nr,cns->crs", V, AiV, precision=hi)
        # apply_ext_mass includes the padding-identity entries, but those only
        # touch padding rows, where every snapshot (hence every basis vector)
        # is exactly zero — so the projection sees the pure boundary mass.
        MV = jax.vmap(op.apply_ext_mass, in_axes=1, out_axes=1)(V)
        Mhat = jnp.dot(V.T, MV, precision=hi)
        return cls(
            Ahat=Ahat,
            Mhat=Mhat,
            Fhat=jnp.dot(V.T, op.F_root, precision=hi),
            Bhat=jnp.dot(op.qoi, V, precision=hi),
            V=V,
            biot=float(op.biot),
        )

    @classmethod
    def project_host(cls, host, biot: float, V, dtype=jnp.float32) -> "ReducedOperator":
        """Exact float64 offline projection on the host, cast to the online
        dtype. ``host`` is a FinFEMDiaHost (or anything exposing
        to_scipy_components / F_root / qoi). The f64 algebra preserves the
        ROM's true Kolmogorov accuracy, which f32 on-device projection
        cannot (see rom.pod.pod_basis_host)."""
        import numpy as np

        comps, M_ext = host.to_scipy_components()
        V = np.asarray(V, np.float64)
        Ahat = np.stack([V.T @ (A @ V) for A in comps])
        Mhat = V.T @ (M_ext @ V)
        Fhat = V.T @ np.asarray(host.F_root, np.float64)
        Bhat = np.asarray(host.qoi, np.float64) @ V
        return cls(
            Ahat=jnp.asarray(Ahat, dtype),
            Mhat=jnp.asarray(Mhat, dtype),
            Fhat=jnp.asarray(Fhat, dtype),
            Bhat=jnp.asarray(Bhat, dtype),
            V=jnp.asarray(V, dtype),
            biot=float(biot),
        )

    def assemble(self, k: jax.Array) -> jax.Array:
        """Dense r x r reduced system matrix Ahat(k). Elementwise contraction
        over the 5 components (full f32; TPU tensordot would route through
        bfloat16 MXU passes — see fem.dia.StencilOperator.vals)."""
        k = jnp.asarray(k, dtype=self.Ahat.dtype)
        return (
            jnp.sum(self.Ahat * k[:, None, None], axis=0)
            + self.Ahat.dtype.type(self.biot) * self.Mhat
        )

    def solve(self, k: jax.Array) -> jax.Array:
        """Online reduced solve: u_r(k), shape (r,). Differentiable in k."""
        A = self.assemble(k)
        c = jax.scipy.linalg.cho_factor(A)
        return jax.scipy.linalg.cho_solve(c, self.Fhat)

    def forward(self, k: jax.Array) -> jax.Array:
        """G_ROM: k -> QoI of the lifted reduced solution, y_r = (B V) u_r."""
        return jnp.dot(self.Bhat, self.solve(k), precision=jax.lax.Precision.HIGHEST)

    def forward_batch(self, ks: jax.Array) -> jax.Array:
        return jax.vmap(self.forward)(ks)

    def lift(self, u_r: jax.Array) -> jax.Array:
        return self.V @ u_r

    def residual_norm(self, op: FinOperator, k: jax.Array) -> jax.Array:
        """Full-space residual ||F - A(k) V u_r(k)|| — the greedy error
        indicator (SURVEY.md §3.3) and an a-posteriori error proxy."""
        u_r = self.solve(k)
        r = op.F_root - op.apply(k, self.lift(u_r))
        return jnp.linalg.norm(r)
