"""Device-side affine fin operator (a JAX pytree).

Holds the padded ELL arrays produced by :mod:`fem.assemble` as device arrays.
Assembling A(k) is a rank-1 contraction over the 5 affine components
(``comp_vals @ k``) and SpMV is gather + multiply + row-sum — both map onto
TPU vector units with no scatter (SURVEY.md §7 "Hard parts" #2).

All public entry points are differentiable in ``k`` (and ``u``), which is what
lets autodiff replace the reference's hand-coded adjoints (SURVEY.md §2b).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem.assemble import FinFEMHost


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols", "comp_vals", "ext_mass", "fixed", "diag_slot", "F_root", "qoi", "qoi_root"],
    meta_fields=["biot", "n_dof"],
)
@dataclasses.dataclass(frozen=True)
class FinOperator:
    """ELL-layout affine operator A(k) = sum_i k_i A_i + Bi * M_ext.

    Shapes: n rows (padded to a lane multiple), L ELL slots, 5 components,
    n_obs QoI rows. ``biot`` and ``n_dof`` are static metadata.
    """

    cols: jax.Array  # (n, L) int32
    comp_vals: jax.Array  # (n, L, 5)
    ext_mass: jax.Array  # (n, L)
    fixed: jax.Array  # (n, L)
    diag_slot: jax.Array  # (n,) int32
    F_root: jax.Array  # (n,)
    qoi: jax.Array  # (n_obs, n)
    qoi_root: jax.Array  # (n,)
    biot: float
    n_dof: int

    @classmethod
    def from_host(cls, host: FinFEMHost, biot: float, dtype=jnp.float32) -> "FinOperator":
        return cls(
            cols=jnp.asarray(host.cols, dtype=jnp.int32),
            comp_vals=jnp.asarray(host.comp_vals, dtype=dtype),
            ext_mass=jnp.asarray(host.ext_mass, dtype=dtype),
            fixed=jnp.asarray(host.fixed, dtype=dtype),
            diag_slot=jnp.asarray(host.diag_slot, dtype=jnp.int32),
            F_root=jnp.asarray(host.F_root, dtype=dtype),
            qoi=jnp.asarray(host.qoi, dtype=dtype),
            qoi_root=jnp.asarray(host.qoi_root, dtype=dtype),
            biot=float(biot),
            n_dof=int(host.n_dof),
        )

    @property
    def n(self) -> int:
        return self.cols.shape[0]

    @property
    def n_obs(self) -> int:
        return self.qoi.shape[0]

    @property
    def dtype(self):
        return self.comp_vals.dtype

    def vals(self, k: jax.Array) -> jax.Array:
        """ELL values of A(k): one small contraction, differentiable in k.

        Elementwise multiply-sum rather than tensordot — TPU matmuls default
        to bfloat16 MXU passes, which would cap the assembled operator at
        ~1e-3 relative accuracy; the VPU keeps full f32."""
        k = jnp.asarray(k, dtype=self.dtype)
        return (
            jnp.sum(self.comp_vals * k[None, None, :], axis=-1)
            + self.dtype.type(self.biot) * self.ext_mass
            + self.fixed
        )

    def matvec(self, vals: jax.Array, u: jax.Array) -> jax.Array:
        """SpMV with pre-assembled ELL values: (vals * u[cols]).sum(-1)."""
        return jnp.sum(vals * u[self.cols], axis=-1)

    def apply(self, k: jax.Array, u: jax.Array) -> jax.Array:
        """u -> A(k) u."""
        return self.matvec(self.vals(k), u)

    def apply_component(self, i: int, u: jax.Array) -> jax.Array:
        """u -> A_i u (unit-conductivity region component; used by Galerkin
        projection and the hand-coded-adjoint oracle)."""
        return jnp.sum(self.comp_vals[:, :, i] * u[self.cols], axis=-1)

    def apply_ext_mass(self, u: jax.Array) -> jax.Array:
        """u -> M_ext u (plus padding identity)."""
        return jnp.sum((self.ext_mass + self.fixed) * u[self.cols], axis=-1)

    def diag(self, vals: jax.Array) -> jax.Array:
        """Diagonal of A(k) from its ELL values (Jacobi preconditioner)."""
        return vals[jnp.arange(vals.shape[0]), self.diag_slot]

    def observe(self, u: jax.Array) -> jax.Array:
        """QoI map y = B u: per-region average temperatures (full f32 —
        see vals() on TPU matmul precision)."""
        return jnp.dot(self.qoi, u, precision=jax.lax.Precision.HIGHEST)

    def materialize(self, k: jax.Array) -> jax.Array:
        """Dense A(k) (tests / small meshes only)."""
        vals = self.vals(k)
        n = self.n
        A = jnp.zeros((n, n), dtype=self.dtype)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], self.cols.shape)
        return A.at[rows, self.cols].add(vals)

    def astype(self, dtype) -> "FinOperator":
        return dataclasses.replace(
            self,
            comp_vals=self.comp_vals.astype(dtype),
            ext_mass=self.ext_mass.astype(dtype),
            fixed=self.fixed.astype(dtype),
            F_root=self.F_root.astype(dtype),
            qoi=self.qoi.astype(dtype),
            qoi_root=self.qoi_root.astype(dtype),
        )
