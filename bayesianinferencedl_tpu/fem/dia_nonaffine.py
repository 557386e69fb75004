"""Non-affine (nodal-conductivity) stencil operator (SURVEY.md §2a #4, A.2
'full-field' case) in the gather-free DIA layout.

Key structural fact: on the structured fin grid, A(k_nodal) has the same
seven diagonals as the affine operator, and because P1 stiffness is LINEAR in
the element conductivity (here the mean of the 3 nodal values), the map
k_nodal -> diagonal values is itself a 7-point stencil:

    vals[i, s] = sum_d  G[i, s, d] * k[i + offset_d]

with a host-assembled coefficient tensor G (n, 7, 7). So the full-field FOM
shares everything with the affine path — the same SpMV, the same Jacobi-PCG,
and the same fused Pallas kernel (ops/pcg_stencil), which consumes
pre-assembled diagonal planes and never knew about affinity in the first
place. The reference assembles A(k) per sample through FEniCS; here per-
sample assembly is seven shift-multiply-adds.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem import p1
from bayesianinferencedl_tpu.fem.dia import FinFEMDiaHost, StencilOperator
from bayesianinferencedl_tpu.geometry.mesh import FinMesh


def assemble_nodal_coeff(mesh: FinMesh, host: FinFEMDiaHost) -> np.ndarray:
    """Host-side assembly of G (n, 7, 7):
    G[row, slot_ab, slot_ac] += Ke[a, b] / 3 for every element vertex triple,
    where slot_ab indexes the matrix entry (row=v_a, col=v_b) and slot_ac the
    nodal-k contribution k[v_c] (elements average k over their 3 vertices)."""
    n_res = mesh.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(np.int64)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(np.int64)
    gid = gi * (ny + 1) + gj

    offsets = host.offsets
    off_slot = {int(o): s for s, o in enumerate(offsets)}
    slot_of = np.vectorize(off_slot.__getitem__, otypes=[np.int64])

    Ke, _ = p1.element_stiffness(mesh.nodes, mesh.triangles)
    tri_g = gid[mesh.triangles]  # (nt, 3)

    G = np.zeros((host.n, len(offsets), len(offsets)))
    for a in range(3):
        rows = tri_g[:, a]
        for b in range(3):
            s_ab = slot_of(tri_g[:, b] - rows)
            for c in range(3):
                s_ac = slot_of(tri_g[:, c] - rows)
                np.add.at(G, (rows, s_ab, s_ac), Ke[:, a, b] / 3.0)
    return G


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "G"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class NodalStencilOperator:
    """Full-field operator A(k_nodal) over the structured grid.

    Delegates layout/QoI/loads to the affine :class:`StencilOperator` (whose
    comp_vals are unused here) and assembles per-sample diagonal values from
    the nodal field via the G stencil. Satisfies the same solver protocol
    (vals/diag/matvec/F_root/observe/vals_grid), so fem.solve.solve_fom and
    ops.pcg_stencil work unchanged.
    """

    base: StencilOperator
    G: jax.Array  # (n, 7, 7)

    @classmethod
    def create(cls, mesh: FinMesh, host: FinFEMDiaHost, biot: float, dtype=jnp.float32):
        base = StencilOperator.from_host(host, biot=biot, dtype=dtype)
        G = assemble_nodal_coeff(mesh, host)
        return cls(base=base, G=jnp.asarray(G, dtype))

    # --- protocol delegation ------------------------------------------------
    @property
    def n(self):
        return self.base.n

    @property
    def n_grid(self):
        return self.base.n_grid

    @property
    def n_dof(self):
        return self.base.n_dof

    @property
    def n_obs(self):
        return self.base.n_obs

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def resolution(self):
        return self.base.resolution

    @property
    def offsets(self):
        return self.base.offsets

    @property
    def F_root(self):
        return self.base.F_root

    @property
    def qoi(self):
        return self.base.qoi

    def matvec(self, vals, u):
        return self.base.matvec(vals, u)

    def diag(self, vals):
        return self.base.diag(vals)

    def observe(self, u):
        return self.base.observe(u)

    def to_grid(self, v):
        return self.base.to_grid(v)

    def from_grid(self, a):
        return self.base.from_grid(a)

    @property
    def grid_shape0(self):
        return self.base.grid_shape0

    @property
    def grid_shape(self):
        return self.base.grid_shape

    # --- non-affine assembly ------------------------------------------------
    def vals(self, k_nodal: jax.Array) -> jax.Array:
        """Diagonal values of A(k_nodal): seven shift-multiply-adds of the
        nodal field against the G stencil, plus Robin mass and padding
        identity. Differentiable in k_nodal."""
        b = self.base
        m = b.max_offset
        n = b.n
        k = jnp.asarray(k_nodal, self.dtype)
        k_pad = jnp.pad(k, (m, m))
        acc = jnp.zeros((n, len(b.offsets)), self.dtype)
        for d, off in enumerate(b.offsets):
            ks = jax.lax.dynamic_slice(k_pad, (m + off,), (n,))
            acc = acc + self.G[:, :, d] * ks[:, None]
        return acc + self.dtype.type(b.biot) * b.ext_mass + b.fixed

    def apply(self, k_nodal: jax.Array, u: jax.Array) -> jax.Array:
        return self.matvec(self.vals(k_nodal), u)

    def vals_grid(self, k_nodal: jax.Array) -> jax.Array:
        """(7, X, Y) diagonal planes for the fused Pallas PCG kernel."""
        vals = self.vals(k_nodal)
        x0, y0 = self.grid_shape0
        x, y = self.grid_shape
        planes = vals[: self.n_grid].T.reshape(len(self.base.offsets), x0, y0)
        return jnp.pad(planes, ((0, 0), (0, x - x0), (0, y - y0)))
