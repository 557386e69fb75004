"""Stencil (DIA/diagonal) operator on the uncompacted structured grid —
the TPU speed-of-light layout for this problem.

The ELL layout (``assemble.py``) needs a gather per SpMV. But the fin mesh is
a structured triangulation: if node ids keep the full (nx+1) x (ny+1) grid
numbering (outside-domain nodes become identity rows), every stiffness /
boundary-mass entry lands on one of exactly SEVEN diagonals:

    offsets: 0, +-1, +-(ny+1), +-(ny+2)

so A(k) stores as (n, 7) diagonal values and SpMV is seven shift-multiply-
adds of a padded vector — no gather, no scatter, pure VPU streaming. This is
the representation the fused Pallas PCG kernel consumes (ops/), and it is
also fast under plain XLA (static slices fuse).

Memory trade: the full grid carries ~2.5x more rows than the compacted mesh,
all of them cheap identity lanes — a bargain for losing the gather.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.geometry.fin import N_REGIONS
from bayesianinferencedl_tpu.geometry.mesh import FinMesh
from bayesianinferencedl_tpu.fem import p1


@dataclass
class FinFEMDiaHost:
    """Host-side stencil assembly. Diagonal order is ascending offset."""

    offsets: np.ndarray  # (n_diag,) int64, e.g. [-(ny+2), -(ny+1), -1, 0, 1, ny+1, ny+2]
    comp_vals: np.ndarray  # (n, n_diag, 5)
    ext_mass: np.ndarray  # (n, n_diag)
    fixed: np.ndarray  # (n, n_diag) identity for non-domain rows + padding
    F_root: np.ndarray  # (n,)
    qoi: np.ndarray  # (n_obs, n)
    qoi_root: np.ndarray  # (n,)
    n_grid: int  # true structured-grid node count before padding
    resolution: int

    @property
    def n(self) -> int:
        return self.comp_vals.shape[0]

    def to_scipy_components(self):
        """float64 scipy CSR matrices ([A_1..A_5], M_ext) of this host —
        for exact offline algebra (f64 Galerkin projection) and oracles."""
        import scipy.sparse as sp

        n = self.n
        rows = np.arange(n)
        n_comp = self.comp_vals.shape[2]
        mats = []
        for ch in range(n_comp + 1):
            data_all, r_all, c_all = [], [], []
            for s, off in enumerate(self.offsets):
                vals = self.comp_vals[:, s, ch] if ch < n_comp else self.ext_mass[:, s]
                cols = rows + int(off)
                ok = (cols >= 0) & (cols < n) & (vals != 0)
                data_all.append(vals[ok])
                r_all.append(rows[ok])
                c_all.append(cols[ok])
            mats.append(
                sp.coo_matrix(
                    (np.concatenate(data_all), (np.concatenate(r_all), np.concatenate(c_all))),
                    shape=(n, n),
                ).tocsr()
            )
        return mats[:-1], mats[-1]


def assemble_fin_dia(mesh: FinMesh, pad_to: int = 128) -> FinFEMDiaHost:
    """Assemble the affine fin operator in stencil form on the full grid.

    Reconstructs each kept node's structured-grid id from its coordinates
    (the structured mesh guarantees exact lattice coordinates), then
    accumulates element/edge contributions by diagonal offset.
    """
    n_res = mesh.resolution
    h = 0.25 / n_res
    ny = 16 * n_res
    # structured-grid id of each mesh node
    gi = np.rint((mesh.nodes[:, 0] + 3.0) / h).astype(np.int64)
    gj = np.rint(mesh.nodes[:, 1] / h).astype(np.int64)
    gid = gi * (ny + 1) + gj
    n_grid = (24 * n_res + 1) * (ny + 1)
    n = ((n_grid + pad_to - 1) // pad_to) * pad_to

    offsets = np.array([-(ny + 2), -(ny + 1), -1, 0, 1, ny + 1, ny + 2], dtype=np.int64)
    off_slot = {int(o): s for s, o in enumerate(offsets)}
    nd = len(offsets)

    comp_vals = np.zeros((n, nd, N_REGIONS))
    ext_mass = np.zeros((n, nd))

    Ke, _ = p1.element_stiffness(mesh.nodes, mesh.triangles)
    tri_g = gid[mesh.triangles]  # (nt, 3) global ids

    # accumulate stiffness entries by (row gid, offset slot, region)
    for a in range(3):
        for b in range(3):
            rows = tri_g[:, a]
            offs = tri_g[:, b] - tri_g[:, a]
            slot_of = np.vectorize(off_slot.__getitem__, otypes=[np.int64])(offs)
            np.add.at(comp_vals, (rows, slot_of, mesh.tri_region), Ke[:, a, b])

    Me = p1.edge_mass(mesh.nodes, mesh.ext_edges)
    edge_g = gid[mesh.ext_edges]  # (ne, 2)
    for a in range(2):
        for b in range(2):
            rows = edge_g[:, a]
            offs = edge_g[:, b] - edge_g[:, a]
            slot_of = np.vectorize(off_slot.__getitem__, otypes=[np.int64])(offs)
            np.add.at(ext_mass, (rows, slot_of), Me[:, a, b])

    # identity rows for any grid node with no stiffness diagonal (outside the
    # fin) and for padding rows
    diag_slot = off_slot[0]
    has_dof = comp_vals[:, diag_slot, :].sum(axis=1) > 0
    fixed = np.zeros((n, nd))
    fixed[~has_dof, diag_slot] = 1.0

    F_root = np.zeros(n)
    load = p1.edge_load(mesh.nodes, mesh.root_edges)
    np.add.at(F_root, gid[mesh.root_edges].reshape(-1), load.reshape(-1))

    area = mesh.tri_areas()
    qoi = np.zeros((N_REGIONS, n))
    w = np.repeat(area[:, None] / 3.0, 3, axis=1).reshape(-1)
    np.add.at(qoi, (mesh.tri_region.repeat(3), tri_g.reshape(-1)), w)
    qoi /= qoi.sum(axis=1, keepdims=True)

    qoi_root = np.zeros(n)
    np.add.at(qoi_root, gid[mesh.root_edges].reshape(-1), load.reshape(-1))
    qoi_root /= qoi_root.sum()

    return FinFEMDiaHost(
        offsets=offsets,
        comp_vals=comp_vals,
        ext_mass=ext_mass,
        fixed=fixed,
        F_root=F_root,
        qoi=qoi,
        qoi_root=qoi_root,
        n_grid=n_grid,
        resolution=n_res,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["comp_vals", "ext_mass", "fixed", "F_root", "qoi", "qoi_root"],
    meta_fields=["offsets", "biot", "n_grid"],
)
@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """Device-side 7-diagonal affine operator (gather-free SpMV)."""

    comp_vals: jax.Array  # (n, 7, 5)
    ext_mass: jax.Array  # (n, 7)
    fixed: jax.Array  # (n, 7)
    F_root: jax.Array  # (n,)
    qoi: jax.Array  # (n_obs, n)
    qoi_root: jax.Array  # (n,)
    offsets: tuple  # static tuple of python ints
    biot: float
    n_grid: int

    @classmethod
    def from_host(cls, host: FinFEMDiaHost, biot: float, dtype=jnp.float32) -> "StencilOperator":
        return cls(
            comp_vals=jnp.asarray(host.comp_vals, dtype),
            ext_mass=jnp.asarray(host.ext_mass, dtype),
            fixed=jnp.asarray(host.fixed, dtype),
            F_root=jnp.asarray(host.F_root, dtype),
            qoi=jnp.asarray(host.qoi, dtype),
            qoi_root=jnp.asarray(host.qoi_root, dtype),
            offsets=tuple(int(o) for o in host.offsets),
            biot=float(biot),
            n_grid=int(host.n_grid),
        )

    @property
    def n(self) -> int:
        return self.comp_vals.shape[0]

    @property
    def n_dof(self) -> int:
        """Grid node count (identity rows included — the stencil layout's
        meaningful 'dof' figure for logs; cf. FinOperator.n_dof)."""
        return self.n_grid

    @property
    def n_obs(self) -> int:
        return self.qoi.shape[0]

    @property
    def dtype(self):
        return self.comp_vals.dtype

    @property
    def max_offset(self) -> int:
        return max(abs(o) for o in self.offsets)

    @property
    def resolution(self) -> int:
        """Mesh resolution, recovered from the stencil layout: the second-
        largest offset is ny+1 with ny = 16 * resolution (assemble_fin_dia)."""
        return (self.offsets[-2] - 1) // 16

    def vals(self, k: jax.Array) -> jax.Array:
        # elementwise multiply-sum, NOT tensordot: TPU matmuls default to
        # bfloat16 MXU passes, which caps the assembled operator (and hence
        # every solve) at ~1e-3 relative accuracy; the VPU keeps full f32.
        k = jnp.asarray(k, self.dtype)
        return (
            jnp.sum(self.comp_vals * k[None, None, :], axis=-1)
            + self.dtype.type(self.biot) * self.ext_mass
            + self.fixed
        )

    def matvec(self, vals: jax.Array, u: jax.Array) -> jax.Array:
        """Seven shift-multiply-adds on a zero-padded vector; no gather."""
        m = self.max_offset
        n = self.n
        u_pad = jnp.pad(u, (m, m))
        acc = jnp.zeros_like(u)
        for s, off in enumerate(self.offsets):
            acc = acc + vals[:, s] * jax.lax.dynamic_slice(u_pad, (m + off,), (n,))
        return acc

    def apply(self, k: jax.Array, u: jax.Array) -> jax.Array:
        return self.matvec(self.vals(k), u)

    def apply_component(self, i: int, u: jax.Array) -> jax.Array:
        """u -> A_i u (region component; Galerkin projection + adjoint oracle)."""
        return self.matvec(self.comp_vals[:, :, i], u)

    def apply_ext_mass(self, u: jax.Array) -> jax.Array:
        """u -> (M_ext + I_pad) u."""
        return self.matvec(self.ext_mass + self.fixed, u)

    def diag(self, vals: jax.Array) -> jax.Array:
        return vals[:, self.offsets.index(0)]

    def observe(self, u: jax.Array) -> jax.Array:
        """QoI map y = B u (full f32 — see vals() on TPU matmul precision)."""
        return jnp.dot(self.qoi, u, precision=jax.lax.Precision.HIGHEST)

    # --- 2-D grid view (for the fused Pallas PCG kernel, ops/pcg_stencil) --
    @property
    def grid_shape0(self) -> tuple[int, int]:
        """True structured-grid shape (nx+1, ny+1); flat id = ix*(ny+1)+iy."""
        y0 = self.offsets[-2]  # ny+1 offset
        return self.n_grid // y0, y0

    @property
    def grid_shape(self) -> tuple[int, int]:
        """Tile-aligned grid shape: sublane dim to 8, lane dim to 128."""
        x0, y0 = self.grid_shape0
        return ((x0 + 7) // 8) * 8, ((y0 + 127) // 128) * 128

    def to_grid(self, v_flat: jax.Array) -> jax.Array:
        """(n,) flat vector -> (X, Y) padded 2-D grid array."""
        x0, y0 = self.grid_shape0
        x, y = self.grid_shape
        a = v_flat[: self.n_grid].reshape(x0, y0)
        return jnp.pad(a, ((0, x - x0), (0, y - y0)))

    def from_grid(self, a: jax.Array) -> jax.Array:
        """(X, Y) grid array -> (n,) flat vector (padding tail zeroed)."""
        x0, y0 = self.grid_shape0
        flat = a[:x0, :y0].reshape(-1)
        return jnp.pad(flat, (0, self.n - self.n_grid))

    def vals_grid(self, k: jax.Array) -> jax.Array:
        """Diagonal-plane stack (7, X, Y) of A(k) for the stencil kernel."""
        vals = self.vals(k)  # (n, 7)
        x0, y0 = self.grid_shape0
        x, y = self.grid_shape
        planes = vals[: self.n_grid].T.reshape(7, x0, y0)
        return jnp.pad(planes, ((0, 0), (0, x - x0), (0, y - y0)))

    def materialize(self, k: jax.Array) -> jax.Array:
        """Dense A(k) for tests."""
        vals = self.vals(k)
        n = self.n
        A = jnp.zeros((n, n), dtype=self.dtype)
        rows = jnp.arange(n)
        for s, off in enumerate(self.offsets):
            cols = rows + off
            valid = (cols >= 0) & (cols < n)
            A = A.at[rows, jnp.clip(cols, 0, n - 1)].add(jnp.where(valid, vals[:, s], 0.0))
        return A
