"""Full-field (nodal) conductivity fin model (SURVEY.md §2a #4, A.2).

The non-affine variant: conductivity is a nodal field k(x) = exp(theta(x))
sampled from a Gaussian random field. A(k) cannot be precomputed as five
affine pieces, so the operator is applied *matrix-free per element*:
gather nodal values, scale the unit element stiffness by the element's mean
conductivity, and scatter-add via a sorted ``segment_sum`` (sorted on the host
once, so the device-side reduction is a TPU-friendly sorted segment reduce —
SURVEY.md §7 Hard parts #2).

This element-apply path is exactly the computation the Pallas element kernel
in ``ops/`` accelerates (BASELINE north-star: "Pallas kernels over
HBM-resident element arrays").
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bayesianinferencedl_tpu.fem import p1
from bayesianinferencedl_tpu.fem.operators import FinOperator
from bayesianinferencedl_tpu.fem.solve import pcg
from bayesianinferencedl_tpu.geometry.mesh import FinMesh


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tri", "Ke_unit", "scatter_perm", "scatter_ids", "diag_unit"],
    meta_fields=["n"],
)
@dataclasses.dataclass(frozen=True)
class ElementOperator:
    """Matrix-free per-element stiffness apply for nodal conductivity.

    tri:          (nt, 3) int32 node ids
    Ke_unit:      (nt, 3, 3) unit-conductivity element stiffness
    scatter_perm: (nt*3,) permutation sorting the flattened row ids
    scatter_ids:  (nt*3,) the sorted row ids (segment ids)
    diag_unit:    (nt, 3) diagonal entries of Ke_unit
    """

    tri: jax.Array
    Ke_unit: jax.Array
    scatter_perm: jax.Array
    scatter_ids: jax.Array
    diag_unit: jax.Array
    n: int

    @classmethod
    def from_mesh(cls, mesh: FinMesh, n_padded: int, dtype=jnp.float32) -> "ElementOperator":
        Ke, _ = p1.element_stiffness(mesh.nodes, mesh.triangles)
        rows = mesh.triangles.reshape(-1)
        perm = np.argsort(rows, kind="stable")
        return cls(
            tri=jnp.asarray(mesh.triangles, jnp.int32),
            Ke_unit=jnp.asarray(Ke, dtype),
            scatter_perm=jnp.asarray(perm, jnp.int32),
            scatter_ids=jnp.asarray(rows[perm], jnp.int32),
            diag_unit=jnp.asarray(Ke[:, [0, 1, 2], [0, 1, 2]], dtype),
            n=int(n_padded),
        )

    def elem_conductivity(self, k_nodal: jax.Array) -> jax.Array:
        """Element conductivity = arithmetic mean of the 3 nodal values."""
        return jnp.mean(k_nodal[self.tri], axis=1)

    def apply(self, k_nodal: jax.Array, u: jax.Array) -> jax.Array:
        """u -> A(k) u, matrix-free (stiffness part only)."""
        ke = self.elem_conductivity(k_nodal)
        u_e = u[self.tri]  # (nt, 3)
        w_e = ke[:, None] * jnp.einsum(
            "eab,eb->ea", self.Ke_unit, u_e, precision=jax.lax.Precision.HIGHEST
        )
        contrib = w_e.reshape(-1)[self.scatter_perm]
        return jax.ops.segment_sum(
            contrib, self.scatter_ids, num_segments=self.n, indices_are_sorted=True
        )

    def diag(self, k_nodal: jax.Array) -> jax.Array:
        ke = self.elem_conductivity(k_nodal)
        contrib = (ke[:, None] * self.diag_unit).reshape(-1)[self.scatter_perm]
        return jax.ops.segment_sum(
            contrib, self.scatter_ids, num_segments=self.n, indices_are_sorted=True
        )


class RandomField(NamedTuple):
    """Squared-exponential Gaussian random field via random Fourier features:
    theta(x) ~ GP(mean, sigma^2 exp(-|x-x'|^2 / (2 ell^2))), approximated with
    M features so a sample is one (n, M) matvec (SURVEY.md §2a #4)."""

    features: jax.Array  # (n, M): sqrt(2/M) cos(X W + b)
    sigma: float
    mean: float

    @classmethod
    def create(
        cls,
        mesh: FinMesh,
        n_padded: int,
        *,
        ell: float = 1.0,
        sigma: float = 0.5,
        mean: float = 0.0,
        n_features: int = 256,
        seed: int = 0,
        dtype=jnp.float32,
        node_ids=None,
    ) -> "RandomField":
        """node_ids: (n_nodes,) solution-vector row of each MESH node in the
        layout that will consume the sampled field — ``None`` (identity) for
        the ELL/element layout, the structured-grid ids for the dia/stencil
        layout (infer/oed.py mesh_node_grid_ids). The features matrix MUST be
        laid out the way the operator reads k: getting this wrong silently
        replaces the GP with a node-scrambled, partially-constant field
        (found + fixed round 3 — the dia full-field pipeline used the
        identity placement while NodalStencilOperator.vals reads grid rows).
        Rows not owned by any mesh node are zero (field = mean there; the
        operator never reads them — G is zero off-domain)."""
        key = jax.random.PRNGKey(seed)
        kw, kb = jax.random.split(key)
        W = jax.random.normal(kw, (2, n_features)) / ell
        b = jax.random.uniform(kb, (n_features,), maxval=2 * jnp.pi)
        ids = (
            jnp.arange(mesh.n_nodes)
            if node_ids is None
            else jnp.asarray(np.asarray(node_ids), jnp.int32)
        )
        feats_n = jnp.sqrt(2.0 / n_features) * jnp.cos(
            jnp.asarray(mesh.nodes) @ W + b
        )  # (n_nodes, M) at the true node coordinates
        feats = jnp.zeros((n_padded, n_features)).at[ids].set(feats_n)
        return cls(features=feats.astype(dtype), sigma=float(sigma), mean=float(mean))

    @property
    def n_features(self) -> int:
        return self.features.shape[1]

    def sample(self, key: jax.Array, n_samples: int | None = None) -> jax.Array:
        shape = (self.n_features,) if n_samples is None else (n_samples, self.n_features)
        z = jax.random.normal(key, shape, dtype=self.features.dtype)
        return self.mean + self.sigma * jnp.dot(
            z, self.features.T, precision=jax.lax.Precision.HIGHEST
        )


@dataclass
class FullFieldFin:
    """Fin forward model with nodal log-conductivity theta (non-affine)."""

    op: FinOperator  # supplies ext mass, padding identity, loads, QoI
    elem: ElementOperator
    field: RandomField
    cg_tol: float = 1e-10
    cg_maxiter: int = 3000

    @classmethod
    def create(
        cls,
        mesh: FinMesh,
        host,
        *,
        biot: float = 0.1,
        dtype=jnp.float32,
        ell: float = 1.0,
        sigma: float = 0.5,
        n_features: int = 256,
        seed: int = 0,
        cg_tol: float = 1e-10,
        cg_maxiter: int = 3000,
    ) -> "FullFieldFin":
        op = FinOperator.from_host(host, biot=biot, dtype=dtype)
        elem = ElementOperator.from_mesh(mesh, n_padded=host.n, dtype=dtype)
        field = RandomField.create(
            mesh, host.n, ell=ell, sigma=sigma, n_features=n_features, seed=seed, dtype=dtype
        )
        return cls(op=op, elem=elem, field=field, cg_tol=cg_tol, cg_maxiter=cg_maxiter)

    def apply(self, theta: jax.Array, u: jax.Array) -> jax.Array:
        """u -> A(exp(theta)) u including Robin boundary + padding identity."""
        k = jnp.exp(theta)
        return self.elem.apply(k, u) + self._robin(u)

    def _robin(self, u: jax.Array) -> jax.Array:
        dt = self.op.ext_mass.dtype
        vals = dt.type(self.op.biot) * self.op.ext_mass + self.op.fixed
        return jnp.sum(vals * u[self.op.cols], axis=-1)

    def solve(self, theta: jax.Array) -> jax.Array:
        """A(exp theta) u = F_root, differentiable in theta via implicit diff."""
        k = jnp.exp(theta)
        diag = self.elem.diag(k) + self.op.diag(
            self.op.ext_mass * self.op.ext_mass.dtype.type(self.op.biot) + self.op.fixed
        )

        def mv(x):
            return self.elem.apply(k, x) + self._robin(x)

        def slv(matvec, b):
            x, _, _ = pcg(
                matvec, b, lax.stop_gradient(diag), tol=self.cg_tol, maxiter=self.cg_maxiter
            )
            return x

        return lax.custom_linear_solve(mv, self.op.F_root, solve=slv, symmetric=True)

    def forward(self, theta: jax.Array) -> jax.Array:
        """G: theta -> subfin-average observables."""
        return self.op.observe(self.solve(theta))

    def forward_batch(self, thetas: jax.Array) -> jax.Array:
        return jax.vmap(self.forward)(thetas)

    def sample_prior(self, key: jax.Array, n_samples: int | None = None) -> jax.Array:
        return self.field.sample(key, n_samples)

    # --- coefficient-space view for dimension-robust inversion -------------
    def theta_from_coeff(self, z: jax.Array) -> jax.Array:
        """RFF coefficients z (M,) -> nodal log-conductivity field."""
        return self.field.mean + self.field.sigma * jnp.dot(
            self.field.features, z, precision=jax.lax.Precision.HIGHEST
        )

    def forward_coeff(self, z: jax.Array) -> jax.Array:
        """G in coefficient space: z -> observables. With the standard-normal
        prior on z this is exactly the whitened-coordinate setup pCN wants —
        the full-field inverse problem becomes an M-dimensional pCN chain
        whose cost per step is one FOM solve, fully fused on device
        (SURVEY.md §2a #4 + A.5)."""
        return self.forward(self.theta_from_coeff(z))

    def coeff_prior(self, dtype=None):
        """N(0, I_M) prior over RFF coefficients."""
        from bayesianinferencedl_tpu.infer.priors import GaussianPrior

        return GaussianPrior.iid(
            self.field.n_features, mean=0.0, sigma=1.0,
            dtype=dtype or self.field.features.dtype,
        )
