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

    # --- fast online solve for the MCMC hot loop ---------------------------
    def preconditioner(self, k_ref: jax.Array | None = None) -> jax.Array:
        """Dense P0 = Ahat(k_ref)^{-1} (default k_ref = 1), the fixed
        preconditioner for :meth:`solve_pcg`. Computed once offline in f64 on
        the host for accuracy, returned in the online dtype."""
        import numpy as np

        k_ref = np.ones(self.Ahat.shape[0]) if k_ref is None else np.asarray(k_ref, np.float64)
        A = np.tensordot(k_ref, np.asarray(self.Ahat, np.float64), axes=1) + self.biot * np.asarray(
            self.Mhat, np.float64
        )
        return jnp.asarray(np.linalg.inv(A), self.Ahat.dtype)

    def solve_pcg(
        self, k: jax.Array, P0: jax.Array, n_iters: int = 25, precision=None,
        differentiable: bool = True,
    ) -> jax.Array:
        """Reduced solve by preconditioned CG with a FIXED iteration count.

        XLA's batched Cholesky runs the r x r factorization at ~5 GFLOP/s on
        TPU (sequential panels), making it 99% of the pCN step cost. This
        route has no factorization at all: A(k) u is five shared-weight
        (batch, r) @ (r, r) matmuls and the preconditioner is one more — pure
        MXU work under vmap. With P0 = Ahat(1)^{-1} and log-normal k, ~25
        iterations reach ~1e-6, far below observation noise. Fixed iterations
        keep the cost constant and scan/vmap-friendly (no convergence
        branch).

        precision: None -> HIGHEST (full f32; default — the TPU bf16 matmul
        default would floor the solve at ~1e-3). Passing
        lax.Precision.DEFAULT runs the CG matmuls single-pass bf16: the
        solve saturates at ~3e-2 relative error but the chain step is ~2.1x
        faster; pair it with an NN surrogate TRAINED ON THE SAME PATH, which
        absorbs most of the systematic solver error (measured: corrected
        residual 2.8e-3; full-pipeline posterior KS vs the full-precision
        run ranges 0.05-0.3 at noise=1e-3 depending on the truth location —
        use for exploratory runs or observation noise >= ~1e-2, not for
        final tight-noise posteriors). See ROMConfig.online_precision."""
        hi = jax.lax.Precision.HIGHEST if precision is None else precision
        k = jnp.asarray(k, self.Ahat.dtype)

        def amat(p):
            # sum_i k_i (Ahat_i p) + biot (Mhat p); vmap turns these into
            # shared-weight batched matmuls
            Ap = jnp.einsum("c,crs,s->r", k, self.Ahat, p, precision=hi)
            return Ap + self.Ahat.dtype.type(self.biot) * jnp.dot(self.Mhat, p, precision=hi)

        def prec(v):
            return jnp.dot(P0, v, precision=hi)

        def pcg_solve(mv, b):
            x = prec(b)  # warm start: P0 b is already close
            r_ = b - mv(x)
            # derive x from the (chain-varying) residual so every fori_loop
            # carry leaf shares the device-varying axis under shard_map —
            # b/P0 are replicated, the operator is per-chain (jax vma rules;
            # see parallel/sharding.py). b itself must stay untouched:
            # custom_linear_solve pvaries its operands internally.
            x = x + r_ * 0
            z = prec(r_)
            p = z
            rz = jnp.vdot(r_, z)

            def body(_, carry):
                x, r_, p, rz = carry
                Ap = mv(p)
                pAp = jnp.vdot(p, Ap)
                alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
                x = x + alpha * p
                r_ = r_ - alpha * Ap
                z = prec(r_)
                rz_new = jnp.vdot(r_, z)
                beta = rz_new / jnp.where(rz != 0, rz, 1.0)
                return x, r_, z + beta * p, rz_new

            x, _, _, _ = jax.lax.fori_loop(0, n_iters, body, (x, r_, p, rz))
            return x

        # Implicit differentiation: reverse-mode through converged CG
        # iterations produces 0/0 cotangents (denormal residuals); the
        # adjoint solve reuses the same preconditioned CG.
        if differentiable:
            return jax.lax.custom_linear_solve(amat, self.Fhat, solve=pcg_solve, symmetric=True)
        # direct call — for sampler hot loops, which never differentiate the
        # likelihood. Also the shard_map-compatible route: custom_linear_solve's
        # internal vma (pvary) bookkeeping rejects chain-sharded operands.
        return pcg_solve(amat, self.Fhat)

    def fast_forward(self, P0: jax.Array, n_iters: int = 25, precision=None,
                     differentiable: bool = True):
        """k -> y_r via solve_pcg; the likelihood kernel for the MCMC hot
        loop (vmap over chains gives pure-MXU batched matmuls). See
        solve_pcg for the precision and differentiable options."""
        hi = jax.lax.Precision.HIGHEST

        def f(k):
            return jnp.dot(
                self.Bhat,
                self.solve_pcg(k, P0, n_iters, precision=precision,
                               differentiable=differentiable),
                precision=hi,
            )

        return f

    def lift(self, u_r: jax.Array) -> jax.Array:
        # full f32: the greedy residual indicator subtracts A(k) lift(u_r)
        # from F, and a bf16 lift floors the indicator at ~1e-1 (breaking
        # greedy selection on TPU entirely) — CLAUDE.md rule 4
        return jnp.dot(self.V, u_r, precision=jax.lax.Precision.HIGHEST)

    def residual_norm(self, op: FinOperator, k: jax.Array) -> jax.Array:
        """Full-space residual ||F - A(k) V u_r(k)|| — the greedy error
        indicator (SURVEY.md §3.3) and an a-posteriori error proxy."""
        u_r = self.solve(k)
        r = op.F_root - op.apply(k, self.lift(u_r))
        return jnp.linalg.norm(r)
