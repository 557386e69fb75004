"""shard_map wrappers: chains, snapshots, and data-parallel training shards
over the ICI mesh (SURVEY.md §2c; BASELINE config 5 "1k chains vmapped,
pmapped across v5e-8" — expressed with shard_map, the modern spelling).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bayesianinferencedl_tpu.infer.pcn import PCNResult, run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.models.surrogate import MLP, adam_update


def sharded_pcn(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    thin: int = 1,
    batched: bool = False,
    adapt_t0=0.0,
) -> PCNResult:
    """Run pCN with the chain batch sharded over the mesh axis.

    theta0: (n_chains, d) with n_chains divisible by the mesh size. Each
    device runs its chain shard fully locally (chains are independent — zero
    per-step communication); only the RNG key is decorrelated per device.

    beta: scalar or per-chain (n_chains,) array (e.g. adapted betas carried
    across segments). batched=True marks misfit_fn as whole-shard-batched
    (e.g. the fused Pallas FOM solver on the local chain shard).
    """
    axis = mesh.axis_names[0]
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, beta_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        return run_pcn(
            misfit_fn,
            prior,
            theta0_shard,
            dev_key,
            n_steps=n_steps,
            n_burn=n_burn,
            beta=beta_shard,
            thin=thin,
            batched=batched,
            adapt_t0=adapt_t0,
        )

    # out_specs: every leaf is chain-sharded on its chain axis.
    from bayesianinferencedl_tpu.infer.pcn import PCNState

    out_specs = PCNResult(
        state=PCNState(theta=P(axis), phi=P(axis), n_accept=P(axis)),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        beta=P(axis),
    )
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs)
    return f(theta0, beta_arr, key)


def sharded_pcn_segmented(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    segment: int = 64,
    batched: bool = False,
) -> PCNResult:
    """Sharded pCN in fixed-size segments (watchdog-safe; infer.segmented):
    chain state, adapted per-chain betas, and accept counts carry across
    segments exactly like infer.pcn.run_pcn_segmented on one device."""
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = sharded_pcn(
            mesh, misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, thin=1, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype),
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return PCNResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], beta=betas,
    )


def sharded_mala(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    thin: int = 1,
    batched: bool = False,
    adapt_t0=0.0,
    ref=None,
):
    """Preconditioned MALA with the chain batch sharded over the mesh axis
    (same contract as sharded_pcn: chains are independent, zero per-step
    communication; gradients are per-shard vjps of the local chain batch).

    check_vma=False: the differentiable likelihoods route every solve
    through lax.custom_linear_solve, whose internal pvary bookkeeping
    rejects chain-varying operands under shard_map (rom/galerkin.py notes
    the same for the direct route). MALA needs no collectives at all —
    chains are independent and the RNG fold_in uses only axis_index — so
    disabling the varying-axis checker is sound here, not a workaround
    smell: there is no cross-device semantics for it to check."""
    from bayesianinferencedl_tpu.infer.mala import MALAResult, MALAState, run_mala

    axis = mesh.axis_names[0]
    step_arr = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, step_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        return run_mala(
            misfit_fn, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, step=step_shard, thin=thin,
            batched=batched, adapt_t0=adapt_t0, ref=ref,
        )

    out_specs = MALAResult(
        state=MALAState(
            y=P(axis), nlp=P(axis), phi=P(axis), grad=P(axis), n_accept=P(axis)
        ),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        step=P(axis),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs,
        check_vma=False,
    )
    return f(theta0, step_arr, key)


def sharded_mala_segmented(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    segment: int = 32,
    batched: bool = False,
    ref=None,
):
    """sharded_mala in fixed-size segments (watchdog-safe for FOM
    likelihoods — each step is a batched solve plus its adjoint solve);
    chain state and adapted per-chain step sizes carry across segments."""
    from bayesianinferencedl_tpu.infer.mala import MALAResult
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    steps0 = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])
    hi = jax.lax.Precision.HIGHEST
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)

    def seg(carry, sub, this, burn, start):
        thetas, hs = carry
        res = sharded_mala(
            mesh, misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, step=hs, thin=1, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype), ref=ref,
        )
        theta_now = ref_mean + jnp.dot(res.state.y, ref_chol.T, precision=hi)
        return res, (theta_now, res.step)

    res, (_, hs), samples, phis, rates, _ = drive_segments(
        seg, (theta0, steps0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return MALAResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], step=hs,
    )


def sharded_hmc(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    n_leap: int = 8,
    jitter: float = 0.2,
    thin: int = 1,
    batched: bool = False,
    adapt_t0=0.0,
    ref=None,
):
    """Jittered-trajectory HMC with the chain batch sharded over the mesh
    axis (infer/hmc.py). Same contract and check_vma rationale as
    sharded_mala — chains are independent, each device integrates its own
    leapfrog trajectories with per-shard fused vjps."""
    from bayesianinferencedl_tpu.infer.hmc import run_hmc
    from bayesianinferencedl_tpu.infer.mala import MALAResult, MALAState

    axis = mesh.axis_names[0]
    step_arr = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, step_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        return run_hmc(
            misfit_fn, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, step=step_shard, n_leap=n_leap,
            jitter=jitter, thin=thin, batched=batched, adapt_t0=adapt_t0,
            ref=ref,
        )

    out_specs = MALAResult(
        state=MALAState(
            y=P(axis), nlp=P(axis), phi=P(axis), grad=P(axis), n_accept=P(axis)
        ),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        step=P(axis),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs,
        check_vma=False,
    )
    return f(theta0, step_arr, key)


def sharded_hmc_segmented(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    n_leap: int = 8,
    jitter: float = 0.2,
    segment=None,
    batched: bool = False,
    ref=None,
):
    """sharded_hmc in fixed-size segments (watchdog-safe for FOM
    likelihoods — each trajectory is n_leap batched solves plus adjoints);
    chain state and adapted per-chain step sizes carry across segments.
    segment=None sizes the program to ~64 batched solves per shard:
    max(1, 32 // n_leap) trajectories."""
    if segment is None:
        segment = max(1, 32 // n_leap)
    from bayesianinferencedl_tpu.infer.mala import MALAResult
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    steps0 = jnp.broadcast_to(jnp.asarray(step, theta0.dtype), theta0.shape[:-1])
    hi = jax.lax.Precision.HIGHEST
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)

    def seg(carry, sub, this, burn, start):
        thetas, hs = carry
        res = sharded_hmc(
            mesh, misfit_fn, prior, thetas, sub,
            n_steps=this, n_burn=burn, step=hs, n_leap=n_leap, jitter=jitter,
            thin=1, batched=batched, adapt_t0=jnp.asarray(start, theta0.dtype),
            ref=ref,
        )
        theta_now = ref_mean + jnp.dot(res.state.y, ref_chol.T, precision=hi)
        return res, (theta_now, res.step)

    res, (_, hs), samples, phis, rates, _ = drive_segments(
        seg, (theta0, steps0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return MALAResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], step=hs,
    )


def sharded_lis_pcn(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    lis,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.5,
    thin: int = 1,
    batched: bool = False,
    adapt_t0=0.0,
) -> PCNResult:
    """Likelihood-informed-subspace pCN (infer/lis.py) with the chain batch
    sharded over the mesh axis. Chains are independent and the LIS basis is
    replicated (it is built ONCE offline) — zero per-step communication,
    same contract as sharded_pcn."""
    from bayesianinferencedl_tpu.infer.lis import run_lis_pcn
    from bayesianinferencedl_tpu.infer.pcn import PCNState

    axis = mesh.axis_names[0]
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, beta_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        return run_lis_pcn(
            misfit_fn, prior, lis, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, beta=beta_shard, thin=thin,
            batched=batched, adapt_t0=adapt_t0,
        )

    out_specs = PCNResult(
        state=PCNState(theta=P(axis), phi=P(axis), n_accept=P(axis)),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        beta=P(axis),
    )
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs)
    return f(theta0, beta_arr, key)


def sharded_lis_pcn_segmented(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    lis,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.5,
    segment: int = 64,
    batched: bool = False,
) -> PCNResult:
    """sharded_lis_pcn in fixed-size segments (watchdog-safe for the FOM
    likelihood); chain state and adapted per-chain beta0 carry across."""
    from bayesianinferencedl_tpu.infer.segmented import accept_rate_spec, drive_segments

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = sharded_lis_pcn(
            mesh, misfit_fn, prior, lis, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, thin=1, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype),
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment, rates={"accept": accept_rate_spec()},
    )
    return PCNResult(
        state=res.state, samples=samples, phi_trace=phis,
        accept_rate=rates["accept"], beta=betas,
    )


def sharded_snapshots(
    mesh: Mesh,
    op,
    ks: jax.Array,
    *,
    tol: float = 1e-10,
    maxiter: int = 3000,
) -> jax.Array:
    """Batched FOM snapshot generation sharded over the sample axis."""
    from bayesianinferencedl_tpu.rom.snapshots import generate_snapshots

    axis = mesh.axis_names[0]

    def local(k_shard):
        # Mark the (replicated) operator arrays as device-varying so mixed
        # gather/compare ops inside the solver see consistent vma axes.
        op_v = jax.tree.map(lambda x: jax.lax.pcast(x, (axis,), to="varying"), op)
        return generate_snapshots(op_v, k_shard, tol=tol, maxiter=maxiter)

    f = jax.shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return f(ks)


def dp_train_step(
    mesh: Mesh,
    mlp: MLP,
    params,
    opt_state,
    xb: jax.Array,
    yb: jax.Array,
    lr: float,
):
    """One data-parallel surrogate training step: per-device loss/grad on the
    local batch shard, gradients psum-averaged over ICI, replicated update.
    Returns (params, opt_state, loss)."""
    axis = mesh.axis_names[0]

    def local(p, opt, x_shard, y_shard):
        def loss_fn(pp):
            pred = mlp.apply(pp, x_shard)
            return jnp.mean((pred - y_shard) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # jax's shard_map vma semantics auto-psums the gradient of replicated
        # params w.r.t. sharded data (the transpose of the implicit
        # broadcast), so `grads` arrives as the SUM over devices and is
        # already replicated — divide by the axis size to get the mean.
        # (test_parallel.py pins this to the single-device reference.)
        n_dev = jax.lax.axis_size(axis)
        grads = jax.tree.map(lambda g: g / n_dev, grads)
        loss = jax.lax.pmean(loss, axis)
        p, opt = adam_update(p, grads, opt, lr)
        return p, opt, loss

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    return f(params, opt_state, xb, yb)


def sharded_da_pcn(
    mesh: Mesh,
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    batched_fine: bool = False,
    batched_coarse: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
):
    """Delayed-acceptance pCN with the chain batch sharded over the mesh.

    Chains are independent, so each device runs its shard fully locally —
    including its own batched fine (Pallas FOM) evaluations — with only the
    RNG decorrelated per device. Same contract as sharded_pcn.

    inner="mala" (gradient-informed subchains) disables vma checking: the
    differentiable coarse misfit routes solves through custom_linear_solve,
    whose pvary bookkeeping rejects chain-varying operands under shard_map
    (see sharded_mala — DA needs no collectives either)."""
    from bayesianinferencedl_tpu.infer.delayed_acceptance import (
        DAResult, DAState, run_da_pcn,
    )

    axis = mesh.axis_names[0]
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, beta_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_da_pcn(
            misfit_fine, misfit_coarse, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, beta=beta_shard, subchain=subchain,
            batched_fine=batched_fine, batched_coarse=batched_coarse,
            adapt_t0=adapt_t0, inner=inner,
        )
        # the int leaf must be an array to carry a replicated out-spec
        return res._replace(n_fine_evals=jnp.int32(res.n_fine_evals))

    out_specs = DAResult(
        state=DAState(theta=P(axis), phi_f=P(axis), phi_c=P(axis), n_accept=P(axis)),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        inner_accept_rate=P(axis),
        beta=P(axis),
        n_fine_evals=P(),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs,
        check_vma=(inner != "mala"),
    )
    return f(theta0, beta_arr, key)


def sharded_pt_da(
    mesh: Mesh,
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    batched: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
    adapt_ladder: bool = False,
    ladder=None,
):
    """Tempered DA with the chain-GROUP axis sharded over the mesh.

    The temperature ladder couples levels within a chain group, never across
    groups, so each device holds the full K-level ladder for its shard of
    groups; swaps are shard-local and the reported swap_rate is pmean'd over
    the mesh. theta0: (G, d) cold-level inits or (K, G, d) per-level resume
    states; beta: scalar or (K, G) adapted step sizes (resume). G divisible
    by the mesh size. inner="mala" (gradient-informed subchains) disables
    vma checking for the same custom_linear_solve reason as sharded_da_pcn."""
    from bayesianinferencedl_tpu.infer.tempering import PTDAResult, run_pt_da

    axis = mesh.axis_names[0]
    theta_spec = P(axis) if theta0.ndim == 2 else P(None, axis)
    beta_is_arr = hasattr(beta, "ndim") and beta.ndim == 2
    beta_spec = P(None, axis) if beta_is_arr else P()
    # ladder: None | (K,) shared | (K, G) per-group (G sharded like theta)
    ladder_is_kg = ladder is not None and getattr(ladder, "ndim", 1) == 2
    ladder_spec = P(None, axis) if ladder_is_kg else P()
    ladder_in = (
        jnp.zeros((0,), theta0.dtype) if ladder is None
        else jnp.asarray(ladder, theta0.dtype)
    )

    def local(theta0_shard, beta_in, ladder_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_pt_da(
            misfit_fine, misfit_coarse, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, beta=beta_in, subchain=subchain,
            n_temps=n_temps, lambda_min=lambda_min, batched=batched,
            adapt_t0=adapt_t0, inner=inner, adapt_ladder=adapt_ladder,
            ladder=ladder_shard if ladder is not None else None,
        )
        return res._replace(
            swap_rate=jax.lax.pmean(res.swap_rate, axis),
            n_fine_evals=jnp.int32(res.n_fine_evals),
        )

    out_specs = PTDAResult(
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(None, axis),
        inner_accept_rate=P(None, axis),
        swap_rate=P(),
        beta=P(None, axis),
        theta=P(None, axis),
        n_fine_evals=P(),
        lambdas=P(None, axis),
        phi_level_mean=P(None, axis),
        phi2_level_mean=P(None, axis),
        ss_level_mean=P(None, axis),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(theta_spec, beta_spec, ladder_spec, P()),
        out_specs=out_specs,
        check_vma=(inner != "mala"),
    )
    return f(theta0, beta if beta_is_arr else jnp.asarray(beta, theta0.dtype),
             ladder_in, key)


def sharded_pt_pcn(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,  # (G, d)
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta: float = 0.25,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    batched: bool = False,
    adapt_ladder: bool = False,
):
    """Parallel-tempered pCN with the chain-GROUP axis sharded over the mesh
    (each device owns the full K-level ladder for its shard of groups; swaps
    are shard-local, reported swap_rate is pmean'd; with adapt_ladder each
    device tunes per-group ladders for its own shard — no collectives)."""
    from bayesianinferencedl_tpu.infer.tempering import PTResult, run_pt_pcn

    axis = mesh.axis_names[0]

    def local(theta0_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_pt_pcn(
            misfit_fn, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, beta=beta,
            n_temps=n_temps, lambda_min=lambda_min, batched=batched,
            adapt_ladder=adapt_ladder,
        )
        return res._replace(swap_rate=jax.lax.pmean(res.swap_rate, axis))

    out_specs = PTResult(
        samples=P(None, axis), phi_trace=P(None, axis), accept_rate=P(None, axis),
        swap_rate=P(), beta=P(None, axis), theta=P(None, axis),
        lambdas=P(None, axis), phi_level_mean=P(None, axis),
        phi2_level_mean=P(None, axis), ss_level_mean=P(None, axis),
    )
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P()), out_specs=out_specs)
    return f(theta0, key)


def sharded_pt_mala(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,  # (G, d)
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    batched: bool = False,
    adapt_ladder: bool = False,
):
    """Gradient-informed parallel tempering with the chain-GROUP axis sharded
    over the mesh (each device owns the full K-level ladder for its shard of
    groups; swaps are shard-local, reported swap_rate is pmean'd).

    check_vma=False for the same reason as sharded_mala: the differentiable
    likelihoods route solves through lax.custom_linear_solve, whose internal
    pvary bookkeeping rejects chain-varying operands under shard_map; the
    sampler itself needs no collectives (groups are independent)."""
    from bayesianinferencedl_tpu.infer.tempering import PTMALAResult, run_pt_mala

    axis = mesh.axis_names[0]

    def local(theta0_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_pt_mala(
            misfit_fn, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, step=step,
            n_temps=n_temps, lambda_min=lambda_min, batched=batched,
            adapt_ladder=adapt_ladder,
        )
        return res._replace(swap_rate=jax.lax.pmean(res.swap_rate, axis))

    out_specs = PTMALAResult(
        samples=P(None, axis), phi_trace=P(None, axis), accept_rate=P(None, axis),
        swap_rate=P(), step=P(None, axis), theta=P(None, axis),
        lambdas=P(None, axis), phi_level_mean=P(None, axis),
        phi2_level_mean=P(None, axis), ss_level_mean=P(None, axis),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()), out_specs=out_specs,
        check_vma=False,
    )
    return f(theta0, key)


def sharded_da_pcn_segmented(
    mesh: Mesh,
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    segment: int = 64,
    batched_fine: bool = False,
    batched_coarse: bool = False,
    inner: str = "pcn",
):
    """sharded_da_pcn in fixed-size outer segments (watchdog-safe;
    infer.segmented); chain state and adapted betas carry across segments."""
    from bayesianinferencedl_tpu.infer.delayed_acceptance import DAResult
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments, inner_accept_rate_spec,
    )

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = sharded_da_pcn(
            mesh, misfit_fine, misfit_coarse, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchain=subchain,
            batched_fine=batched_fine, batched_coarse=batched_coarse,
            adapt_t0=jnp.asarray(start, theta0.dtype), inner=inner,
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn, segment=segment,
        rates={"accept": accept_rate_spec(), "inner": inner_accept_rate_spec(subchain)},
    )
    return DAResult(
        state=res.state,
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        inner_accept_rate=rates["inner"],
        beta=betas,
        n_fine_evals=n_steps + (n_steps + segment - 1) // segment,
    )


def sharded_mlda(
    mesh: Mesh,
    misfits: tuple,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchains: tuple = (8, 4),
    batched: bool = False,
    adapt_t0=0.0,
    inner: str = "pcn",
):
    """Multilevel delayed acceptance (infer/mlda.py) with the chain batch
    sharded over the mesh. Chains are independent, so each device runs its
    shard fully locally — every rung's batch evaluations included — with
    only the RNG decorrelated per device. Same contract as sharded_da_pcn.

    check_vma=False (same reason as sharded_mala): the fine rung is a
    full-order misfit, which on the non-Pallas path routes solves through
    ``lax.custom_linear_solve``, whose pvary bookkeeping rejects
    chain-varying operands under shard_map. MLDA needs no collectives, so
    nothing is lost."""
    from bayesianinferencedl_tpu.infer.mlda import (
        LevelState, MLDAResult, run_mlda,
    )

    axis = mesh.axis_names[0]
    beta_arr = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def local(theta0_shard, beta_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_mlda(
            misfits, prior, theta0_shard, dev_key,
            n_steps=n_steps, n_burn=n_burn, beta=beta_shard,
            subchains=subchains, batched=batched, adapt_t0=adapt_t0,
            inner=inner,
        )
        # static eval counts must be an array to carry a replicated out-spec
        return res._replace(
            evals_per_step=jnp.asarray(res.evals_per_step, jnp.int32)
        )

    out_specs = MLDAResult(
        state=LevelState(
            theta=P(axis), phi=P(axis), phi_sub=P(axis), rate_stack=P(None, axis)
        ),
        samples=P(None, axis),
        phi_trace=P(None, axis),
        accept_rate=P(axis),
        level_rates=P(None, axis),
        beta=P(axis),
        evals_per_step=P(),
    )
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P()), out_specs=out_specs,
        check_vma=False,
    )
    res = f(theta0, beta_arr, key)
    # restore run_mlda's static-tuple contract (the array form only existed
    # to carry a replicated out-spec through shard_map)
    from bayesianinferencedl_tpu.infer.mlda import mlda_evals_per_step

    return res._replace(evals_per_step=mlda_evals_per_step(subchains))


def sharded_mlda_segmented(
    mesh: Mesh,
    misfits: tuple,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchains: tuple = (8, 4),
    segment: int = 32,
    batched: bool = False,
    inner: str = "pcn",
):
    """sharded_mlda in fixed-size top-level segments (watchdog-safe;
    infer.segmented); chain state and adapted base betas carry across
    segments."""
    from bayesianinferencedl_tpu.infer.mlda import (
        MLDAResult, level_rates_spec, mlda_evals_per_step,
    )
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments,
    )

    betas0 = jnp.broadcast_to(jnp.asarray(beta, theta0.dtype), theta0.shape[:-1])

    def seg(carry, sub, this, burn, start):
        thetas, betas = carry
        res = sharded_mlda(
            mesh, misfits, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchains=subchains,
            batched=batched, adapt_t0=jnp.asarray(start, theta0.dtype),
            inner=inner,
        )
        return res, (res.state.theta, res.beta)

    res, (_, betas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, betas0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment,
        rates={
            "accept": accept_rate_spec(),
            "levels": level_rates_spec(len(misfits)),
        },
    )
    return MLDAResult(
        state=res.state,
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        level_rates=rates["levels"],
        beta=betas,
        evals_per_step=mlda_evals_per_step(subchains),
    )


def sharded_pt_da_segmented(
    mesh: Mesh,
    misfit_fine: Callable,
    misfit_coarse: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    beta=0.25,
    subchain: int = 8,
    n_temps: int = 4,
    lambda_min: float = 0.05,
    segment: int = 32,
    batched: bool = False,
    inner: str = "pcn",
    adapt_ladder: bool = False,
    ladder=None,
):
    """sharded_pt_da in fixed-size outer segments (watchdog-safe;
    infer.segmented); per-level states, adapted betas, and (when
    adapt_ladder) per-group ladders carry across segments."""
    from bayesianinferencedl_tpu.infer.segmented import (
        accept_rate_spec, drive_segments, inner_accept_rate_spec, swap_rate_spec,
    )
    from bayesianinferencedl_tpu.infer.tempering import PTDAResult, geometric_ladder

    # materialize so every segment shares one jit signature
    ladder0 = ladder if ladder is not None else geometric_ladder(
        n_temps, lambda_min, theta0.dtype
    )

    def seg(carry, sub, this, burn, start):
        thetas, betas, lam = carry
        res = sharded_pt_da(
            mesh, misfit_fine, misfit_coarse, prior, thetas, sub,
            n_steps=this, n_burn=burn, beta=betas, subchain=subchain,
            n_temps=n_temps, lambda_min=lambda_min, batched=batched,
            adapt_t0=jnp.asarray(start, theta0.dtype), inner=inner,
            adapt_ladder=adapt_ladder, ladder=lam,
        )
        return res, (res.theta, res.beta, res.lambdas)

    res, (_, betas, lambdas), samples, phis, rates, _ = drive_segments(
        seg, (theta0, beta, ladder0), key, n_steps=n_steps, n_burn=n_burn,
        segment=segment,
        rates={
            "accept": accept_rate_spec(),
            "inner": inner_accept_rate_spec(subchain),
            "swap": swap_rate_spec(),
            "phi_mean": (lambda r: r.phi_level_mean, lambda kept: kept,
                         lambda total: max(total, 1)),
            "phi2_mean": (lambda r: r.phi2_level_mean, lambda kept: kept,
                          lambda total: max(total, 1)),
            "ss_mean": (lambda r: r.ss_level_mean, lambda kept: kept,
                        lambda total: max(total, 1)),
        },
    )
    return PTDAResult(
        samples=samples,
        phi_trace=phis,
        accept_rate=rates["accept"],
        inner_accept_rate=rates["inner"],
        swap_rate=rates["swap"],
        beta=betas,
        theta=res.theta,
        n_fine_evals=n_steps + (n_steps + segment - 1) // segment,
        lambdas=lambdas,
        phi_level_mean=rates["phi_mean"],
        phi2_level_mean=rates["phi2_mean"],
        ss_level_mean=rates["ss_mean"],
    )


def sharded_smc(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_particles: int = 4096,
    n_mutations: int = 5,
    ess_target: float = 0.5,
    beta: float = 0.5,
    max_stages: int = 64,
    batched: bool = False,
):
    """Island SMC: one independent tempered-SMC population per device
    (infer/smc.py), particles sharded over the mesh axis.

    Islands never communicate during the run — each island's adaptive
    schedule, resampling, and mutation are shard-local (resampling is the
    only collective-shaped op in SMC, and keeping it island-local removes
    the all-to-all a global resample would need). Each island's Z estimate
    is unbiased, so the combined estimate is their MEAN in Z space:
    log_evidence = logsumexp(island log Z) - log(n_islands); the island
    spread doubles as the Monte-Carlo error bar (log_z_std), exactly like
    the per-chain-group spread in infer/evidence.py.

    n_particles is the TOTAL population (divisible by the mesh size).
    Returns (SMCResult, log_z_islands): the result's particles/phi are the
    concatenated island populations, log_evidence is the combined estimate,
    and the per-island diagnostics (n_stages, lambdas, ess_frac,
    accept_rate, beta) carry a leading (n_islands,) axis.
    """
    from bayesianinferencedl_tpu.infer.smc import SMCResult, run_smc

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if n_particles % n_dev:
        raise ValueError(f"n_particles {n_particles} not divisible by mesh size {n_dev}")

    def local(key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        res = run_smc(
            misfit_fn, prior, dev_key,
            n_particles=n_particles // n_dev, n_mutations=n_mutations,
            ess_target=ess_target, beta=beta, max_stages=max_stages,
            batched=batched,
        )
        # one-hot psum instead of all_gather: psum output is inferably
        # REPLICATED under shard_map's vma check (all_gather stays varying,
        # which P() out_specs reject), and the (n_islands,) island-Z vector
        # genuinely is replicated after the reduction
        i = jax.lax.axis_index(axis)
        one_hot = jnp.zeros((n_dev,), res.log_evidence.dtype).at[i].set(res.log_evidence)
        lz = jax.lax.psum(one_hot, axis)  # (n_islands,)
        combined = jax.scipy.special.logsumexp(lz) - jnp.log(
            jnp.asarray(lz.shape[0], lz.dtype)
        )
        return (
            res._replace(
                log_evidence=combined,
                n_stages=res.n_stages[None],
                lambdas=res.lambdas[None],
                ess_frac=res.ess_frac[None],
                accept_rate=res.accept_rate[None],
                beta=res.beta[None],
            ),
            lz,
        )

    out_specs = (
        SMCResult(
            particles=P(axis), phi=P(axis), log_evidence=P(),
            n_stages=P(axis), lambdas=P(axis), ess_frac=P(axis),
            accept_rate=P(axis), beta=P(axis),
        ),
        P(),
    )
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(),), out_specs=out_specs)
    return f(key)


def sharded_hmc_chees(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    theta0: jax.Array,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int = 0,
    step=0.1,
    leap_candidates=(1, 2, 4, 8, 16, 32),
    jitter: float = 0.2,
    n_adapt: int = 24,
    n_meas: int = 24,
    thin: int = 1,
    batched: bool = False,
    ref=None,
):
    """ChEES-tuned HMC (infer/hmc.py run_hmc_chees) with the chain batch
    sharded over the mesh axis. The probe's centering mean and the returned
    criterion are cross-DEVICE pmeans, so every shard scores every
    candidate identically and the argmax needs no host reconciliation;
    chain state and per-chain step sizes stay sharded through all three
    phases. Returns (MALAResult, info) — same contract as run_hmc_chees."""
    from bayesianinferencedl_tpu.infer.hmc import _chees_probe
    from bayesianinferencedl_tpu.infer.mala import MALAState

    axis = mesh.axis_names[0]
    hi = jax.lax.Precision.HIGHEST
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    cands = tuple(int(L) for L in leap_candidates)
    dtype = theta0.dtype

    # phase 1: reach the typical set at the median candidate
    pre = max(n_burn // 2, 8)
    L_mid = cands[len(cands) // 2]
    k_pre, k_probe, k_main = jax.random.split(key, 3)
    # n_steps=pre+1 keeps ONE (discarded) sample: a zero-length kept axis
    # makes XLA canonicalize the output to replicated, which trips the
    # shard_map out_specs=P(None, axis) sharding check.
    res0 = sharded_hmc(
        mesh, misfit_fn, prior, theta0, k_pre,
        n_steps=pre + 1, n_burn=pre, step=step, n_leap=L_mid, jitter=jitter,
        batched=batched, ref=ref,
    )
    state = res0.state._replace(n_accept=res0.state.n_accept * 0)
    log_h = jnp.log(res0.step)

    state_specs = MALAState(
        y=P(axis), nlp=P(axis), phi=P(axis), grad=P(axis), n_accept=P(axis)
    )
    chees, accept = [], []
    for i, L in enumerate(cands):
        t0v = float(pre + i * (n_adapt + n_meas))

        def local(s, lh, k_all, L=L, t0v=t0v, i=i):
            dev_key = jax.random.fold_in(
                jax.random.fold_in(k_all, i), jax.lax.axis_index(axis)
            )
            return _chees_probe(
                misfit_fn, prior, ref_mean, ref_chol, s, lh,
                jnp.asarray(t0v, dtype), dev_key,
                n_leap=L, jitter=jitter, n_adapt=n_adapt, n_meas=n_meas,
                batched=batched, axis_name=axis,
            )

        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(state_specs, P(axis), P()),
            out_specs=(state_specs, P(axis), P(), P()),
            check_vma=False,
        )
        state, log_h, j, a = f(state, log_h, k_probe)
        chees.append(float(j) / L)  # per gradient evaluation
        accept.append(float(a))
    best = max(range(len(cands)), key=lambda q: chees[q])
    L_star = cands[best]

    # phase 3: remaining burn-in + kept run at the winner, still sharded
    tail_burn = max(n_burn - pre, 8)
    theta_now = ref_mean + jnp.dot(state.y, ref_chol.T, precision=hi)
    res = sharded_hmc(
        mesh, misfit_fn, prior, theta_now, k_main,
        n_steps=(n_steps - n_burn) + tail_burn, n_burn=tail_burn,
        step=jnp.exp(log_h), n_leap=L_star, jitter=jitter, thin=thin,
        batched=batched, ref=ref,
    )
    info = {
        "n_leap": L_star,
        "candidates": list(cands),
        "chees_per_grad": chees,
        "accept": accept,
    }
    return res, info


def sharded_advi(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_steps: int = 1500,
    n_mc: int = 256,
    rank: str = "full",
    lr: float = 0.05,
    lr_decay: float = 0.05,
    batched: bool = False,
    theta0=None,
    ref=None,
    segment=None,
):
    """ADVI (infer/vi.py) with the Monte Carlo draw axis sharded over the
    mesh: each device integrates n_mc/n_devices reparameterized draws
    through the differentiable forward, and the replicated variational
    parameters update identically everywhere via the vma convention (grads
    of replicated params arrive pre-psum'd; dividing by the axis size turns
    every term — including the replicated analytic entropy — into a
    cross-device mean). One psum per Adam step, riding ICI.

    Returns the same VIResult contract as run_advi with a cross-device-mean
    elbo_trace."""
    from bayesianinferencedl_tpu.infer.mala import _inv_chol
    from bayesianinferencedl_tpu.infer.vi import VIResult, _advi_segment, _chol_of

    if rank not in ("full", "meanfield"):
        raise ValueError(f"rank must be 'full' or 'meanfield', got {rank!r}")
    if n_mc % mesh.size:
        raise ValueError(f"n_mc={n_mc} must divide by mesh size {mesh.size}")
    axis = mesh.axis_names[0]
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype

    if theta0 is None:
        mu0 = jnp.zeros((d,), dtype)
    else:
        mu0 = jnp.dot(
            theta0 - ref_mean, _inv_chol(ref_chol).T, precision=hi
        )
    raw0 = jnp.zeros((d,) if rank == "meanfield" else (d, d), dtype)
    from bayesianinferencedl_tpu.models.surrogate import adam_init

    params = {"mu": mu0, "raw": raw0}
    opt = adam_init(params)
    n_mc_local = n_mc // mesh.size

    seg = int(segment) if segment else n_steps

    def make_local(this, done):
        def local(p, o, k_all):
            dev_key = jax.random.fold_in(k_all, jax.lax.axis_index(axis))
            return _advi_segment(
                misfit_fn, prior, ref_mean, ref_chol, p, o, dev_key, done,
                rank=rank, n_mc=n_mc_local, n_steps=this, n_total=n_steps,
                lr=lr, lr_decay=lr_decay, batched=batched, axis_name=axis,
            )
        return local

    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        f = jax.shard_map(
            make_local(this, done), mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=(P(), P(), P()),
            check_vma=False,
        )
        params, opt, elbo = f(params, opt, key)
        traces.append(elbo)
        done += this

    L = _chol_of(params, rank)
    theta_mean = ref_mean + jnp.dot(params["mu"], ref_chol.T, precision=hi)
    theta_chol = jnp.dot(ref_chol, L, precision=hi)
    return VIResult(
        mu=params["mu"], L=L, theta_mean=theta_mean, theta_chol=theta_chol,
        elbo_trace=jnp.concatenate(traces), n_forward=n_mc * n_steps,
    )


def sharded_flow_vi(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_couplings: int = 6,
    hidden: int = 32,
    n_steps: int = 3000,
    n_mc: int = 256,
    lr: float = 0.01,
    lr_decay: float = 0.05,
    anneal_steps=None,
    lambda0: float = 0.05,
    batched: bool = False,
    ref=None,
    segment=None,
    n_summary: int = 4096,
):
    """Flow-VI (infer/flow.py) with the Monte Carlo draw axis sharded over
    the mesh — the exact sharded_advi pattern: each device integrates
    n_mc/n_devices reparameterized draws through the differentiable forward
    and the flow's tiny coupling MLPs, replicated flow parameters update
    identically everywhere (vma grad convention, one psum per Adam step).

    Returns the same FlowVIResult contract as run_flow_vi."""
    from bayesianinferencedl_tpu.infer.flow import (
        CouplingFlow, FlowVIResult, _flow_segment, flow_sample,
    )
    from bayesianinferencedl_tpu.models.surrogate import adam_init

    if n_mc % mesh.size:
        raise ValueError(f"n_mc={n_mc} must divide by mesh size {mesh.size}")
    axis = mesh.axis_names[0]
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype
    flow = CouplingFlow(dim=d, n_couplings=n_couplings, hidden=hidden)
    k_init, k_run, k_sum = jax.random.split(key, 3)
    params = flow.init(k_init, dtype)
    opt = adam_init(params)
    n_mc_local = n_mc // mesh.size
    if anneal_steps is None:
        anneal_steps = n_steps // 2

    seg = int(segment) if segment else n_steps

    def make_local(this, done):
        def local(p, o, k_all):
            dev_key = jax.random.fold_in(k_all, jax.lax.axis_index(axis))
            return _flow_segment(
                misfit_fn, prior, ref_mean, ref_chol, flow, p, o, dev_key,
                done, n_mc=n_mc_local, n_steps=this, n_total=n_steps,
                anneal_steps=anneal_steps, lambda0=lambda0, lr=lr,
                lr_decay=lr_decay, batched=batched, axis_name=axis,
            )
        return local

    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        f = jax.shard_map(
            make_local(this, done), mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=(P(), P(), P()),
            check_vma=False,
        )
        params, opt, elbo = f(params, opt, key)
        traces.append(elbo)
        done += this

    res = FlowVIResult(
        flow=flow, params=params, ref_mean=ref_mean, ref_chol=ref_chol,
        elbo_trace=jnp.concatenate(traces),
        theta_mean=jnp.zeros((d,), dtype), theta_cov=jnp.eye(d, dtype=dtype),
        n_forward=n_mc * n_steps,
    )
    th = flow_sample(res, k_sum, (n_summary,))
    mean = jnp.mean(th, axis=0)
    c = th - mean
    cov = jnp.dot(c.T, c, precision=hi) / (n_summary - 1)
    return res._replace(theta_mean=mean, theta_cov=cov)


def sharded_svgd(
    mesh: Mesh,
    misfit_fn: Callable,
    prior: GaussianPrior,
    key: jax.Array,
    *,
    n_particles: int = 512,
    n_steps: int = 800,
    lr: float = 0.05,
    lr_decay: float = 0.05,
    anneal_steps=None,
    batched: bool = False,
    theta0=None,
    ref=None,
    segment=None,
):
    """SVGD (infer/svgd.py) with the PARTICLE axis sharded over the mesh:
    each device runs the differentiable forward+reverse pass (the physics —
    where the FLOPs are) on its n_particles/n_devices block, then the tiny
    (J, d) ensemble and its scores all-gather over ICI so every device forms
    the identical full-ensemble Stein direction and keeps its own rows. Two
    all-gathers per step on a J x d array — bytes, not megabytes — so the
    interaction term costs nothing next to the forward sweep. Arithmetic
    matches run_svgd exactly (pinned in tests/test_svgd.py).

    Returns the same SVGDResult contract as run_svgd."""
    from bayesianinferencedl_tpu.infer.mala import _inv_chol
    from bayesianinferencedl_tpu.infer.svgd import SVGDResult, _svgd_segment
    from bayesianinferencedl_tpu.models.surrogate import AdamState, adam_init

    # J comes from the ACTUAL ensemble: a supplied theta0 overrides
    # n_particles, so validate and account against its row count (ADVICE r3)
    if theta0 is not None:
        n_particles = int(theta0.shape[0])
    if n_particles % mesh.size:
        raise ValueError(
            f"n_particles={n_particles} must divide by mesh size {mesh.size}"
        )
    axis = mesh.axis_names[0]
    hi = jax.lax.Precision.HIGHEST
    d = prior.dim
    ref_mean, ref_chol = ref if ref is not None else (prior.mean, prior.chol)
    dtype = ref_mean.dtype
    if anneal_steps is None:
        anneal_steps = n_steps // 2

    if theta0 is None:
        Y = jax.random.normal(key, (n_particles, d), dtype)
    else:
        Y = jnp.dot(theta0 - ref_mean, _inv_chol(ref_chol).T, precision=hi)
    opt = adam_init(Y)

    seg = int(segment) if segment else n_steps

    def make_local(this, done):
        def local(Y_shard, o_shard):
            return _svgd_segment(
                misfit_fn, prior, ref_mean, ref_chol, Y_shard, o_shard,
                jnp.asarray(done, jnp.int32),
                n_steps=this, n_total=n_steps,
                anneal_steps=int(anneal_steps), lr=lr, lr_decay=lr_decay,
                batched=batched, axis_name=axis, j_total=n_particles,
            )
        return local

    traces = []
    done = 0
    while done < n_steps:
        this = min(seg, n_steps - done)
        # Adam state: particle-sharded moments, replicated scalar step count
        opt_spec = AdamState(step=P(), mu=P(axis), nu=P(axis))
        f = jax.shard_map(
            make_local(this, done), mesh=mesh,
            in_specs=(P(axis), opt_spec), out_specs=(P(axis), opt_spec, P()),
            check_vma=False,
        )
        Y, opt, tr = f(Y, opt)
        traces.append(tr)
        done += this

    particles = ref_mean + jnp.dot(Y, ref_chol.T, precision=hi)
    return SVGDResult(
        particles=particles,
        mean=jnp.mean(particles, axis=0),
        std=jnp.std(particles, axis=0),
        misfit_trace=jnp.concatenate(traces),
        n_forward=n_particles * n_steps,
    )
