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
    beta: float = 0.25,
    thin: int = 1,
) -> PCNResult:
    """Run pCN with the chain batch sharded over the mesh axis.

    theta0: (n_chains, d) with n_chains divisible by the mesh size. Each
    device runs its chain shard fully locally (chains are independent — zero
    per-step communication); only the RNG key is decorrelated per device.
    """
    axis = mesh.axis_names[0]

    def local(theta0_shard, key_all):
        dev_key = jax.random.fold_in(key_all, jax.lax.axis_index(axis))
        return run_pcn(
            misfit_fn,
            prior,
            theta0_shard,
            dev_key,
            n_steps=n_steps,
            n_burn=n_burn,
            beta=beta,
            thin=thin,
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
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P()), out_specs=out_specs)
    return f(theta0, key)


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
