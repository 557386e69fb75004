"""Multi-chip scaling evidence on the virtual CPU mesh (VERDICT.md round-1
item 9; SURVEY.md §2c).

Wall-clock scaling is meaningless on a 1-core CI host, so scaling is
asserted on XLA's compiled per-device cost model instead (machine-independent
and exactly what SPMD guarantees):

* weak scaling (chains): growing the chain batch with the device count keeps
  the per-device compiled FLOPs CONSTANT — each device runs the same local
  program, chains need zero communication.
* strong scaling (domain decomposition): a fixed-size FOM solve spread over
  n devices divides per-device FLOPs ~1/n (plus halo/collective overhead).

Numerical parity of the sharded paths vs single-device references is pinned
in test_parallel.py / test_domain_sharded.py; these tests pin the scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior


def _pcn_per_device_flops(n_dev: int, chains_per_dev: int = 64) -> float:
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    prior = GaussianPrior.iid(5, sigma=0.6, dtype=jnp.float64)
    H = jnp.asarray(np.random.default_rng(0).standard_normal((5, 5)))
    data = jnp.zeros(5, jnp.float64)
    misfit = gaussian_misfit(lambda t: H @ t, data, 0.1)

    def local(theta0, key):
        dev_key = jax.random.fold_in(key, jax.lax.axis_index("d"))
        return run_pcn(misfit, prior, theta0, dev_key, n_steps=32, n_burn=8, beta=0.3).samples

    f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P("d"), P()), out_specs=P(None, "d")))
    theta0 = prior.sample(jax.random.PRNGKey(0), (n_dev * chains_per_dev,))
    return float(f.lower(theta0, jax.random.PRNGKey(1)).compile().cost_analysis()["flops"])


def test_chain_weak_scaling_flops_per_device_constant():
    base = _pcn_per_device_flops(1)
    for n in (2, 4, 8):
        fl = _pcn_per_device_flops(n)
        # per-device work identical to the single-device program (SPMD, no
        # cross-chain communication) — allow 2% for layout noise
        assert abs(fl - base) / base < 0.02, (n, fl, base)


def test_domain_strong_scaling_flops_per_device_shrink():
    from bayesianinferencedl_tpu.fem.dia import StencilOperator, assemble_fin_dia
    from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh
    from bayesianinferencedl_tpu.parallel.domain import solve_fom_domain_sharded

    # resolution 4: enough rows per subdomain that the halo exchange is a
    # small fraction (at resolution 2 halos are ~30% of a 1/8 subdomain and
    # the ratio saturates near 0.4)
    host = assemble_fin_dia(build_fin_mesh(4), pad_to=128)
    op = StencilOperator.from_host(host, biot=0.1, dtype=jnp.float64)
    k = jnp.asarray(np.array([0.4, 1.7, 3.1, 0.9, 1.2]))

    def per_dev_flops(n):
        mesh = Mesh(np.array(jax.devices()[:n]), ("d",))
        f = jax.jit(lambda kk: solve_fom_domain_sharded(mesh, op, kk, tol=1e-10, maxiter=500)[0])
        return float(f.lower(k).compile().cost_analysis()["flops"])

    f1, f8 = per_dev_flops(1), per_dev_flops(8)
    # fixed problem over 8 subdomains: per-device compute must shrink by
    # several x (1/8 ideal; halos + psum reductions cost a bounded overhead)
    assert f8 < 0.35 * f1, (f1, f8, f8 / f1)


def test_dp_train_weak_scaling_flops_per_device_constant():
    from bayesianinferencedl_tpu.models.surrogate import MLP, adam_init
    from bayesianinferencedl_tpu.parallel.sharding import dp_train_step

    mlp = MLP(sizes=(5, 64, 64, 5), activation="tanh")
    params = mlp.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    opt = adam_init(params)

    def per_dev_flops(n, per_dev_batch=64):
        mesh = Mesh(np.array(jax.devices()[:n]), ("d",))
        x = jnp.zeros((n * per_dev_batch, 5), jnp.float64)
        y = jnp.zeros((n * per_dev_batch, 5), jnp.float64)
        f = jax.jit(lambda p, o, xx, yy: dp_train_step(mesh, mlp, p, o, xx, yy, 1e-3))
        return float(f.lower(params, opt, x, y).compile().cost_analysis()["flops"])

    base = per_dev_flops(1)
    for n in (2, 8):
        fl = per_dev_flops(n)
        # local grad work constant; the psum adds only O(params) flops
        assert abs(fl - base) / base < 0.05, (n, fl, base)
