"""Full-field (nodal conductivity) pipeline: offline build + online Bayesian
inversion in random-feature coefficient space (SURVEY.md §2a #4, A.2, A.5).

Mirrors api.build_pipeline for the non-affine case: FOM solves share the
fused Pallas stencil kernel (assembly from the nodal field is itself a
7-point stencil — fem/dia_nonaffine.py), the ROM is affinized through a
conductivity-POD basis (rom/nonaffine.py), and the NN error surrogate takes
the RFF coefficients z as input, so the corrected likelihood is again fully
fused for the chain hot loop. The prior over z is N(0, I) — exactly pCN's
reference measure, making the full-field inverse problem dimension-robust.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.fem.assemble import assemble_fin
from bayesianinferencedl_tpu.fem.dia import assemble_fin_dia
from bayesianinferencedl_tpu.fem.dia_nonaffine import NodalStencilOperator, assemble_nodal_coeff
from bayesianinferencedl_tpu.fem.solve import solve_fom
from bayesianinferencedl_tpu.geometry.mesh import build_fin_mesh
from bayesianinferencedl_tpu.infer.diagnostics import ess_bulk, split_rhat
from bayesianinferencedl_tpu.infer.pcn import gaussian_misfit, run_pcn
from bayesianinferencedl_tpu.infer.priors import GaussianPrior
from bayesianinferencedl_tpu.models.full_field import RandomField
from bayesianinferencedl_tpu.models.surrogate import TrainedSurrogate, train_surrogate
from bayesianinferencedl_tpu.rom.nonaffine import AffinizedReducedOperator
from bayesianinferencedl_tpu.rom.pod import pod_basis_host
from bayesianinferencedl_tpu.utils.metrics import MetricsLogger


@dataclass
class FullFieldPipeline:
    op: NodalStencilOperator
    field: RandomField
    rom: AffinizedReducedOperator
    surrogate: TrainedSurrogate
    prior: GaussianPrior  # N(0, I) over RFF coefficients z
    P0: jax.Array
    rom_pcg_iters: int = 25
    cg_tol: float = 1e-7
    cg_maxiter: int = 2000
    # two-level deflation basis for the fused FOM kernels (ops/deflation.py):
    # smooth GP conductivity fields deflate even better than the affine case
    # (measured 8x iteration cut at res4); coarse matrices are projected
    # exactly per sample (non-affine path)
    deflation: object = None
    # None = full f32; lax.Precision.HIGH = bf16x3 ladder tier (measured on
    # the five-param pipeline: ~1.9x chain throughput; the surrogate trains
    # on the same path). See api._online_precision.
    rom_precision: object = None
    # construction hyperparameters, recorded so coarser-mesh rungs of the
    # SAME random field can be rebuilt (RandomField.create is seed-
    # deterministic: same seed/ell/n_features -> same W, b, evaluated at the
    # new mesh's nodes) — the mlda_pcn mid rung needs exactly this
    ell: float = 1.0
    seed: int = 0
    biot: float = 0.1

    def theta(self, z: jax.Array) -> jax.Array:
        """z -> nodal log-conductivity field."""
        f = self.field
        return f.mean + f.sigma * jnp.dot(
            f.features, z, precision=jax.lax.Precision.HIGHEST
        )

    def conductivity(self, z: jax.Array) -> jax.Array:
        return jnp.exp(self.theta(z))

    def node_mesh_ids(self):
        """(mesh, gid): the fin mesh at this pipeline's resolution and the
        solution-vector row of each mesh node — the mapping every per-node
        readout of theta/u must go through (the solver works in the padded
        GRID numbering; plots/predictions work per mesh node)."""
        from bayesianinferencedl_tpu.infer.oed import mesh_node_grid_ids

        mesh = build_fin_mesh(self.op.resolution)
        return mesh, mesh_node_grid_ids(mesh)

    def node_theta(self, z: jax.Array) -> jax.Array:
        """z -> log-conductivity at the MESH nodes (plot/predict layout)."""
        _, gid = self.node_mesh_ids()
        return self.theta(z)[jnp.asarray(gid)]

    def forward_fn(self, likelihood: str) -> Callable:
        """z -> observables, per likelihood family."""
        if likelihood == "fom":
            return lambda z: self.op.observe(
                solve_fom(self.op, self.conductivity(z), tol=self.cg_tol, maxiter=self.cg_maxiter)
            )
        if likelihood == "rom":
            ff = self.rom.fast_forward(self.P0, self.rom_pcg_iters, self.rom_precision)
            return lambda z: ff(self.conductivity(z))
        if likelihood == "rom_nn":
            ff = self.rom.fast_forward(self.P0, self.rom_pcg_iters, self.rom_precision)
            return lambda z: ff(self.conductivity(z)) + self.surrogate.predict(z)
        raise ValueError(f"unknown likelihood {likelihood!r}")

    def batched_forward_fn(self, likelihood: str, *, differentiable: bool = False) -> Callable:
        """differentiable=True (gradient-based samplers, infer/mala.py):
        route around the non-differentiable fast paths so every solve goes
        through lax.custom_linear_solve — same contract as
        api.Pipeline.batched_forward_fn."""
        if differentiable:
            return jax.vmap(self.forward_fn(likelihood))
        if likelihood == "fom" and jax.default_backend() == "tpu" and self.op.dtype == jnp.float32:
            from bayesianinferencedl_tpu.ops.pcg_stencil import derived_maxiter, solve_fom_stencil_pallas

            # tight static kernel bound (CLAUDE.md rule 7); config bound
            # still governs the jnp path
            mi = min(self.cg_maxiter, derived_maxiter(self.op.resolution))

            # jit the whole solve: the non-affine coarse projection prep is
            # hundreds of XLA primitives; eager dispatch costs ~10 ms each
            # over the remote tunnel (api.make_fom_solver measured 30x).
            # Inside a sampler's jit this inner jit is inlined — free.
            @jax.jit
            def fwd_b(zs):
                ks = jax.vmap(self.conductivity)(zs)
                u, _ = solve_fom_stencil_pallas(
                    self.op, ks, tol=self.cg_tol, maxiter=mi,
                    deflation=self.deflation,
                )
                return jax.vmap(self.op.observe)(u)

            return fwd_b
        if likelihood in ("rom", "rom_nn"):
            # sampler hot loops never differentiate the likelihood (and the
            # direct route is the shard_map-compatible one — rom/galerkin.py)
            ff = self.rom.fast_forward(
                self.P0, self.rom_pcg_iters, self.rom_precision, differentiable=False
            )
            if likelihood == "rom":
                return jax.vmap(lambda z: ff(self.conductivity(z)))
            return jax.vmap(lambda z: ff(self.conductivity(z)) + self.surrogate.predict(z))
        return jax.vmap(self.forward_fn(likelihood))


def build_full_field_pipeline(
    *,
    resolution: int = 4,
    biot: float = 0.1,
    dtype=jnp.float32,
    ell: float = 1.0,
    sigma: float = 0.5,
    n_features: int = 64,
    n_snapshots: int = 256,
    basis_size: int = 40,
    k_basis_size: int = 40,
    basis: str = "pod",
    n_train: int = 1024,
    surrogate_hidden=(128, 128),
    surrogate_steps: int = 3000,
    cg_tol: float = 1e-7,
    cg_maxiter: int = 2000,
    seed: int = 0,
    use_pallas: Optional[bool] = None,
    online_precision: str = "highest",
    rom_pcg_iters: int = 25,
    forward_only: bool = False,
    metrics: Optional[MetricsLogger] = None,
) -> FullFieldPipeline:
    """forward_only=True skips the surrogate ladder entirely (no snapshots,
    POD, projection, or NN training — rom/surrogate are None): the exact-FOM
    forward, prior, and deflated fused solver only. Build cost drops from
    minutes to seconds — the right pipeline for likelihood='fom' evidence
    sweeps (select_correlation_length runs one per candidate ell).

    basis: "pod" (default) or "greedy" — residual-indicator greedy selection
    of the state basis over the snapshot set (rom/nonaffine.py
    greedy_basis_nonaffine; SURVEY §2a-5/A.3). Same solve budget either way
    (greedy selects among the already-solved snapshots); measured POD-vs-
    greedy rel-err at equal r: artifacts/greedy_ff_r4.json. The k basis W
    stays POD — the affinization error is controlled by span(W) coverage of
    the prior's fields, a compression problem POD is optimal for, not an
    approximation-by-solutions problem."""
    from bayesianinferencedl_tpu.api import _online_precision

    if basis not in ("pod", "greedy"):
        raise ValueError(f"basis must be 'pod' or 'greedy', got {basis!r}")

    # resolve up front: a typo'd tier must fail in milliseconds, not after
    # the snapshot sweep / POD / projection have already run
    rom_prec = _online_precision(online_precision)
    log = metrics or MetricsLogger()
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and dtype == jnp.float32

    with log.timer("build_fom"):
        mesh = build_fin_mesh(resolution)
        host = assemble_fin_dia(mesh, pad_to=128)
        G_host = assemble_nodal_coeff(mesh, host)
        from bayesianinferencedl_tpu.fem.dia import StencilOperator

        op = NodalStencilOperator(
            base=StencilOperator.from_host(host, biot=biot, dtype=dtype),
            G=jnp.asarray(G_host, dtype),
        )
        # features laid out in the GRID numbering the stencil operator reads
        # (NodalStencilOperator.vals consumes k[row + offset] over grid
        # rows) — the identity placement would silently scramble the field
        # (models/full_field.py RandomField.create docstring)
        from bayesianinferencedl_tpu.infer.oed import mesh_node_grid_ids

        field = RandomField.create(
            mesh, host.n, ell=ell, sigma=sigma, n_features=n_features,
            seed=seed, dtype=dtype, node_ids=mesh_node_grid_ids(mesh),
        )
    log.log("fom_built", n_dof=op.n_dof, n_features=n_features, pallas=use_pallas)

    deflation = None
    if use_pallas:
        from bayesianinferencedl_tpu.ops.deflation import DeflationBasis
        from bayesianinferencedl_tpu.ops.pcg_stencil import (
            chunked_batched_solve, derived_maxiter, effective_maxiter,
            pick_layout, solve_fom_stencil_pallas, sublanes_program_batch_limit,
        )

        # m must be a multiple of 128 (kernel lane alignment — m=64 SIGABRTs
        # the Mosaic compile helper; models/five_param.py deflation_basis)
        deflation = DeflationBasis.create(host, biot=biot, m=128)
        mi = min(cg_maxiter, derived_maxiter(op.resolution))

        # one jitted program for the WHOLE solve: the non-affine coarse
        # projection (coarse_inverses_from_vals) is hundreds of XLA
        # primitives, each paying a ~10 ms tunnel dispatch when run eagerly
        # (measured 30x on the five-param path — api.make_fom_solver)
        jit_solve = jax.jit(
            lambda ks: solve_fom_stencil_pallas(
                op, ks, tol=cg_tol, maxiter=mi, deflation=deflation
            )
        )

        def solver(ks):
            layout_s, tile_s = pick_layout(op.n, int(ks.shape[0]), deflated=True)
            lim = (
                sublanes_program_batch_limit(op.n, tile_s, deflation.m)
                if layout_s == "sublanes" else None
            )
            u, iters = chunked_batched_solve(jit_solve, ks, lim)
            # derived_maxiter was calibrated on the 5-param log-uniform
            # range; nodal GP fields with higher contrast can need more.
            # An iters==cap solve is UNCONVERGED and would silently bias
            # the training/observation 'truth' — surface it. (The kernel's
            # effective bound accounts for tiling + deflation.)
            cap = effective_maxiter(
                mi, pick_layout(op.n, int(ks.shape[0]), deflated=True)[0], True
            )
            max_it = int(jnp.max(iters))
            if max_it >= cap:
                log.log("fom_solver_unconverged", max_iters=max_it, cap=cap)
                import warnings

                warnings.warn(
                    f"Pallas FOM solver hit its iteration cap ({cap}); "
                    "raise cg_maxiter — snapshots/training data may be "
                    "unconverged", stacklevel=2,
                )
            return u
    else:
        solver = lambda ks: jax.vmap(
            lambda k: solve_fom(op, k, tol=cg_tol, maxiter=cg_maxiter)
        )(ks)

    if forward_only:
        prior = GaussianPrior.iid(n_features, mean=0.0, sigma=1.0, dtype=dtype)
        return FullFieldPipeline(
            op=op, field=field, rom=None, surrogate=None, prior=prior,
            P0=None, rom_pcg_iters=rom_pcg_iters, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, rom_precision=rom_prec,
            deflation=deflation, ell=float(ell), seed=int(seed),
            biot=float(biot),
        )

    key = jax.random.PRNGKey(seed)
    k_z, k_ds = jax.random.split(key)
    with log.timer("snapshots"):
        thetas = field.sample(k_z, n_snapshots)  # (N, n)
        ks = jnp.exp(thetas)
        S = solver(ks)
        S.block_until_ready()
    with log.timer("pod"):
        W, _ = pod_basis_host(np.asarray(ks), k_basis_size)
        if basis == "greedy":
            from bayesianinferencedl_tpu.rom.nonaffine import greedy_basis_nonaffine

            V, sel, ind = greedy_basis_nonaffine(
                op, G_host, np.asarray(ks), np.asarray(S), W, basis_size
            )
            log.log("greedy_basis", r=V.shape[1], indicator_final=float(ind[-1]))
        else:
            V, _ = pod_basis_host(np.asarray(S), basis_size)
    with log.timer("project_rom"):
        rom = AffinizedReducedOperator.project_host(op, G_host, V, W, dtype=dtype)
    c_ref = jnp.asarray(np.asarray(jax.vmap(rom.coeffs)(ks)).mean(axis=0), dtype)
    P0 = rom.preconditioner(c_ref)
    log.log("rom_built", r=rom.r, m_k=rom.m_k)

    with log.timer("error_dataset"):
        zs = jax.random.normal(k_ds, (n_train, n_features), dtype)
        # same HIGHEST-precision contraction as the deployed chain path
        # (theta_from_coeff / field.sample) — the surrogate must train on
        # exactly the inputs the chains evaluate, and default matmul
        # precision is bf16 on TPU
        thetas_t = field.mean + field.sigma * jnp.matmul(
            zs, field.features.T, precision=jax.lax.Precision.HIGHEST
        )
        ks_t = jnp.exp(thetas_t)
        y_fom = jax.vmap(op.observe)(solver(ks_t))
        # train on the deployed path (precision AND iteration count
        # included) so the surrogate absorbs systematic solver error —
        # same principle as api.py
        ff = rom.fast_forward(P0, rom_pcg_iters, rom_prec)
        y_rom = jax.vmap(ff)(ks_t)
        err = y_fom - y_rom
        err.block_until_ready()
    rom_rel = float(jnp.linalg.norm(err) / jnp.linalg.norm(y_fom))
    log.log("rom_rel_err", value=rom_rel)

    with log.timer("train_surrogate"):
        surrogate, losses = train_surrogate(
            zs, err, hidden=tuple(surrogate_hidden), steps=surrogate_steps, seed=seed
        )
        losses.block_until_ready()
    y_corr = y_rom + jax.vmap(surrogate.predict)(zs)
    corr_rel = float(jnp.linalg.norm(y_corr - y_fom) / jnp.linalg.norm(y_fom))
    log.log("corrected_rel_err", value=corr_rel, rom_rel_err=rom_rel)

    # HOLDOUT accuracy on fresh coefficient draws (the honest generalization
    # figures — see api.build_pipeline's holdout block for the audit that
    # motivated this; train-set residuals flatter the NN)
    with log.timer("holdout_eval"):
        n_hold = min(128, n_train)
        zs_h = jax.random.normal(
            jax.random.fold_in(k_ds, 7919), (n_hold, n_features), dtype
        )
        thetas_h = field.mean + field.sigma * jnp.matmul(
            zs_h, field.features.T, precision=jax.lax.Precision.HIGHEST
        )
        y_fom_h = jax.vmap(op.observe)(solver(jnp.exp(thetas_h)))
        y_rom_h = jax.vmap(ff)(jnp.exp(thetas_h))
        e_h = y_fom_h - y_rom_h
        e_h.block_until_ready()
    rom_rel_h = float(jnp.linalg.norm(e_h) / jnp.linalg.norm(y_fom_h))
    y_corr_h = y_rom_h + jax.vmap(surrogate.predict)(zs_h)
    corr_rel_h = float(jnp.linalg.norm(y_corr_h - y_fom_h) / jnp.linalg.norm(y_fom_h))
    log.log("holdout_rel_err", rom=rom_rel_h, corrected=corr_rel_h, n_holdout=n_hold)

    prior = GaussianPrior.iid(n_features, mean=0.0, sigma=1.0, dtype=dtype)
    return FullFieldPipeline(
        op=op, field=field, rom=rom, surrogate=surrogate, prior=prior, P0=P0,
        rom_pcg_iters=rom_pcg_iters, cg_tol=cg_tol, cg_maxiter=cg_maxiter,
        rom_precision=rom_prec, deflation=deflation,
        ell=float(ell), seed=int(seed), biot=float(biot),
    )


def coarse_fom_forward(pipe: FullFieldPipeline, resolution: int) -> Callable:
    """zs (B, M) -> (B, n_obs): the full-field FOM forward on a COARSER mesh
    for the same RFF coefficients — the mlda_pcn mid rung. The coarse
    RandomField shares the fine one's (W, b) (seed-deterministic
    RandomField.create), so z means the same continuum field on both
    meshes; only the PDE discretization coarsens. Batched through the fused
    Pallas stencil kernel on TPU (with its own deflation basis), the
    vmapped implicit-diff solve elsewhere."""
    dtype = pipe.prior.mean.dtype
    mesh_c = build_fin_mesh(resolution)
    host_c = assemble_fin_dia(mesh_c, pad_to=128)
    from bayesianinferencedl_tpu.fem.dia import StencilOperator

    op_c = NodalStencilOperator(
        base=StencilOperator.from_host(host_c, biot=pipe.biot, dtype=dtype),
        G=jnp.asarray(assemble_nodal_coeff(mesh_c, host_c), dtype),
    )
    from bayesianinferencedl_tpu.infer.oed import mesh_node_grid_ids

    field_c = RandomField.create(
        mesh_c, host_c.n, ell=pipe.ell, sigma=pipe.field.sigma,
        mean=pipe.field.mean, n_features=pipe.field.n_features,
        seed=pipe.seed, dtype=dtype, node_ids=mesh_node_grid_ids(mesh_c),
    )

    def conductivity_c(z):
        theta = field_c.mean + field_c.sigma * jnp.dot(
            field_c.features, z, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.exp(theta)

    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        from bayesianinferencedl_tpu.ops.deflation import DeflationBasis
        from bayesianinferencedl_tpu.ops.pcg_stencil import (
            derived_maxiter, solve_fom_stencil_pallas,
        )

        defl_c = DeflationBasis.create(host_c, biot=pipe.biot, m=128)
        mi = min(pipe.cg_maxiter, derived_maxiter(op_c.resolution))

        @jax.jit
        def fwd_b(zs):
            ks = jax.vmap(conductivity_c)(zs)
            u, _ = solve_fom_stencil_pallas(
                op_c, ks, tol=pipe.cg_tol, maxiter=mi, deflation=defl_c
            )
            return jax.vmap(op_c.observe)(u)

        return fwd_b
    return jax.vmap(
        lambda z: op_c.observe(
            solve_fom(op_c, conductivity_c(z), tol=pipe.cg_tol, maxiter=pipe.cg_maxiter)
        )
    )


def run_full_field_evidence(
    pipe: FullFieldPipeline,
    *,
    likelihood: str = "rom_nn",
    noise_sigma: float = 1e-3,
    n_particles: int = 4096,
    n_groups: int = 8,
    n_mutations: int = 5,
    ess_target: float = 0.5,
    max_stages: int = 64,
    infer_noise: bool = False,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """Model evidence for the full-field pipeline by adaptive tempered SMC —
    api.run_smc_evidence's contract on RFF-coefficient space (same key
    discipline as run_full_field_inversion: same seed => identical
    z_true/data, so evidence estimates across `likelihood` choices are
    Bayes-factor legs on the SAME observations; data= inverts EXTERNAL
    observations instead). Returns api.SMCEvidenceResult."""
    log = metrics or MetricsLogger()
    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_init, k_chain, k_map = jax.random.split(key, 5)
    dtype = pipe.prior.mean.dtype
    if data is not None:
        data = jnp.asarray(data, dtype)
        if data.shape != (pipe.op.n_obs,):
            raise ValueError(
                f"external data must have shape ({pipe.op.n_obs},), got {data.shape}"
            )
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol, maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    if infer_noise:
        # sigma-marginal potential (same contract as run_full_field_inversion)
        from bayesianinferencedl_tpu.infer.pcn import marginal_misfit

        misfit_b = marginal_misfit(
            pipe.batched_forward_fn(likelihood), data,
            a0=2.0, b0=float(noise_sigma) ** 2,
        )
    else:
        misfit_b = gaussian_misfit(
            pipe.batched_forward_fn(likelihood), data, noise_sigma
        )
    from bayesianinferencedl_tpu.api import _smc_evidence_core

    return _smc_evidence_core(
        misfit_b, pipe.prior, k_chain,
        n_particles=n_particles, n_groups=n_groups, n_mutations=n_mutations,
        ess_target=ess_target, max_stages=max_stages, mesh=mesh, log=log,
        likelihood=likelihood, event="ff_smc_evidence", theta_true=z_true,
        data=data,
    )


def select_correlation_length(
    ells,
    *,
    resolution: int = 4,
    biot: float = 0.1,
    dtype=jnp.float32,
    sigma: float = 0.5,
    n_features: int = 64,
    noise_sigma: float = 1e-2,
    ell_true: Optional[float] = None,
    data: Optional[jax.Array] = None,
    n_datasets: int = 1,
    n_particles: int = 4096,
    n_groups: int = 8,
    n_mutations: int = 5,
    ess_target: float = 0.5,
    max_stages: int = 128,
    cg_tol: float = 1e-7,
    cg_maxiter: int = 2000,
    seed: int = 0,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
) -> dict:
    """Prior hyperparameter selection by model evidence: which correlation
    length ell explains the data best?

    The RFF prior's ell is a MODELING choice the reference (and most
    inverse-problem codes) hard-wires. Here it becomes a measured quantity:
    every candidate ell defines a different push-forward model z -> k(x)
    under the same N(0, I) coefficient prior, so the SMC evidence
    Z(ell) = E_prior[exp(-Phi)] (run_full_field_evidence, exact-FOM
    likelihood through the fused deflated solver) is the marginal likelihood
    of the SAME observations under each candidate — their ratios are Bayes
    factors over ell, and a uniform hyperprior makes softmax(log Z) the
    hyperparameter posterior. Candidate pipelines are forward_only builds
    (seconds each — no surrogate ladder; the evidence runs exact physics).

    data=None simulates n_datasets INDEPENDENT experiments from ell_true
    (z_true ~ prior under the TRUE feature map per experiment, same key
    discipline as run_full_field_evidence); data= inverts external
    observations instead — shape (n_obs,) for one experiment or
    (M, n_obs) for M independent ones. Evidences POOL across experiments
    (log Z summed — the experiments are independent given ell), which is
    what identifies the hyperparameter: with the fin's 5 scalar
    observations a SINGLE experiment's Bayes factor is dataset luck
    (measured: one seed preferred a 5x-too-short ell by 2 nats with a
    +-4.8 per-dataset spread; pooling 8 experiments picks the truth by
    12+ nats — tests/test_ell_selection.py pins the pooled verdict).
    Returns {"ells", "log_z", "log_z_std", "posterior", "ell_map",
    "z_true", "data"} with log_z the pooled totals.
    """
    ells = [float(e) for e in ells]
    if data is None and ell_true is None:
        raise ValueError("provide external data= or ell_true to simulate from")
    log = metrics or MetricsLogger()
    key = key if key is not None else jax.random.PRNGKey(seed)
    k_true, k_noise, k_ev = jax.random.split(key, 3)

    def build(ell):
        return build_full_field_pipeline(
            resolution=resolution, biot=biot, dtype=dtype, ell=ell,
            sigma=sigma, n_features=n_features, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, seed=seed, forward_only=True,
            metrics=log,
        )

    z_true = None
    if data is None:
        pipe_true = build(float(ell_true))
        z_true = pipe_true.prior.sample(k_true, (n_datasets,))
        y_true = jax.vmap(
            lambda z: pipe_true.op.observe(
                solve_fom(pipe_true.op, pipe_true.conductivity(z),
                          tol=cg_tol, maxiter=cg_maxiter)
            )
        )(z_true)
        data = y_true + noise_sigma * jax.random.normal(
            k_noise, y_true.shape, dtype
        )
    else:
        data = jnp.asarray(data, dtype)
        if data.ndim == 1:
            data = data[None]

    log_z, log_z_std = [], []
    for ell in ells:
        pipe = build(ell)
        tot, var = 0.0, 0.0
        for m in range(data.shape[0]):
            res = run_full_field_evidence(
                pipe, likelihood="fom", noise_sigma=noise_sigma,
                data=data[m], n_particles=n_particles, n_groups=n_groups,
                n_mutations=n_mutations, ess_target=ess_target,
                max_stages=max_stages, key=jax.random.fold_in(k_ev, m),
                mesh=mesh, metrics=log,
            )
            tot += res.log_evidence
            var += res.log_evidence_std ** 2
        log_z.append(tot)
        log_z_std.append(float(np.sqrt(var)))
        log.log("ell_evidence", ell=ell, log_z=tot,
                log_z_std=log_z_std[-1], n_datasets=int(data.shape[0]))

    lz = np.asarray(log_z, np.float64)
    post = np.exp(lz - lz.max())
    post /= post.sum()
    return {
        "ells": ells,
        "log_z": [round(float(v), 3) for v in lz],
        "log_z_std": [round(float(v), 3) for v in log_z_std],
        "posterior": [round(float(p), 4) for p in post],
        "ell_map": ells[int(np.argmax(lz))],
        "z_true": z_true,
        "data": data,
    }


def _sync(res):
    """Completion barrier: scalar readback (CLAUDE.md timing rule), falling
    back to block_until_ready for an empty kept axis."""
    if res.samples.shape[0]:
        float(jnp.sum(res.samples[-1]))
    else:
        jax.block_until_ready(res.samples)


def run_full_field_inversion(
    pipe: FullFieldPipeline,
    *,
    likelihood: str = "rom_nn",
    sampler: str = "pcn",
    n_chains: int = 1024,
    n_steps: int = 5000,
    n_burn: int = 1000,
    beta: float = 0.3,
    noise_sigma: float = 1e-3,
    n_temps: int = 5,
    lambda_min: float = 0.02,
    # conservative default: full-field surrogates carry more bias than the
    # five-param pipeline's, and DA drift per outer step grows with S. When
    # the measured outer acceptance sits near 1, raise toward 64 — the r5
    # frontier (artifacts/da_frontier_r5.json) showed ESS/s scaling almost
    # linearly in S until ESS/outer-step saturates (config.MCMCConfig).
    subchain: int = 8,
    mala_step: float = 0.1,
    hmc_leap: int = 8,
    hmc_jitter: float = 0.2,
    da_inner: str = "pcn",
    mlda_resolution: int = 2,
    mlda_subchain: int = 4,
    adapt_ladder: bool = False,
    lis_points: int = 16,
    lis_rank: Optional[int] = None,
    lis_tol: float = 0.1,
    infer_noise: bool = False,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """MCMC over RFF coefficients with synthetic FOM data. Returns
    (result, z_true, data, ess, rhat, wall_seconds). ess/rhat are the
    rank-normalized split estimators (infer/diagnostics.py).

    sampler: "pcn" (default), "laplace_mh"/"gpcn" — the Laplace samplers
    compute a MAP + Gauss-Newton Laplace approximation in the M-dimensional
    coefficient space first (the whole point of the unbounded z coordinates) —
    "da_pcn" (rom_nn subchains + exact `likelihood` correction per outer
    step; n_steps/n_burn then count outer steps), "pt_pcn" (parallel
    tempering — multimodal posteriors), "pt_mala" (MALA within every
    temperature level — gradient-informed tempering for high-dimensional
    multimodal targets), "pt_da_pcn" (tempered delayed acceptance: exact
    `likelihood` posterior on a multimodal problem), "mala"/"mala_lap"
    (gradient-based Langevin proposals — prior- or Laplace-preconditioned;
    infer/mala.py), "hmc"/"hmc_lap" (jittered-trajectory Hamiltonian Monte
    Carlo — hmc_leap fused gradient passes per trajectory; infer/hmc.py),
    or "lis_pcn" (likelihood-informed-subspace pCN —
    offline Jacobians pick the <= n_obs informed directions, online steps
    are gradient-free with per-direction step sizes; infer/lis.py;
    lis_points/lis_rank/lis_tol control the subspace build), or "mlda_pcn"
    (multilevel delayed acceptance: rom_nn subchains -> coarse-mesh FOM
    rung (`mlda_resolution`, `mlda_subchain`) -> exact fine FOM;
    infer/mlda.py — requires likelihood='fom').

    mesh: optional jax.sharding.Mesh — shards the chain (group) axis over
    ICI for pcn/da_pcn/mlda_pcn/pt_pcn/pt_mala/pt_da_pcn/mala/mala_lap/
    lis_pcn, same contract as api.run_inversion (the Laplace
    independence/gpcn samplers stay single-device; their cost is the
    offline MAP).

    infer_noise: treat sigma as UNKNOWN — every misfit switches to the
    sigma-marginalized potential under the conjugate
    InvGamma(2, noise_sigma^2) prior (infer/pcn.py marginal_misfit; the
    Laplace/LIS machinery builds at the plug-in conditional-mode scale).
    Recover the sigma posterior afterwards with utils/ppc.noise_posterior
    over `res.samples` — same contract as api.run_inversion.
    """
    from bayesianinferencedl_tpu.infer.pcn import run_pcn_segmented

    log = metrics or MetricsLogger()
    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_init, k_chain, k_map = jax.random.split(key, 5)
    dtype = pipe.prior.mean.dtype

    if data is not None:
        # production mode: EXTERNAL observations inverted as-is (same
        # contract as api.run_inversion(data=...)); noise_sigma is the
        # assumed instrument noise, z_true only used for reporting
        data = jnp.asarray(data, dtype)
        n_obs = pipe.op.n_obs
        if data.shape != (n_obs,):
            raise ValueError(
                f"external data must have shape ({n_obs},), got {data.shape}"
            )
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol, maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    # likelihood-potential factory for every misfit below (fine, coarse,
    # mid-rung, differentiable): conditioned on noise_sigma, or with sigma
    # integrated out under the conjugate InvGamma(2, noise_sigma^2) prior
    # (infer_noise — same contract as api.run_inversion; essential here,
    # where m = n_obs << n_features means interpolants always exist and the
    # improper Jeffreys limit would make the posterior improper)
    if infer_noise:
        from bayesianinferencedl_tpu.infer.pcn import marginal_misfit

        mk_misfit = lambda f: marginal_misfit(
            f, data, a0=2.0, b0=float(noise_sigma) ** 2
        )
    else:
        mk_misfit = lambda f: gaussian_misfit(f, data, noise_sigma)

    def _lap_sigma(fwd1, z_map):
        """Plug-in scale for the Laplace/LIS machinery under infer_noise:
        the conditional sigma^2 mode at the MAP (api.run_inversion's rule)."""
        if not infer_noise:
            return noise_sigma
        r_map = fwd1(z_map) - data
        m_obs = r_map.shape[-1]
        return float(
            np.sqrt(
                (float(noise_sigma) ** 2 + 0.5 * float(jnp.sum(r_map * r_map)))
                / (2.0 + 0.5 * m_obs)
            )
        )

    fwd_b = pipe.batched_forward_fn(likelihood)
    misfit = mk_misfit(fwd_b)
    theta0 = pipe.prior.sample(k_init, (n_chains,))

    if sampler in ("da_pcn", "pt_da_pcn") and likelihood == "rom_nn":
        raise ValueError(
            f"sampler={sampler!r} with likelihood='rom_nn' is degenerate: the "
            "coarse model IS rom_nn, so the outer correction always accepts "
            "and you pay subchain+1 evaluations of the SAME model per kept "
            "sample. Set likelihood='fom' (the exact target) or use "
            "sampler='pcn'."
        )

    if sampler in ("laplace_mh", "gpcn"):
        from bayesianinferencedl_tpu.infer.map import find_map, laplace_approximation
        from bayesianinferencedl_tpu.infer.samplers import run_gpcn, run_laplace_mh

        fwd = pipe.forward_fn(likelihood)
        mis1 = mk_misfit(fwd)
        with log.timer("map_laplace"):
            z_map, _ = find_map(mis1, pipe.prior, jnp.zeros_like(pipe.prior.mean), maxiter=300)
            lap = laplace_approximation(
                fwd, data, _lap_sigma(fwd, z_map), pipe.prior, z_map
            )
        theta0 = lap.sample(k_init, (n_chains,))
        smp_fn = run_laplace_mh if sampler == "laplace_mh" else run_gpcn
        kwargs = dict(n_steps=n_steps, n_burn=n_burn)
        if sampler == "gpcn":
            kwargs["beta"] = beta
        runner = lambda m, p, t0, k, **kw: smp_fn(m, p, lap, t0, k, **kw)
        # timed run: different key + scalar readback (CLAUDE.md timing rule)
        res = runner(mis1, pipe.prior, theta0, k_chain, **kwargs)
        _sync(res)
        import time as _t

        t0 = _t.perf_counter()
        res = runner(mis1, pipe.prior, theta0, jax.random.fold_in(k_chain, 1), **kwargs)
        _sync(res)
        wall = _t.perf_counter() - t0
        ess = ess_bulk(res.samples)
        r = split_rhat(res.samples)
        log.log("ff_inversion", likelihood=likelihood, sampler=sampler, wall_seconds=wall,
                ess_min=float(jnp.min(ess)), accept_rate=float(jnp.mean(res.accept_rate)))
        return res, z_true, data, ess, r, wall

    if sampler == "lis_pcn":
        # likelihood-informed-subspace pCN (infer/lis.py): a handful of
        # Jacobians offline (MAP + Laplace draws -> the global LIS), then
        # gradient-FREE chain steps with per-direction step sizes — the
        # informed rank is <= n_obs however large the coefficient dimension,
        # so the complement mixes at near-independence rates. Exact for any
        # posterior (prior-reversible operator-weighted proposal); the
        # Laplace-seeded initialization shares mala_lap's unimodal-regime
        # caveat (docs/SAMPLERS.md).
        from bayesianinferencedl_tpu.infer.lis import (
            build_lis, run_lis_pcn, run_lis_pcn_segmented,
        )
        from bayesianinferencedl_tpu.infer.map import find_map, laplace_approximation

        fwd = pipe.forward_fn(likelihood)
        mis1 = mk_misfit(fwd)
        with log.timer("map_laplace"):
            z_map, _ = find_map(mis1, pipe.prior, jnp.zeros_like(pipe.prior.mean), maxiter=300)
            sig_lis = _lap_sigma(fwd, z_map)
            lap = laplace_approximation(fwd, data, sig_lis, pipe.prior, z_map)
        with log.timer("build_lis"):
            pts = jnp.concatenate(
                [z_map[None], lap.sample(k_map, (max(lis_points - 1, 1),))], axis=0
            )
            lis = build_lis(
                fwd, pipe.prior, pts, sig_lis, lam_tol=lis_tol, rank_max=lis_rank
            )
        log.log("lis_built", rank=lis.rank, lam_max=float(lis.lam[0]),
                lam_min=float(lis.lam[-1]), n_points=int(pts.shape[0]))
        theta0 = lap.sample(k_init, (n_chains,))
        if likelihood == "fom":
            if mesh is not None:
                from bayesianinferencedl_tpu.parallel.sharding import (
                    sharded_lis_pcn_segmented,
                )

                runner = lambda m, p, t0, k, **kw: sharded_lis_pcn_segmented(
                    mesh, m, p, lis, t0, k, segment=64, **kw
                )
            else:
                runner = lambda m, p, t0, k, **kw: run_lis_pcn_segmented(
                    m, p, lis, t0, k, segment=64, **kw
                )
        elif mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_lis_pcn

            runner = lambda m, p, t0, k, **kw: sharded_lis_pcn(mesh, m, p, lis, t0, k, **kw)
        else:
            runner = lambda m, p, t0, k, **kw: run_lis_pcn(m, p, lis, t0, k, **kw)
        kwargs = dict(n_steps=n_steps, n_burn=n_burn, beta=beta, batched=True)
    elif sampler in ("mala", "mala_lap", "hmc", "hmc_lap"):
        # gradient-based MCMC in the M-dimensional coefficient space — the
        # regime where gradient moves pay most (measured 6.3x pCN's ESS at
        # d=64 on the linear-Gaussian family, tests/test_mala.py; HMC's
        # multi-step trajectories a further ~9x per gradient at d=16,
        # tests/test_hmc.py). Gradients flow through the differentiable
        # batched forward (all solves via lax.custom_linear_solve;
        # infer/mala.py, infer/hmc.py).
        from bayesianinferencedl_tpu.api import _gradient_sampler_runner

        misfit = mk_misfit(pipe.batched_forward_fn(likelihood, differentiable=True))
        ref = None
        if sampler.endswith("_lap"):
            from bayesianinferencedl_tpu.infer.map import find_map, laplace_approximation

            fwd = pipe.forward_fn(likelihood)
            mis1 = mk_misfit(fwd)
            with log.timer("map_laplace"):
                z_map, _ = find_map(
                    mis1, pipe.prior, jnp.zeros_like(pipe.prior.mean), maxiter=300
                )
                lap = laplace_approximation(
                    fwd, data, _lap_sigma(fwd, z_map), pipe.prior, z_map
                )
            theta0 = lap.sample(k_init, (n_chains,))
            ref = (lap.mean, lap.chol)
        run1 = _gradient_sampler_runner(
            sampler.replace("_lap", ""), likelihood, mesh, misfit,
            pipe.prior, theta0,
            n_steps=n_steps, n_burn=n_burn, step=mala_step,
            n_leap=hmc_leap, jitter=hmc_jitter, ref=ref, log=log,
        )
        runner = lambda m, p, t0, k, **kw: run1(k)
        kwargs = {}
    elif sampler == "pt_pcn":
        if likelihood == "fom":
            raise NotImplementedError(
                "pt_pcn with the fom likelihood compiles a full-order solve "
                "into every inner step; use sampler='pt_da_pcn' instead"
            )
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_pt_pcn

            runner = lambda m, p, t0, k, **kw: sharded_pt_pcn(mesh, m, p, t0, k, **kw)
        else:
            from bayesianinferencedl_tpu.infer.tempering import run_pt_pcn

            runner = run_pt_pcn
        kwargs = dict(
            n_steps=n_steps, n_burn=n_burn, beta=beta,
            n_temps=n_temps, lambda_min=lambda_min, batched=True,
            adapt_ladder=adapt_ladder,
        )
    elif sampler == "pt_mala":
        # gradient-informed tempering: MALA within every level + replica
        # exchange (infer/tempering.py run_pt_mala). The M-dimensional
        # coefficient space is where the Langevin drift pays over pt_pcn's
        # random-walk levels — measure ESS/s against pt_pcn before adopting
        # (docs/SAMPLERS.md records both regimes).
        if likelihood == "fom":
            raise NotImplementedError(
                "pt_mala with the fom likelihood compiles a full-order solve "
                "AND its adjoint into every step; use sampler='pt_da_pcn' "
                "with da_inner='mala' subchains instead"
            )
        misfit = mk_misfit(pipe.batched_forward_fn(likelihood, differentiable=True))
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_pt_mala

            runner = lambda m, p, t0, k, **kw: sharded_pt_mala(mesh, m, p, t0, k, **kw)
        else:
            from bayesianinferencedl_tpu.infer.tempering import run_pt_mala

            runner = run_pt_mala
        kwargs = dict(
            n_steps=n_steps, n_burn=n_burn, step=mala_step,
            n_temps=n_temps, lambda_min=lambda_min, batched=True,
            adapt_ladder=adapt_ladder,
        )
    elif sampler == "pt_da_pcn":
        misfit_c = mk_misfit(pipe.batched_forward_fn("rom_nn", differentiable=(da_inner == "mala")))
        segment = 32 if likelihood == "fom" else 512
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_pt_da_segmented

            runner = lambda m, p, t0, k, **kw: sharded_pt_da_segmented(
                mesh, m, misfit_c, p, t0, k, segment=segment, batched=True,
                inner=da_inner, **kw
            )
        else:
            from bayesianinferencedl_tpu.infer.tempering import run_pt_da_segmented

            runner = lambda m, p, t0, k, **kw: run_pt_da_segmented(
                m, misfit_c, p, t0, k, segment=segment, batched=True,
                inner=da_inner, **kw
            )
        kwargs = dict(
            n_steps=n_steps, n_burn=n_burn,
            beta=mala_step if da_inner == "mala" else beta, subchain=subchain,
            n_temps=n_temps, lambda_min=lambda_min, adapt_ladder=adapt_ladder,
        )
    elif sampler == "mlda_pcn":
        # multilevel delayed acceptance in RFF-coefficient space
        # (infer/mlda.py): rom_nn subchains screened by the SAME random
        # field's FOM on a coarser mesh (coarse_fom_forward — z is mesh-
        # independent), screened by the exact fine FOM. n_steps count TOP
        # steps; one fine batch solve each.
        if likelihood != "fom":
            raise ValueError(
                "mlda_pcn targets the fine FOM posterior through a "
                "resolution hierarchy; set likelihood='fom' (for a "
                "single-screen surrogate chain use sampler='da_pcn')"
            )
        if mlda_resolution >= pipe.op.resolution:
            raise ValueError(
                f"mlda_resolution ({mlda_resolution}) must be coarser than "
                f"the pipeline mesh ({pipe.op.resolution})"
            )
        misfit_base = mk_misfit(pipe.batched_forward_fn("rom_nn", differentiable=(da_inner == "mala")))
        misfit_mid = mk_misfit(coarse_fom_forward(pipe, mlda_resolution))
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_mlda_segmented

            runner = lambda m, p, t0, k, **kw: sharded_mlda_segmented(
                mesh, (misfit_base, misfit_mid, m), p, t0, k, segment=32,
                batched=True, inner=da_inner, **kw,
            )
        else:
            from bayesianinferencedl_tpu.infer.mlda import run_mlda_segmented

            runner = lambda m, p, t0, k, **kw: run_mlda_segmented(
                (misfit_base, misfit_mid, m), p, t0, k, segment=32,
                batched=True, inner=da_inner, **kw,
            )
        kwargs = dict(
            n_steps=n_steps, n_burn=n_burn,
            beta=mala_step if da_inner == "mala" else beta,
            subchains=(subchain, mlda_subchain),
        )
    elif sampler == "da_pcn":
        # delayed acceptance in RFF-coefficient space: rom_nn subchains (pCN
        # or, with da_inner="mala", gradient-informed — the 64-dim regime
        # where Langevin subchains decorrelate ~6x faster per fine eval),
        # exact `likelihood` correction once per outer step (exactness
        # argument in infer/delayed_acceptance.py; n_steps count OUTER steps)
        misfit_c = mk_misfit(pipe.batched_forward_fn("rom_nn", differentiable=(da_inner == "mala")))
        segment = 64 if likelihood == "fom" else 512
        if mesh is not None:
            from bayesianinferencedl_tpu.parallel.sharding import sharded_da_pcn_segmented

            runner = lambda m, p, t0, k, **kw: sharded_da_pcn_segmented(
                mesh, m, misfit_c, p, t0, k, segment=segment,
                batched_fine=True, batched_coarse=True, inner=da_inner, **kw,
            )
        else:
            from bayesianinferencedl_tpu.infer.delayed_acceptance import run_da_pcn_segmented

            runner = lambda m, p, t0, k, **kw: run_da_pcn_segmented(
                m, misfit_c, p, t0, k, segment=segment,
                batched_fine=True, batched_coarse=True, inner=da_inner, **kw,
            )
        kwargs = dict(
            n_steps=n_steps, n_burn=n_burn,
            beta=mala_step if da_inner == "mala" else beta, subchain=subchain,
        )
    elif mesh is not None:
        from bayesianinferencedl_tpu.parallel.sharding import (
            sharded_pcn, sharded_pcn_segmented,
        )

        if likelihood == "fom":
            runner = lambda m, p, t0, k, **kw: sharded_pcn_segmented(
                mesh, m, p, t0, k, segment=64, **kw
            )
        else:
            runner = lambda m, p, t0, k, **kw: sharded_pcn(mesh, m, p, t0, k, **kw)
        kwargs = dict(n_steps=n_steps, n_burn=n_burn, beta=beta, batched=True)
    else:
        runner = run_pcn_segmented if likelihood == "fom" else run_pcn
        kwargs = dict(n_steps=n_steps, n_burn=n_burn, beta=beta, batched=True)
        if likelihood == "fom":
            kwargs["segment"] = 64

    res = runner(misfit, pipe.prior, theta0, k_chain, **kwargs)
    _sync(res)
    t0 = time.perf_counter()
    res = runner(misfit, pipe.prior, theta0, jax.random.fold_in(k_chain, 1), **kwargs)
    _sync(res)
    wall = time.perf_counter() - t0

    ess = ess_bulk(res.samples)
    r = split_rhat(res.samples)
    log.log(
        "ff_inversion",
        likelihood=likelihood,
        sampler=sampler,
        wall_seconds=wall,
        samples_per_sec=res.samples.shape[0] * res.samples.shape[1] / wall,
        ess_min=float(jnp.min(ess)),
        accept_rate=float(jnp.mean(res.accept_rate)),
    )
    return res, z_true, data, ess, r, wall


def _batched_solve_u(pipe: FullFieldPipeline, zs: jax.Array) -> jax.Array:
    """(B, M) coefficients -> (B, n) temperature fields, through the SAME
    solver route the FOM-likelihood samplers use (fused Pallas stencil CG
    with deflation on TPU, vmapped implicit-diff solve elsewhere)."""
    ks = jax.vmap(pipe.conductivity)(zs)
    if jax.default_backend() == "tpu" and pipe.op.dtype == jnp.float32:
        from bayesianinferencedl_tpu.ops.pcg_stencil import (
            derived_maxiter, solve_fom_stencil_pallas,
        )

        mi = min(pipe.cg_maxiter, derived_maxiter(pipe.op.resolution))
        u, _ = jax.jit(
            lambda k: solve_fom_stencil_pallas(
                pipe.op, k, tol=pipe.cg_tol, maxiter=mi, deflation=pipe.deflation
            )
        )(ks)
        return u
    return jax.vmap(
        lambda k: solve_fom(pipe.op, k, tol=pipe.cg_tol, maxiter=pipe.cg_maxiter)
    )(ks)


def predict_temperature_ff(
    pipe: FullFieldPipeline,
    samples: jax.Array,
    *,
    points=None,
    n_draws: int = 256,
    noise_sigma: Optional[float] = None,
):
    """Posterior push-forward prediction of the temperature field for the
    full-field pipeline (same contract as api.predict_temperature: samples
    are kept chain states over RFF coefficients z, (T, C, M) or (N, M);
    returns utils.predict.FieldPrediction in mesh-node order)."""
    from bayesianinferencedl_tpu.utils.ppc import thin_samples
    from bayesianinferencedl_tpu.utils.predict import predict_field

    s = jnp.asarray(samples)
    if s.ndim == 2:
        s = s[:, None, :]
    zs = thin_samples(s, n_draws)
    u = _batched_solve_u(pipe, zs)
    mesh, gid = pipe.node_mesh_ids()
    return predict_field(u, gid, mesh, points=points, noise_sigma=noise_sigma)


def predict_conductivity_ff(
    pipe: FullFieldPipeline,
    samples: jax.Array,
    *,
    points=None,
    n_draws: int = 512,
):
    """Posterior of the LOG-CONDUCTIVITY field itself — the inferred
    quantity — summarized per mesh node (mean / pointwise std / quantiles).
    Linear in z, so no solves: one (D, M) x (M, n_nodes) matmul over the
    thinned subsample. Generalizes scripts/plot_ff_posterior.py's panels
    into a first-class API."""
    from bayesianinferencedl_tpu.utils.ppc import thin_samples
    from bayesianinferencedl_tpu.utils.predict import predict_field

    s = jnp.asarray(samples)
    if s.ndim == 2:
        s = s[:, None, :]
    zs = thin_samples(s, n_draws)
    mesh, gid = pipe.node_mesh_ids()
    feats = pipe.field.features[jnp.asarray(gid)]  # (n_nodes, M)
    theta_draws = pipe.field.mean + pipe.field.sigma * jnp.dot(
        zs, feats.T, precision=jax.lax.Precision.HIGHEST
    )
    return predict_field(
        theta_draws, np.arange(mesh.n_nodes), mesh, points=points
    )


def run_sbc_check_ff(
    pipe: FullFieldPipeline,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-2,
    n_datasets: int = 128,
    n_chains: int = 31,
    n_steps: int = 1500,
    n_burn: int = 1000,
    beta: float = 0.25,
    n_bins: int = 8,
    sampler: str = "pcn",
    step: float = 0.1,
    n_leap: int = 8,
    n_temps: int = 5,
    lambda_min: float = 0.02,
    seed: int = 0,
    metrics: Optional[MetricsLogger] = None,
):
    """Simulation-based calibration of the FULL-FIELD sampler stack
    (infer/sbc.py; same contract as api.run_sbc_check): J synthetic
    64-dim RFF inversions drawn from the pipeline's own N(0, I) z-prior x
    Gaussian likelihood, all run as ONE batched program; rank-uniformity
    per coefficient is the posterior-correctness verdict.

    d is large here, so the J*C chain-slot batch is the same shape the
    production full-field samplers run — SBC costs one production-scale
    run. With d p-values the min is expected small under uniformity:
    gate on a Sidak-corrected threshold (1 - (1-alpha)^(1/d)), which
    api_full_field's CLI and scripts do. noise_sigma: the SIMULATION and
    inference noise (the calibration is of the stated model; default the
    unimodal 1e-2 regime — at 1e-3 the posterior is multimodal
    (artifacts/ff_modality_r3.json) and single-temperature kernels should
    FAIL this check while sampler='pt_pcn' should pass).
    """
    from bayesianinferencedl_tpu.infer.sbc import run_sbc

    fwd_b = pipe.batched_forward_fn(
        likelihood, differentiable=sampler in ("mala", "hmc")
    )
    t0 = time.perf_counter()
    res = run_sbc(
        fwd_b, pipe.prior, noise_sigma, jax.random.PRNGKey(seed),
        n_datasets=n_datasets, n_chains=n_chains, n_steps=n_steps,
        n_burn=n_burn, beta=beta, n_bins=n_bins,
        sampler=sampler, step=step, n_leap=n_leap,
        n_temps=n_temps, lambda_min=lambda_min,
    )
    if metrics is not None:
        metrics.log(
            "sbc_ff", likelihood=likelihood, n_datasets=n_datasets,
            n_chains=n_chains, sampler=sampler, noise_sigma=noise_sigma,
            p_min=float(jnp.min(res.p_values)),
            wall_seconds=time.perf_counter() - t0,
        )
    return res


def run_eki_inversion_ff(
    pipe: FullFieldPipeline,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    n_ensemble: int = 1024,
    ess_target: float = 0.5,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """Derivative-free ensemble Kalman inversion of the full-field model
    (infer/eki.py; same contract as api.run_eki_inversion): the 64-dim RFF
    posterior approximated in ~10-20 batched forward sweeps. Returns
    (EKIResult, z_true, data, wall_seconds)."""
    from bayesianinferencedl_tpu.infer.eki import run_eki

    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_run = jax.random.split(key, 3)
    dtype = pipe.prior.mean.dtype
    if data is not None:
        data = jnp.asarray(data, dtype)
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol,
                      maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    import time as _t

    fwd_b = pipe.batched_forward_fn(likelihood)
    t0 = _t.perf_counter()
    res = run_eki(
        fwd_b, pipe.prior, data, noise_sigma, k_run,
        n_ensemble=n_ensemble, ess_target=ess_target, mesh=mesh,
    )
    wall = _t.perf_counter() - t0
    if metrics is not None:
        metrics.log(
            "eki_ff", likelihood=likelihood, n_ensemble=n_ensemble,
            n_iters=len(res.ts) - 1, n_forward=res.n_forward,
            misfit_final=res.misfit_trace[-1], wall_seconds=wall,
        )
    return res, z_true, data, wall


def run_vi_inversion_ff(
    pipe: FullFieldPipeline,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    rank: str = "full",
    n_steps: int = 1500,
    n_mc: int = 32,
    lr: float = 0.05,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """Gradient-based variational approximation of the full-field posterior
    (infer/vi.py ADVI; same contract as api.run_vi_inversion): the 64-dim
    RFF posterior fit as q = N(mu, L L^T) — rank='full' carries the full
    64x64 coefficient covariance, which no ensemble of practical size pins
    this cheaply. Returns (VIResult, z_true, data, wall_seconds). Honest
    contract as everywhere: mode-seeking — at this model's multimodal
    default noise_sigma=1e-3 the fit describes ONE basin; certify with
    pt_pcn/pt_da_pcn (docs/SAMPLERS.md)."""
    from bayesianinferencedl_tpu.infer.vi import run_advi

    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_run = jax.random.split(key, 3)
    dtype = pipe.prior.mean.dtype
    if data is not None:
        data = jnp.asarray(data, dtype)
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol,
                      maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    import time as _t

    fwd_bl = pipe.batched_forward_fn(likelihood, differentiable=True)
    misfit_b = gaussian_misfit(fwd_bl, data, noise_sigma)
    t0 = _t.perf_counter()
    if mesh is not None:
        from bayesianinferencedl_tpu.parallel.sharding import sharded_advi

        res = sharded_advi(
            mesh, misfit_b, pipe.prior, k_run,
            n_steps=n_steps, n_mc=n_mc, rank=rank, lr=lr, batched=True,
        )
    else:
        res = run_advi(
            misfit_b, pipe.prior, k_run,
            n_steps=n_steps, n_mc=n_mc, rank=rank, lr=lr, batched=True,
        )
    jax.block_until_ready(res.theta_mean)
    wall = _t.perf_counter() - t0
    if metrics is not None:
        metrics.log(
            "vi_ff", likelihood=likelihood, rank=rank, n_steps=n_steps,
            n_mc=n_mc, n_forward=res.n_forward,
            elbo_final=float(jnp.mean(res.elbo_trace[-50:])),
            wall_seconds=wall,
        )
    return res, z_true, data, wall


def run_svgd_inversion_ff(
    pipe: FullFieldPipeline,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    n_particles: int = 512,
    n_steps: int = 800,
    lr: float = 0.05,
    anneal_steps: Optional[int] = None,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    segment: Optional[int] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """Particle-transport approximation of the full-field posterior (SVGD,
    infer/svgd.py; same contract as api.run_svgd_inversion): nonparametric
    and gradient-based — at d=64 the kernelized repulsion's variance
    underestimation grows with d/J, so read spreads as lower bounds (module
    docstring; the Gaussian-family alternative is run_vi_inversion_ff).
    Annealing is on by default — this model's default noise_sigma=1e-3 is
    the measured multimodal regime (artifacts/ff_modality_r3.json).
    segment: scan chunk size (None = likelihood-aware auto: the fom route
    auto-segments at 100 steps for the ~60 s watchdog, CLAUDE.md rule 2;
    the fused rom/rom_nn routes run unsegmented — same rationale as
    api.run_svgd_inversion). Returns (SVGDResult, z_true, data,
    wall_seconds)."""
    from bayesianinferencedl_tpu.infer.svgd import run_svgd

    if segment is None and likelihood == "fom":
        segment = 100

    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_run = jax.random.split(key, 3)
    dtype = pipe.prior.mean.dtype
    if data is not None:
        data = jnp.asarray(data, dtype)
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol,
                      maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    import time as _t

    fwd_bl = pipe.batched_forward_fn(likelihood, differentiable=True)
    misfit_b = gaussian_misfit(fwd_bl, data, noise_sigma)
    t0 = _t.perf_counter()
    if mesh is not None:
        from bayesianinferencedl_tpu.parallel.sharding import sharded_svgd

        res = sharded_svgd(
            mesh, misfit_b, pipe.prior, k_run,
            n_particles=n_particles, n_steps=n_steps, lr=lr,
            anneal_steps=anneal_steps, batched=True, segment=segment,
        )
    else:
        res = run_svgd(
            misfit_b, pipe.prior, k_run,
            n_particles=n_particles, n_steps=n_steps, lr=lr,
            anneal_steps=anneal_steps, batched=True, segment=segment,
        )
    jax.block_until_ready(res.mean)
    wall = _t.perf_counter() - t0
    if metrics is not None:
        metrics.log(
            "svgd_ff", likelihood=likelihood, n_particles=n_particles,
            n_steps=n_steps, n_forward=res.n_forward,
            misfit_final=float(res.misfit_trace[-1]), wall_seconds=wall,
        )
    return res, z_true, data, wall


def psis_certify_ff(
    pipe: FullFieldPipeline,
    q_mean: jax.Array,
    q_chol: jax.Array,
    data: jax.Array,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    n_draws: int = 4096,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """PSIS certify-and-correct for a full-field Gaussian fit (infer/psis.py;
    same contract as api.psis_certify): one batched gradient-free forward
    sweep over n_draws proposal draws — for the fom likelihood that is one
    fused Pallas deflated-CG dispatch — then the k-hat gate and
    importance-weighted moments over the RFF coefficients."""
    from bayesianinferencedl_tpu.infer.psis import psis_correct

    key = key if key is not None else jax.random.PRNGKey(7)
    fwd_b = pipe.batched_forward_fn(likelihood)
    misfit_b = gaussian_misfit(
        fwd_b, jnp.asarray(data, pipe.prior.mean.dtype), noise_sigma
    )
    res = psis_correct(
        misfit_b, pipe.prior, q_mean, q_chol, key,
        n_draws=n_draws, batched=True, mesh=mesh,
    )
    if metrics is not None:
        metrics.log(
            "psis_ff", likelihood=likelihood, n_draws=n_draws,
            k_hat=res.k_hat, ess=res.ess, reliable=res.reliable,
        )
    return res


def run_flow_vi_inversion_ff(
    pipe: FullFieldPipeline,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    n_couplings: int = 6,
    hidden: int = 64,
    pretrain: str = "smc",
    pretrain_particles: int = 2048,
    pretrain_steps: int = 3000,
    n_mutations: int = 5,
    max_stages: int = 64,
    n_steps: Optional[int] = None,
    n_mc: int = 64,
    lr: float = 0.003,
    anneal_steps: Optional[int] = None,
    z_true: Optional[jax.Array] = None,
    data: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """Normalizing-flow approximation of the full-field posterior
    (infer/flow.py; same contract as api.run_flow_vi_inversion): the 64-dim
    RFF posterior at its multimodal/metastable default noise_sigma=1e-3 is
    exactly where every Gaussian fit describes ONE basin
    (run_vi_inversion_ff's documented caveat) — the SMC-pretrained
    mass-covering flow is the approximation-layer member built for that
    regime, and run_neutra_inversion_ff samples the exact posterior in its
    latent frame. Returns (FlowVIResult, z_true, data, wall_seconds)."""
    from bayesianinferencedl_tpu.infer.flow import flow_fit_pipeline

    key = key if key is not None else jax.random.PRNGKey(0)
    k_true, k_noise, k_fit = jax.random.split(key, 3)
    dtype = pipe.prior.mean.dtype
    if data is not None:
        data = jnp.asarray(data, dtype)
        if z_true is None:
            z_true = jnp.zeros_like(pipe.prior.mean)
    else:
        if z_true is None:
            z_true = pipe.prior.sample(k_true)
        y_true = pipe.op.observe(
            solve_fom(pipe.op, pipe.conductivity(z_true), tol=pipe.cg_tol,
                      maxiter=pipe.cg_maxiter)
        )
        data = y_true + noise_sigma * jax.random.normal(k_noise, y_true.shape, dtype)

    import time as _t

    misfit_b = gaussian_misfit(pipe.batched_forward_fn(likelihood), data, noise_sigma)
    misfit_bd = gaussian_misfit(
        pipe.batched_forward_fn(likelihood, differentiable=True), data, noise_sigma
    )
    t0 = _t.perf_counter()
    res, n_stages = flow_fit_pipeline(
        misfit_b, misfit_bd, pipe.prior, k_fit,
        n_couplings=n_couplings, hidden=hidden, pretrain=pretrain,
        pretrain_particles=pretrain_particles, pretrain_steps=pretrain_steps,
        n_mutations=n_mutations, max_stages=max_stages, n_steps=n_steps,
        n_mc=n_mc, lr=lr, anneal_steps=anneal_steps, mesh=mesh,
    )
    jax.block_until_ready(res.theta_mean)
    wall = _t.perf_counter() - t0
    if metrics is not None:
        metrics.log(
            "flow_vi_ff", likelihood=likelihood, pretrain=pretrain,
            n_couplings=n_couplings, smc_stages=n_stages,
            n_forward=res.n_forward, wall_seconds=wall,
        )
    return res, z_true, data, wall


def psis_certify_flow_ff(
    pipe: FullFieldPipeline,
    flow_res,
    data: jax.Array,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    n_draws: int = 4096,
    base_scale: float = 1.0,
    key: Optional[jax.Array] = None,
    mesh=None,
    metrics: Optional[MetricsLogger] = None,
):
    """psis_certify_ff for a full-field flow fit: exact latent log-densities
    make the k-hat gate and importance-corrected RFF-coefficient moments
    apply to the non-Gaussian member too (infer/flow.py flow_psis_certify;
    mode-missing blind-spot caveat applies as documented there)."""
    from bayesianinferencedl_tpu.infer.flow import flow_psis_certify

    key = key if key is not None else jax.random.PRNGKey(7)
    misfit_b = gaussian_misfit(
        pipe.batched_forward_fn(likelihood),
        jnp.asarray(data, pipe.prior.mean.dtype), noise_sigma,
    )
    res = flow_psis_certify(
        misfit_b, pipe.prior, flow_res, key,
        n_draws=n_draws, batched=True, base_scale=base_scale, mesh=mesh,
    )
    if metrics is not None:
        metrics.log(
            "psis_flow_ff", likelihood=likelihood, n_draws=n_draws,
            k_hat=res.k_hat, ess=res.ess, reliable=res.reliable,
        )
    return res


def run_neutra_inversion_ff(
    pipe: FullFieldPipeline,
    flow_res,
    data: jax.Array,
    likelihood: str = "rom_nn",
    *,
    noise_sigma: float = 1e-3,
    z_true: Optional[jax.Array] = None,
    n_chains: int = 1024,
    n_steps: int = 2000,
    n_burn: int = 1000,
    beta: float = 0.3,
    thin: int = 1,
    key: Optional[jax.Array] = None,
    metrics: Optional[MetricsLogger] = None,
):
    """Flow-preconditioned pCN on the EXACT full-field posterior
    (infer/flow.py run_neutra_pcn; same contract as api.run_neutra_inversion):
    basins of the 64-dim RFF posterior the flow connects through latent
    space become pCN-traversable at one fused likelihood per step.
    Returns api.InversionResult with rank-normalized split diagnostics over
    the pushed-forward coefficient samples."""
    import time as _t

    from bayesianinferencedl_tpu.api import InversionResult
    from bayesianinferencedl_tpu.infer.diagnostics import (
        ess_bulk, ess_tail, split_rhat,
    )
    from bayesianinferencedl_tpu.infer.flow import run_neutra_pcn

    key = key if key is not None else jax.random.PRNGKey(11)
    dtype = pipe.prior.mean.dtype
    if z_true is None:
        z_true = jnp.zeros_like(pipe.prior.mean)
    misfit_b = gaussian_misfit(
        pipe.batched_forward_fn(likelihood), jnp.asarray(data, dtype),
        noise_sigma,
    )
    t0 = _t.perf_counter()
    out = run_neutra_pcn(
        flow_res, misfit_b, pipe.prior, key,
        n_chains=n_chains, n_steps=n_steps, n_burn=n_burn, beta=beta,
        thin=thin, batched=True,
    )
    jax.block_until_ready(out.samples)
    wall = _t.perf_counter() - t0
    ess = ess_bulk(out.samples)
    ess_t = ess_tail(out.samples)
    rh = split_rhat(out.samples)
    n_total = out.samples.shape[0] * out.samples.shape[1]
    res = InversionResult(
        result=out, theta_true=z_true, data=jnp.asarray(data, dtype),
        ess=ess, rhat=rh, wall_seconds=wall,
        samples_per_sec=n_total / wall,
        ess_per_sec=float(jnp.min(ess)) / wall, ess_tail=ess_t,
    )
    if metrics is not None:
        metrics.log(
            "neutra_ff", likelihood=likelihood, n_chains=n_chains,
            n_steps=n_steps, rhat_split_max=float(jnp.max(rh)),
            ess_bulk_min=float(jnp.min(ess)),
            accept_rate=float(jnp.mean(out.accept_rate)),
            wall_seconds=wall,
        )
    return res
