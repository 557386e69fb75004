"""Bayesian inversion layer (SURVEY.md §1 L5, §7 stage 5).

Rebuilds the reference's MUQ2-based MCMC machinery (SURVEY.md §2a #10) as
pure-JAX kernels: the pCN proposal/accept step is a pure function
(state, key) -> state with the likelihood inlined, vmapped over thousands of
chains and shard_mapped over the device mesh — eliminating the per-step
Python<->C++ boundary crossing the reference pays (SURVEY.md §3.5).
"""

from bayesianinferencedl_tpu.infer.priors import GaussianPrior  # noqa: F401
from bayesianinferencedl_tpu.infer.pcn import (  # noqa: F401
    PCNState, gaussian_misfit, marginal_misfit, pcn_init, pcn_step, run_pcn,
)
from bayesianinferencedl_tpu.infer.map import find_map, laplace_approximation  # noqa: F401
from bayesianinferencedl_tpu.infer.diagnostics import (  # noqa: F401
    effective_sample_size, ess_bulk, ess_tail, rhat, split_rhat,
)
from bayesianinferencedl_tpu.infer.delayed_acceptance import run_da_pcn  # noqa: F401
from bayesianinferencedl_tpu.infer.mlda import run_mlda, run_mlda_segmented  # noqa: F401
from bayesianinferencedl_tpu.infer.mala import run_mala, run_mala_segmented  # noqa: F401
from bayesianinferencedl_tpu.infer.hmc import run_hmc, run_hmc_segmented  # noqa: F401
from bayesianinferencedl_tpu.infer.lis import LIS, build_lis, run_lis_pcn  # noqa: F401
from bayesianinferencedl_tpu.infer.smc import SMCResult, run_smc  # noqa: F401
from bayesianinferencedl_tpu.infer.svgd import SVGDResult, run_svgd  # noqa: F401
from bayesianinferencedl_tpu.infer.flow import (  # noqa: F401
    CouplingFlow, FlowVIResult, fit_flow_mle, flow_psis_certify, flow_sample,
    neutra_misfit, run_flow_vi, run_neutra_pcn,
)
