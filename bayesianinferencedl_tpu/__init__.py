"""bayesianinferencedl_tpu — TPU-native Bayesian inference with reduced-order
models and deep-learning error surrogates.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo ``sheroze1123/BayesianInferenceDL`` (thermal-fin PDE-constrained Bayesian
inversion accelerated by POD reduced-order models and an NN error surrogate;
see SURVEY.md for the full capability contract — the reference mount was empty
so citations are to SURVEY.md sections rather than reference file:line).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

    geometry/  thermal-fin triangulation, subdomain + boundary markers  (L1)
    fem/       P1 finite elements, affine ELL operators, batched PCG    (L2)
    rom/       POD/greedy reduced bases, Galerkin online solves         (L3)
    models/    parameterizations, NN error surrogate, corrected forward (L4)
    infer/     pCN MCMC, MAP, Laplace approximation, diagnostics        (L5)
    parallel/  device-mesh sharding of chain/snapshot batches (ICI)
    ops/       Pallas TPU kernels for the hot paths
    utils/     metrics, checkpointing, adjoint oracles
    data/      dataset generation (parameter -> ROM-error pairs)
"""

__version__ = "0.1.0"

from bayesianinferencedl_tpu import config as config  # noqa: F401
