"""Pallas TPU kernels for the hot compute paths (BASELINE north-star:
"batched assembly + SpMV as Pallas kernels over HBM-resident element
arrays"; here the layout is even stronger — a gather-free 7-point stencil,
so the whole batched PCG fuses into one kernel with VMEM-resident state).
"""

from bayesianinferencedl_tpu.ops.deflation import DeflationBasis  # noqa: F401
from bayesianinferencedl_tpu.ops.pcg_stencil import (  # noqa: F401
    pcg_stencil_batch,
    pick_layout,
    solve_fom_stencil_pallas,
)
