"""P1 finite-element full-order model (SURVEY.md §1 L2, §7 stage 2).

Replaces the reference's FEniCS/PETSc stack (SURVEY.md §2b) with:
  p1.py        closed-form P1 element matrices (host NumPy — no form compiler)
  assemble.py  affine stiffness components A_i + boundary mass in a padded
               ELL sparse layout tuned for TPU gathers
  operators.py the device-side pytree operator: assemble A(k) values, SpMV
  solve.py     batched Jacobi-PCG wrapped in lax.custom_linear_solve so
               gradients/HVPs flow by implicit differentiation
  oracle.py    SciPy float64 reference assembly/solve (test oracle)
"""

from bayesianinferencedl_tpu.fem.assemble import assemble_fin, FinFEMHost  # noqa: F401
from bayesianinferencedl_tpu.fem.operators import FinOperator  # noqa: F401
from bayesianinferencedl_tpu.fem.solve import solve_fom, pcg  # noqa: F401
