"""Reduced-order model subsystem (SURVEY.md §1 L3, §7 stage 3).

Rebuilds the reference's POD/greedy reduced-basis pipeline (SURVEY.md §2a
#5, §3.3) TPU-first: snapshot generation is one vmapped batched FOM solve,
POD is an on-device Gram-matrix eigendecomposition, the Galerkin-projected
affine operators live as a (5, r, r) stack, and online solves are vmapped
r x r dense solves that batch onto the MXU.
"""

from bayesianinferencedl_tpu.rom.pod import pod_basis  # noqa: F401
from bayesianinferencedl_tpu.rom.galerkin import ReducedOperator  # noqa: F401
from bayesianinferencedl_tpu.rom.snapshots import generate_snapshots  # noqa: F401
from bayesianinferencedl_tpu.rom.greedy import greedy_basis  # noqa: F401
