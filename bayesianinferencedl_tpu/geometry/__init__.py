"""Thermal-fin geometry and meshing (SURVEY.md §1 L1, Appendix B).

Host-side NumPy only: meshes are static, so nothing here needs to run on the
TPU. The mesh is consumed by ``fem.assemble`` which turns it into
device-resident affine operator arrays.
"""

from bayesianinferencedl_tpu.geometry.fin import (  # noqa: F401
    FIN_EXTENT,
    N_REGIONS,
    POST_HALF_WIDTH,
    POST_HEIGHT,
    REGION_POST,
    SUBFIN_THICKNESS,
    subfin_y_interval,
    region_of_points,
)
from bayesianinferencedl_tpu.geometry.mesh import FinMesh, build_fin_mesh  # noqa: F401
