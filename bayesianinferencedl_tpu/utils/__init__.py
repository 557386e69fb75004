"""Auxiliary subsystems (SURVEY.md §5): metrics, checkpoint/resume, and the
hand-coded adjoint kept as an autodiff test oracle."""

from bayesianinferencedl_tpu.utils.adjoint import adjoint_gradient, adjoint_gn_hvp  # noqa: F401
from bayesianinferencedl_tpu.utils.metrics import MetricsLogger  # noqa: F401
from bayesianinferencedl_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
