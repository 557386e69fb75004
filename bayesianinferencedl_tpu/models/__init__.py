"""Model layer: parameterizations, the NN error surrogate, and the corrected
forward model (SURVEY.md §1 L4, §2a #3/#4/#7/#8)."""

from bayesianinferencedl_tpu.models.surrogate import MLP, AdamState, train_surrogate  # noqa: F401
from bayesianinferencedl_tpu.models.corrected import CorrectedForward  # noqa: F401
from bayesianinferencedl_tpu.models.five_param import FiveParamFin  # noqa: F401
from bayesianinferencedl_tpu.models.full_field import FullFieldFin  # noqa: F401
