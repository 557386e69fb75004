"""Dataset generation (SURVEY.md §2a #6: the reference's
generate_fin_dataset.py, rebuilt as one vmapped pipeline)."""

from bayesianinferencedl_tpu.data.datasets import generate_error_dataset, ErrorDataset  # noqa: F401
