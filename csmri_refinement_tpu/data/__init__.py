"""Data pipeline: datasets, host transforms, loader, device forward model."""

from csmri_refinement_tpu.data.datasets import (  # noqa: F401
    load_dataset, is_dataset, SliceDataset)
from csmri_refinement_tpu.data.loader import DataLoader  # noqa: F401
