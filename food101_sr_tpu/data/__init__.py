from .pipeline import (
    SRDataLoader,
    load_hr_crop,
    load_sample,
    prepare_batch,
    subset_indices,
    train_val_split,
)
from .sources import Food101Source, SyntheticSource

__all__ = [
    "Food101Source",
    "SRDataLoader",
    "SyntheticSource",
    "load_hr_crop",
    "load_sample",
    "prepare_batch",
    "subset_indices",
    "train_val_split",
]
