from .canvas_cache import CanvasStore, DeviceWindowLoader, HostCanvasLoader
from .device_cache import DeviceCacheLoader, build_canvas_cache
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
    "CanvasStore",
    "DeviceCacheLoader",
    "DeviceWindowLoader",
    "Food101Source",
    "HostCanvasLoader",
    "SRDataLoader",
    "SyntheticSource",
    "build_canvas_cache",
    "load_hr_crop",
    "load_sample",
    "prepare_batch",
    "subset_indices",
    "train_val_split",
]
