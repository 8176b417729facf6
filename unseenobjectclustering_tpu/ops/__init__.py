"""Jitted compute ops: preprocessing, clustering, resizing, RoI handling."""

from unseenobjectclustering_tpu.ops.mean_shift import (MeanShiftResult,
                                                       mean_shift_smart_init)
from unseenobjectclustering_tpu.ops.preprocess import (compute_xyz,
                                                       normalize_bgr,
                                                       preprocess_rgbd)
from unseenobjectclustering_tpu.ops.resize import (resize_nearest_legacy,
                                                   upsample_bilinear)

__all__ = [
    "MeanShiftResult", "mean_shift_smart_init", "compute_xyz",
    "normalize_bgr", "preprocess_rgbd", "resize_nearest_legacy",
    "upsample_bilinear",
]
