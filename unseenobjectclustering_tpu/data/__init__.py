"""Datasets: TableTop (synthetic train), OCID / OSD (real eval), loaders.

Host-side numpy data layer feeding the jitted device pipeline; layout is
NHWC float32 (the reference emits CHW torch tensors).
"""

from unseenobjectclustering_tpu.data.factory import get_dataset, DATASETS
from unseenobjectclustering_tpu.data.loader import DataLoader
from unseenobjectclustering_tpu.data.resident import load_resident_scenes

__all__ = ["get_dataset", "DATASETS", "DataLoader", "load_resident_scenes"]
