"""Dataset registry (parity with lib/datasets/factory.py:14-39)."""

from __future__ import annotations

from typing import Callable, Optional

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data.datasets import (OCIDObject, OSDObject,
                                                      TableTopObject)

DATASETS: dict[str, Callable] = {}


def _register(name: str, ctor: Callable, image_set: str) -> None:
    DATASETS[name] = lambda cfg, path=None: ctor(image_set, cfg, path=path)


for _split in ("train", "test", "all"):
    _register(f"tabletop_object_{_split}", TableTopObject, _split)
_register("osd_object_test", OSDObject, "test")
_register("ocid_object_test", OCIDObject, "test")


def _register_synthetic():
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    for split in ("train", "test"):
        _register(f"synthetic_tabletop_{split}", SyntheticTabletopDataset,
                  split)


_register_synthetic()


def get_dataset(name: str, cfg: Config, path: Optional[str] = None):
    """Build a dataset by its reference-compatible registry name."""
    if name not in DATASETS:
        raise KeyError(
            f"unknown dataset {name!r}; available: {sorted(DATASETS)}")
    return DATASETS[name](cfg, path=path)
