"""Procedural synthetic tabletop dataset tests."""

import numpy as np

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data import get_dataset


def small_cfg(mode="TEST"):
    return Config.from_dict({
        "MODE": mode, "INPUT": "RGBD",
        "TRAIN": {"SYN_WIDTH": 96, "SYN_HEIGHT": 64, "SYNNUM": 50,
                  "SYN_MIN_OBJECT": 3, "SYN_MAX_OBJECT": 5,
                  "EMBEDDING_SAMPLING": mode == "TRAIN",
                  "EMBEDDING_SAMPLING_NUM": 100},
    })


def test_scene_contract():
    ds = get_dataset("synthetic_tabletop_test", small_cfg())
    s = ds[0]
    assert s["image_color"].shape == (64, 96, 3)
    assert s["depth"].shape == (64, 96, 3)
    assert s["label"].shape == (64, 96)
    k = s["label"].max()
    assert 1 <= k <= 5
    # every instance has real mass and valid depth
    z = s["depth"][..., 2]
    for i in range(1, k + 1):
        m = s["label"] == i
        assert m.sum() >= 10
        assert (z[m] > 0).mean() > 0.9
    # labels are contiguous 0..K
    assert set(np.unique(s["label"])) == set(range(k + 1))


def test_deterministic_and_distinct():
    ds = get_dataset("synthetic_tabletop_test", small_cfg())
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_array_equal(a["image_color"], b["image_color"])
    c = ds[4]
    assert not np.array_equal(a["label"], c["label"])


def test_train_mode_sampling_and_noise():
    ds = get_dataset("synthetic_tabletop_train", small_cfg("TRAIN"))
    s = ds[0]
    lab = s["label"]
    assert (lab == -1).any()  # pixel sampling active
    for i in range(int(lab.max()) + 1):
        assert (lab == i).sum() <= 100


def test_train_test_splits_differ():
    tr = get_dataset("synthetic_tabletop_train", small_cfg())
    te = get_dataset("synthetic_tabletop_test", small_cfg())
    assert not np.array_equal(tr[0]["label"], te[0]["label"])


def test_syn_crop_mode():
    cfg = Config.from_dict({
        "MODE": "TRAIN", "INPUT": "RGBD",
        "TRAIN": {"SYN_WIDTH": 96, "SYN_HEIGHT": 64, "SYNNUM": 10,
                  "SYN_MIN_OBJECT": 3, "SYN_MAX_OBJECT": 5,
                  "SYN_CROP": True, "SYN_CROP_SIZE": 48}})
    from unseenobjectclustering_tpu.data import get_dataset
    ds = get_dataset("synthetic_tabletop_train", cfg)
    s = ds[0]
    assert s["image_color"].shape == (48, 48, 3)
    assert s["depth"].shape == (48, 48, 3)
    assert s["label"].shape == (48, 48)


def test_cache_manifest_rejects_mismatched_params(tmp_path):
    """A render cache remembers base_seed / object-count range
    (params.json); opening it with different scene parameters must raise
    instead of silently serving the old distribution."""
    import pytest

    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    cfg = small_cfg()
    d1 = SyntheticTabletopDataset("test", cfg, cache_dir=str(tmp_path))
    d1.get_scene(0)  # renders + writes scene and manifest
    # same params: reads back fine
    d2 = SyntheticTabletopDataset("test", cfg, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(d2.get_scene(0)[2], d1.get_scene(0)[2])
    # different object range: refused
    d3 = SyntheticTabletopDataset("test", cfg, cache_dir=str(tmp_path),
                                  max_objects=9)
    with pytest.raises(ValueError, match="render cache"):
        d3.get_scene(0)
    # different base seed: refused
    d4 = SyntheticTabletopDataset("test", cfg, cache_dir=str(tmp_path),
                                  base_seed=11)
    with pytest.raises(ValueError, match="render cache"):
        d4.get_scene(0)
    # the guard must keep firing: a caught mismatch on the first call must
    # not mark the manifest as checked
    with pytest.raises(ValueError, match="render cache"):
        d4.get_scene(1)
    # public entry for direct-cache readers (data.resident) hits the same
    # guard without touching get_scene
    d5 = SyntheticTabletopDataset("test", cfg, cache_dir=str(tmp_path),
                                  base_seed=11)
    with pytest.raises(ValueError, match="render cache"):
        d5.check_cache_manifest()
