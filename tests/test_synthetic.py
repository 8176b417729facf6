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
    # every instance has real mass and valid depth (>= 3 px: v4's thin
    # pens/plates can legitimately cover only a few pixels at this tiny
    # 64x96 test resolution)
    z = s["depth"][..., 2]
    for i in range(1, k + 1):
        m = s["label"] == i
        assert m.sum() >= 3
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


def test_render_v4_bowl_is_concave():
    """The v4 bowl primitive must be CONCAVE: rays through the opening hit
    the inner shell, so the depth at the bowl center exceeds the rim
    depth (a convex v3 primitive could never do this)."""
    import numpy as np

    from unseenobjectclustering_tpu.data.synthetic import _isect_bowl

    h = w = 64
    v, u = np.mgrid[:h, :w].astype(np.float32)
    f = 32.0
    d = np.stack([(u - w / 2) / f, (v - h / 2) / f, np.ones_like(u)],
                 axis=-1)
    # bowl 1 m straight ahead, opening toward the camera (-z)
    c = np.array([0.0, 0.0, 1.0], np.float32)
    axis = np.array([0.0, 0.0, -1.0], np.float32)
    tt, nrm = _isect_bowl(d, c, axis, 0.3, 0.26)
    center = tt[h // 2, w // 2]
    assert np.isfinite(center)
    # the center ray passes the rim plane (z=1.0) and lands on the inner
    # shell bottom (z = 1.0 + 0.26)
    assert center > 1.2, f"bowl center not concave: t={center}"
    # rim: a ray hitting the annulus reads ~1.0
    finite = tt[np.isfinite(tt)]
    assert finite.min() < 1.01
    # normals unit where finite
    nn = np.linalg.norm(nrm[np.isfinite(tt)], axis=-1)
    assert np.allclose(nn, 1.0, atol=1e-4)


def test_render_v4_smoke_new_kinds():
    """Render enough scenes that every v4 kind (bowl/container/lying
    cylinder/plate/pen + legs) is exercised; labels stay contiguous and
    depth is valid where labeled."""
    import numpy as np

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    cfg = Config.default()
    ds = SyntheticTabletopDataset("train", cfg, height=96, width=128,
                                  size=4, min_objects=4, max_objects=8)
    for i in range(4):
        bgr, depth, lab = ds.render(np.random.RandomState(1234 + i))
        assert bgr.shape == (96, 128, 3) and bgr.dtype == np.uint8
        assert (depth >= 0).all()
        k = lab.max()
        assert k >= 1
        # objects carry valid depth (inside the far clip)
        assert depth[lab > 0].min() > 0


def test_realsense_artifacts_host():
    """add_realsense_artifacts only ERASES depth (never invents it), is
    deterministic under a seeded rng, and concentrates holes near depth
    edges the way the real demo captures do."""
    import numpy as np

    from unseenobjectclustering_tpu.data.augmentation import (
        add_realsense_artifacts)

    rng = np.random.RandomState(0)
    depth = np.full((120, 160), 1.0, np.float32)
    depth[40:80, 50:100] = 0.6          # a box-shaped depth discontinuity
    out = add_realsense_artifacts(depth, np.random.RandomState(3))
    assert out.shape == depth.shape
    changed = out != depth
    assert (out[changed] == 0).all()    # drops only
    assert changed.any()
    out2 = add_realsense_artifacts(depth, np.random.RandomState(3))
    assert np.array_equal(out, out2)    # deterministic per seed
    # never drops EVERYTHING
    assert (out > 0).mean() > 0.5
