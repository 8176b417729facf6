"""Tests for the on-device training input pipeline (ops/train_pipeline.py).

Each device stage is checked against the host reference semantics
(data/augmentation.py / datasets.sample_pixels) at the distribution or
exact-count level, and the fused raw train step is exercised end to end on
the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.ops import train_pipeline as tp

pytestmark = pytest.mark.slow  # multi-minute: full CI tier only (pytest --runslow)


def test_sample_pixels_device_exact_counts():
    rng = np.random.RandomState(0)
    label = rng.randint(0, 4, size=(64, 96)).astype(np.int32)
    num = 100
    out = np.asarray(tp.sample_pixels_device(
        jnp.asarray(label), jax.random.PRNGKey(1), num))
    # reference semantics (tabletop_object.py:241-254): per cluster keep
    # min(count, num) pixels, everything else -1
    for k in range(4):
        total = int((label == k).sum())
        kept = int((out == k).sum())
        assert kept == min(total, num), (k, kept, total)
    # kept pixels keep their original label
    sel = out >= 0
    np.testing.assert_array_equal(out[sel], label[sel])


def test_sample_pixels_device_small_clusters_kept_whole():
    label = np.zeros((32, 32), np.int32)
    label[:3, :3] = 1  # 9 pixels < num
    out = np.asarray(tp.sample_pixels_device(
        jnp.asarray(label), jax.random.PRNGKey(0), 50))
    assert int((out == 1).sum()) == 9


def test_ellipse_dropout_device():
    depth = np.full((96, 128), 1.0, np.float32)
    depth[:8] = 0.0  # some invalid rows
    out = np.asarray(tp.dropout_random_ellipses_device(
        jnp.asarray(depth), jax.random.PRNGKey(3)))
    assert out.shape == depth.shape
    # dropouts only ever zero pixels, never add depth
    assert ((out == 0) | (out == depth)).all()
    # Poisson(10) ellipses of gamma(5,1) radii on a 96x128 image: some
    # dropout is overwhelmingly likely
    assert (out[8:] == 0).any()
    # invalid region stays invalid
    assert (out[:8] == 0).all()


def test_gp_noise_device_masked():
    depth = np.zeros((32, 64), np.float32)
    depth[16:] = 1.0
    xyz = np.ones((32, 64, 3), np.float32)
    out = np.asarray(tp.add_gp_noise_to_xyz_device(
        jnp.asarray(xyz), jnp.asarray(depth), jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out[:16], xyz[:16])  # invalid: untouched
    assert not np.array_equal(out[16:], xyz[16:])
    assert np.abs(out - xyz).max() < 0.05  # scale 0.005 noise


def test_device_augment_shapes_and_modalities():
    for input_type in ("RGBD", "COLOR", "DEPTH"):
        cfg = Config.from_dict({"INPUT": input_type, "MODE": "TRAIN",
                                "TRAIN": {"EMBEDDING_SAMPLING": True,
                                          "EMBEDDING_SAMPLING_NUM": 200}})
        aug = tp.make_device_augment(cfg, fx=320.0, fy=320.0, px=64.0,
                                     py=48.0)
        b, h, w = 2, 96, 128
        rng = np.random.RandomState(0)
        bgr = rng.randint(0, 255, (b, h, w, 3), np.uint8)
        depth_mm = rng.randint(500, 1500, (b, h, w)).astype(np.uint16)
        label = rng.randint(0, 3, (b, h, w)).astype(np.uint8)
        img, xyz, lab = jax.jit(aug)(bgr, depth_mm, label,
                                     jax.random.PRNGKey(0))
        assert lab.shape == (b, h, w) and lab.dtype == jnp.int32
        if input_type == "DEPTH":
            assert img is None
        else:
            assert img.shape == (b, h, w, 3)
            assert float(jnp.abs(img).max()) <= 1.0
        if input_type == "COLOR":
            assert xyz is None
        else:
            assert xyz.shape == (b, h, w, 3)
            # z channel ~ depth in meters
            assert 0.4 < float(xyz[..., 2].mean()) < 1.6


def test_raw_train_step_on_mesh():
    """Fused raw step runs end to end, sharded over the 8-device mesh."""
    from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                         make_train_step_raw)
    from unseenobjectclustering_tpu.parallel import (make_mesh, replicate,
                                                     shard_batch)

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TRAIN",
                            "TRAIN": {"NUM_UNITS": 8,
                                      "EMBEDDING_SAMPLING": True,
                                      "EMBEDDING_SAMPLING_NUM": 64}})
    mesh = make_mesh()
    h = w = 32
    state = replicate(create_train_state(
        cfg, network_name="seg_resnet34_8s_embedding", height=h, width=w),
        mesh)
    step = make_train_step_raw(cfg, fx=32.0, fy=32.0, px=16.0, py=16.0,
                               max_k=8)
    rng = np.random.RandomState(3)
    b = 8
    bgr = rng.randint(0, 255, (b, h, w, 3), np.uint8)
    depth_mm = rng.randint(500, 1500, (b, h, w)).astype(np.uint16)
    label = rng.randint(0, 4, (b, h, w)).astype(np.uint8)
    bgr, depth_mm, label = shard_batch((bgr, depth_mm, label), mesh)
    state, metrics = step(state, bgr, depth_mm, label, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, bgr, depth_mm, label, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_raw_mode_dataset_contract():
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TRAIN"})
    ds = SyntheticTabletopDataset("train", cfg, height=64, width=96, size=4,
                                  raw=True)
    s = ds[0]
    assert s["bgr"].dtype == np.uint8 and s["bgr"].shape == (64, 96, 3)
    assert s["depth_mm"].dtype == np.uint16
    assert s["label_raw"].dtype == np.uint8
    # raw samples are augmentation-free: identical across epochs
    ds.set_epoch(1)
    s2 = ds[0]
    np.testing.assert_array_equal(s["bgr"], s2["bgr"])


def test_depth_artifacts_device_matches_host_contract():
    """Device twin of add_realsense_artifacts: drops only, plausible hole
    fraction, jittable on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unseenobjectclustering_tpu.ops.train_pipeline import (
        add_depth_artifacts_device)

    depth = np.full((120, 160), 1.0, np.float32)
    depth[40:80, 50:100] = 0.6
    out = np.asarray(jax.jit(add_depth_artifacts_device)(
        jnp.asarray(depth), jax.random.PRNGKey(0)))
    changed = out != depth
    assert (out[changed] == 0).all()
    assert (out > 0).mean() > 0.4
    # across seeds, SOME seed produces edge shadows adjacent to the box
    hit_edge = False
    for s in range(6):
        o = np.asarray(add_depth_artifacts_device(
            jnp.asarray(depth), jax.random.PRNGKey(s)))
        band = o[40:80, 36:50] == 0      # left of the box edge
        band_r = o[40:80, 100:114] == 0  # right of it
        hit_edge = hit_edge or band.any() or band_r.any()
    assert hit_edge


def test_device_augment_honors_depth_artifacts_flag():
    """cfg.TRAIN.DEPTH_ARTIFACTS=False must keep the round-4 augmentation
    unchanged; True must produce extra structured holes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.ops.train_pipeline import (
        make_device_augment)

    rng = np.random.RandomState(5)
    bgr = jnp.asarray(rng.randint(0, 255, (1, 64, 96, 3)), jnp.uint8)
    dep = jnp.asarray(np.full((1, 64, 96), 900, np.uint16))
    lab = jnp.asarray(rng.randint(0, 3, (1, 64, 96)), jnp.uint8)
    kw = dict(fx=80.0, fy=80.0, px=48.0, py=32.0)

    cfg_off = Config.from_dict({"INPUT": "RGBD", "MODE": "TRAIN"})
    cfg_on = Config.from_dict({"INPUT": "RGBD", "MODE": "TRAIN",
                               "TRAIN": {"DEPTH_ARTIFACTS": True}})
    key = jax.random.PRNGKey(7)
    _, xyz_off, _ = make_device_augment(cfg_off, **kw)(bgr, dep, lab, key)
    _, xyz_on, _ = make_device_augment(cfg_on, **kw)(bgr, dep, lab, key)
    holes_off = float((np.asarray(xyz_off)[..., 2] == 0).mean())
    holes_on = float((np.asarray(xyz_on)[..., 2] == 0).mean())
    assert holes_on > holes_off
