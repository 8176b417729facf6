"""Device crop-training augmentation (ops.train_pipeline.make_device_augment_crop)
vs the host reference semantics (tabletop_object.py:175-237 via
datasets.pad_crop_resize / process_label)."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data.datasets import process_label
from unseenobjectclustering_tpu.ops.train_pipeline import (
    _crop_bilinear_cv2, _crop_nearest_cv2, _dense_relabel,
    make_device_augment_crop)

pytestmark = pytest.mark.slow  # multi-minute tier (pytest --runslow)

H, W, S = 48, 64, 32


def test_dense_relabel_matches_process_label():
    rng = np.random.RandomState(0)
    label = rng.choice([0, 3, 7, 200], size=(16, 16)).astype(np.int32)
    got = np.asarray(_dense_relabel(jnp.asarray(label)))
    want = process_label(label)
    np.testing.assert_array_equal(got, want)
    # no background present: smallest id still maps to 0 (reference semantics)
    label2 = rng.choice([5, 9], size=(8, 8)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(_dense_relabel(jnp.asarray(label2))),
        process_label(label2))


def test_crop_nearest_matches_cv2():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 9, size=(H, W)).astype(np.int32)
    x0, y0, x1, y1 = 5, 7, 40, 30
    box = jnp.asarray([x0, y0, x1, y1], jnp.int32)
    got = np.asarray(_crop_nearest_cv2(jnp.asarray(img), box, S))
    want = cv2.resize(img[y0:y1 + 1, x0:x1 + 1].astype(np.float32), (S, S),
                      interpolation=cv2.INTER_NEAREST).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_crop_bilinear_matches_cv2():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(H, W, 3)).astype(np.float32)
    x0, y0, x1, y1 = 3, 2, 50, 40
    box = jnp.asarray([x0, y0, x1, y1], jnp.int32)
    got = np.asarray(_crop_bilinear_cv2(jnp.asarray(img), box, S))
    want = cv2.resize(img[y0:y1 + 1, x0:x1 + 1], (S, S),
                      interpolation=cv2.INTER_LINEAR)
    # cv2 runs fixed-point interpolation (11-bit coefficients)
    np.testing.assert_allclose(got, want, atol=0.75)


def _cfg():
    return Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"SYN_CROP": True, "SYN_CROP_SIZE": S,
                  "CHROMATIC": True, "ADD_NOISE": True,
                  "EMBEDDING_SAMPLING": True, "EMBEDDING_SAMPLING_NUM": 50},
    })


def test_device_augment_crop_end_to_end():
    cfg = _cfg()
    rng = np.random.RandomState(3)
    b = 3
    bgr = rng.randint(0, 256, size=(b, H, W, 3)).astype(np.uint8)
    depth = rng.randint(500, 1500, size=(b, H, W)).astype(np.uint16)
    label = np.zeros((b, H, W), np.uint8)
    for i in range(b):
        label[i, 10:24, 8:30] = 1
        label[i, 28:40, 35:55] = 2
    aug = make_device_augment_crop(cfg, fx=32.0, fy=32.0, px=W / 2,
                                   py=H / 2)
    img, xyz, lab = aug(jnp.asarray(bgr), jnp.asarray(depth),
                        jnp.asarray(label), jax.random.PRNGKey(0))
    assert img.shape == (b, S, S, 3) and xyz.shape == (b, S, S, 3)
    assert lab.shape == (b, S, S) and lab.dtype == jnp.int32
    lab_np = np.asarray(lab)
    # ids are dense after relabel; sampling marks dropped pixels -1
    assert lab_np.min() >= -1
    assert lab_np.max() >= 1         # the picked object is in the crop
    # per-cluster sampling cap holds
    for i in range(b):
        for c in range(1, lab_np[i].max() + 1):
            assert (lab_np[i] == c).sum() <= 50
    # the image is normalized (roughly zero-centered, not 0..255)
    assert abs(float(np.asarray(img).mean())) < 1.0


def test_device_augment_crop_object_centric():
    """The picked object must occupy a large fraction of its crop — the
    whole point of zoom-in training (tabletop_object.py:175-237)."""
    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"SYN_CROP": True, "SYN_CROP_SIZE": S,
                  "CHROMATIC": False, "ADD_NOISE": False,
                  "EMBEDDING_SAMPLING": False},
    })
    bgr = np.zeros((1, H, W, 3), np.uint8)
    depth = np.full((1, H, W), 1000, np.uint16)
    label = np.zeros((1, H, W), np.uint8)
    label[0, 20:28, 30:38] = 1   # small 8x8 object
    aug = make_device_augment_crop(cfg, fx=32.0, fy=32.0, px=W / 2,
                                   py=H / 2)
    _, _, lab = aug(jnp.asarray(bgr), jnp.asarray(depth),
                    jnp.asarray(label), jax.random.PRNGKey(1))
    frac = (np.asarray(lab)[0] == 1).mean()
    # an 8px object padded by >= 25px fills >= ~2% of the crop; without the
    # object-centric crop it covers 64/3072 = 2% of the full image but the
    # crop is never larger than ~58x58 here, so the fraction must be higher
    assert frac > 0.015
