"""Golden tests for preprocessing ops against pure-numpy reference formulas
(lib/datasets/tabletop_object.py:57-93, lib/utils/blob.py:48-71)."""

import numpy as np

from unseenobjectclustering_tpu.ops.preprocess import (
    camera_params_to_arrays, compute_xyz, focal_from_fov, normalize_bgr,
    pad_to_multiple, preprocess_rgbd, unpad)


def numpy_compute_xyz(depth, fx, fy, px, py):
    h, w = depth.shape
    idx = np.indices((h, w), dtype=np.float32).transpose(1, 2, 0)
    z = depth
    x = (idx[..., 1] - px) * z / fx
    y = (idx[..., 0] - py) * z / fy
    return np.stack([x, y, z], axis=-1)


def test_compute_xyz_matches_numpy(rng):
    depth = rng.rand(48, 64).astype(np.float32) * 2.0
    fx, fy, px, py = 612.9, 613.2, 32.5, 24.2
    got = np.asarray(compute_xyz(depth, fx, fy, px, py, height=48, width=64))
    want = numpy_compute_xyz(depth, fx, fy, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_focal_from_fov():
    # TOD synthetic camera: 640x480, fov 45 deg (tabletop_object.py:26-30)
    f = focal_from_fov(640, 480, 45.0, 0.01)
    # alpha = W / (2 * near * tan(fov/2) * AR); focal = near * alpha
    e = 1.0 / np.tan(np.radians(22.5))
    t = 0.01 / e
    r = t * (640 / 480)
    want = 0.01 * (640 / (2 * r))
    assert f == np.float32(want)


def test_normalize_bgr(rng):
    img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    means = np.array([102.9801, 115.9465, 122.7717], dtype=np.float32)
    got = np.asarray(normalize_bgr(img, means))
    want = img.astype(np.float32) / 255.0 - means / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_preprocess_rgbd_fused(rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    depth = rng.rand(48, 64).astype(np.float32)
    means = np.array([102.9801, 115.9465, 122.7717], dtype=np.float32)
    im, xyz = preprocess_rgbd(img, depth, means, 612.9, 613.2, 32.0, 24.0,
                              height=48, width=64)
    np.testing.assert_allclose(np.asarray(im),
                               img.astype(np.float32) / 255 - means / 255,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xyz)[..., 2], depth, atol=1e-7)


def test_pad_unpad_roundtrip(rng):
    im = rng.rand(47, 61, 3).astype(np.float32)
    padded = pad_to_multiple(im, 16)
    assert padded.shape == (48, 64, 3)
    np.testing.assert_array_equal(unpad(padded, (47, 61)), im)
    im2 = rng.rand(48, 64).astype(np.float32)
    assert pad_to_multiple(im2, 16).shape == (48, 64)


def test_camera_params_real_and_synthetic():
    real = {"fx": 612.9, "fy": 613.1, "x_offset": 322.5, "y_offset": 248.1}
    assert camera_params_to_arrays(real) == (612.9, 613.1, 322.5, 248.1)
    syn = {"img_width": 640, "img_height": 480, "fov": 45, "near": 0.01,
           "far": 100}
    fx, fy, px, py = camera_params_to_arrays(syn)
    assert fx == fy == focal_from_fov(640, 480, 45, 0.01)
    assert (px, py) == (320.0, 240.0)
