"""On-device augmentation vs OpenCV oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from unseenobjectclustering_tpu.ops.augment import (_bgr_to_hls, _hls_to_bgr,
                                                    add_noise_device,
                                                    chromatic_transform_device)


def test_bgr_hls_roundtrip_matches_cv2():
    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2HLS_FULL)  # H in 0..255 scale
    want_std = cv2.cvtColor(bgr, cv2.COLOR_BGR2HLS)   # H in 0..180 scale
    h, l, s = _bgr_to_hls(jnp.asarray(bgr, jnp.float32))
    # cv2 uint8 output quantizes; compare with generous tolerance
    np.testing.assert_allclose(np.asarray(l), want_std[..., 1].astype(float),
                               atol=1.0)
    np.testing.assert_allclose(np.asarray(s), want_std[..., 2].astype(float),
                               atol=2.0)
    dh = np.abs(np.asarray(h) - want_std[..., 0].astype(float))
    dh = np.minimum(dh, 180 - dh)  # circular
    assert np.percentile(dh, 99) <= 2.0

    # roundtrip back to BGR
    back = np.asarray(_hls_to_bgr(h, l, s))
    np.testing.assert_allclose(back, bgr.astype(float), atol=2.0)


def test_chromatic_device_changes_image_but_preserves_range():
    rng = np.random.RandomState(1)
    bgr = rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
    out = np.asarray(chromatic_transform_device(jnp.asarray(bgr),
                                                jax.random.PRNGKey(3)))
    assert out.shape == bgr.shape
    assert out.min() >= 0 and out.max() <= 255
    assert np.abs(out - bgr).mean() > 1.0  # jitter applied


def test_add_noise_device_modes():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.float32)
    # different keys hit both branches eventually; just check validity
    for i in range(5):
        out = np.asarray(add_noise_device(jnp.asarray(img),
                                          jax.random.PRNGKey(i)))
        assert out.shape == img.shape
        assert np.isfinite(out).all()
