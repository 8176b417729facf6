"""Visualization utility tests (no display; Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from unseenobjectclustering_tpu.utils.visualization import (
    features_to_rgb, normalize_descriptor, segmentation_grid, xyz_to_rgb)
from unseenobjectclustering_tpu.utils.masks import (get_color_mask,
                                                    visualize_segmentation)


def test_normalize_descriptor_range():
    x = np.random.RandomState(0).randn(8, 8) * 7 + 3
    n = normalize_descriptor(x)
    assert n.min() == 0.0 and n.max() == 1.0
    stats = {"min": [0.0], "max": [2.0]}
    n2 = normalize_descriptor(np.full((4, 4, 1), 3.0), stats)
    assert (n2 == 1.0).all()  # clipped


def test_features_to_rgb():
    f = np.random.RandomState(1).rand(16, 16, 9).astype(np.float32)
    rgb = features_to_rgb(f)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8


def test_xyz_to_rgb():
    xyz = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    v = xyz_to_rgb(xyz)
    assert v.shape == (8, 8, 3) and v.dtype == np.uint8


def test_color_mask_and_overlay():
    labels = np.zeros((16, 16), np.int32)
    labels[4:10, 4:10] = 2
    cm = get_color_mask(labels)
    assert (cm[0, 0] == 0).all()           # background black
    assert (cm[5, 5] != 0).any()           # instance colored
    im = np.full((16, 16, 3), 128, np.uint8)
    out = visualize_segmentation(im, labels)
    assert out.shape == im.shape and out.dtype == np.uint8
    assert not np.array_equal(out[5, 5], im[5, 5])  # overlay applied


def test_segmentation_grid_panels():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (24, 32, 3), np.uint8)
    xyz = rng.rand(24, 32, 3).astype(np.float32)
    feats = rng.rand(24, 32, 6).astype(np.float32)
    labels = np.zeros((24, 32), np.int32)
    labels[4:12, 6:18] = 1
    fig = segmentation_grid(img, xyz, feats, labels, labels_refined=labels,
                            seed_indices=np.array([5, 100, 300]))
    assert len(fig.axes) >= 5
    import matplotlib.pyplot as plt
    plt.close(fig)
