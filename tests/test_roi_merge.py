"""veto_and_order + paste_back must match the all-host match_label_crop
(the direct transcription of test_dataset.py:116-179, kept as oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.roi import (match_label_crop, paste_back,
                                                veto_and_order)


def make_case(seed, m=4, s=16, h=48, w=64, with_depth=True):
    rng = np.random.RandomState(seed)
    labels_crop = rng.randint(0, 5, size=(m, s, s)).astype(np.int32)
    mask_crops = (rng.rand(m, s, s) > 0.4).astype(np.float32)
    depth = None
    if with_depth:
        depth = np.zeros((m, s, s, 3), np.float32)
        depth[..., 2] = np.where(rng.rand(m, s, s) > 0.2,
                                 0.5 + rng.rand(m, s, s), 0.0)
        # distinct mean depths so the ordering is unambiguous
        depth[..., 2] += rng.permutation(m)[:, None, None] * 0.7
    valid = np.array([True] * (m - 1) + [False])
    rois = np.zeros((m, 4), np.int64)
    for i in range(m):
        x0 = rng.randint(0, w - 20)
        y0 = rng.randint(0, h - 20)
        rois[i] = (x0, y0, x0 + rng.randint(10, 19), y0 + rng.randint(10, 19))
    initial = np.zeros((h, w), np.int32)
    return labels_crop, mask_crops, depth, rois, valid, initial


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_depth", [True, False])
def test_device_merge_matches_host_oracle(seed, with_depth):
    labels_crop, mask_crops, depth, rois, valid, initial = make_case(
        seed, with_depth=with_depth)

    want, _ = match_label_crop(initial, labels_crop.copy(), mask_crops,
                               rois, depth, valid)

    lv, key = veto_and_order(
        jnp.asarray(labels_crop), jnp.asarray(mask_crops),
        jnp.asarray(depth[..., 2]) if with_depth else None,
        jnp.asarray(valid), max_labels=8)
    key = np.asarray(key)
    if not with_depth:
        x0, y0, x1, y1 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
        key = np.where(valid, ((y1 - y0 + 1) * (x1 - x0 + 1)).astype(
            np.float32), -np.inf)
    got = paste_back(initial, np.asarray(lv), key, rois, valid)

    np.testing.assert_array_equal(got, want)


def test_veto_semantics():
    # one crop, cluster 0 covers background (no overlap), cluster 1 inside
    labels_crop = np.zeros((1, 8, 8), np.int32)
    labels_crop[0, 2:6, 2:6] = 1
    mask = np.zeros((1, 8, 8), np.float32)
    mask[0, 2:6, 2:6] = 1.0
    lv, key = veto_and_order(jnp.asarray(labels_crop), jnp.asarray(mask),
                             None, jnp.asarray([True]), max_labels=4)
    lv = np.asarray(lv)
    assert (lv[0, 2:6, 2:6] == 1).all()      # surviving cluster
    assert (lv[0, 0, :] == -1).all()         # background cluster vetoed


def test_veto_wide_label_space_uses_int16():
    """max_labels > 128 (NUM_SEEDS > 127) must widen the output dtype:
    int8 would wrap ids above 127 into negatives that paste_back treats as
    distinct real instances."""
    labels_crop = np.zeros((1, 8, 8), np.int32)
    labels_crop[0, 2:6, 2:6] = 150          # id beyond int8 range
    mask = np.zeros((1, 8, 8), np.float32)
    mask[0, 2:6, 2:6] = 1.0
    lv, _ = veto_and_order(jnp.asarray(labels_crop), jnp.asarray(mask),
                           None, jnp.asarray([True]), max_labels=200)
    lv = np.asarray(lv)
    assert lv.dtype == np.int16
    assert (lv[0, 2:6, 2:6] == 150).all()    # id preserved, not wrapped
    # the compact default keeps the halved host fetch
    lv8, _ = veto_and_order(jnp.asarray(np.clip(labels_crop, 0, 100)),
                            jnp.asarray(mask), None, jnp.asarray([True]),
                            max_labels=101)
    assert np.asarray(lv8).dtype == np.int8


def test_paste_back_refine_fallback():
    """cfg.CLUSTER.REFINE_FALLBACK: an all-vetoed crop keeps its stage-1
    instance mask (at its depth-order position) instead of vanishing —
    the reference veto (test_dataset.py:116-127) deletes such instances,
    which under sim-to-real shift erased whole real objects (demo frame
    000005 refined to F=0.000, docs/REAL_DEMO_EVAL.md)."""
    from unseenobjectclustering_tpu.ops.roi import paste_back

    h = w = 16
    dense = np.zeros((h, w), np.int32)
    dense[2:6, 2:6] = 1      # slot 0: will be all-vetoed
    dense[8:14, 8:14] = 2    # slot 1: zoom-in cluster survives
    s = 4
    labels_veto = np.full((2, s, s), -1, np.int8)
    labels_veto[1, 1:3, 1:3] = 0            # surviving cluster in slot 1
    rois = np.array([[2, 2, 5, 5], [8, 8, 13, 13]], np.int32)
    order_key = np.array([2.0, 1.0], np.float32)   # slot 0 farther
    valid = np.array([True, True])

    # reference semantics (default): the all-vetoed instance is GONE
    ref = paste_back(dense, labels_veto, order_key, rois, valid)
    assert not (ref[2:6, 2:6] > 0).any()

    # fallback: stage-1 mask pasted unchanged, surviving crop unaffected
    fb = paste_back(dense, labels_veto, order_key, rois, valid,
                    fallback_labels=dense)
    assert (fb[2:6, 2:6] > 0).all()
    assert np.array_equal(fb[2:6, 2:6] > 0, dense[2:6, 2:6] > 0)
    assert (fb[8:14, 8:14] > 0).any()       # slot 1 paste still happened
    # distinct instance ids
    assert len(np.unique(fb)) == 3
