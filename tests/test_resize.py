"""Resize ops vs torch oracles (the reference's upsample semantics:
bilinear align_corners=True, legacy nearest)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from unseenobjectclustering_tpu.ops.resize import (
    resize_nearest_legacy, resize_nearest_legacy_nhwc, upsample_bilinear)


@pytest.mark.parametrize("in_hw,out_hw", [((60, 80), (480, 640)),
                                          ((28, 28), (224, 224)),
                                          ((13, 17), (100, 50)),
                                          ((5, 5), (5, 5))])
def test_upsample_bilinear_matches_torch_align_corners(rng, in_hw, out_hw):
    x = rng.rand(2, *in_hw, 3).astype(np.float32)  # NHWC
    got = np.asarray(upsample_bilinear(x, out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((50, 70), (224, 224)),
                                          ((224, 224), (37, 55))])
def test_nearest_legacy_matches_torch(rng, in_hw, out_hw):
    x = (rng.rand(*in_hw) * 10).astype(np.float32)
    got = np.asarray(resize_nearest_legacy(x, out_hw))
    xt = torch.from_numpy(x)[None, None]
    want = F.interpolate(xt, size=out_hw, mode="nearest")[0, 0].numpy()
    np.testing.assert_array_equal(got, want)


def test_nearest_nhwc(rng):
    x = rng.rand(33, 44, 3).astype(np.float32)
    got = np.asarray(resize_nearest_legacy_nhwc(x, (224, 224)))
    xt = torch.from_numpy(x).permute(2, 0, 1)[None]
    want = F.interpolate(xt, size=(224, 224),
                         mode="nearest")[0].permute(1, 2, 0).numpy()
    np.testing.assert_array_equal(got, want)
