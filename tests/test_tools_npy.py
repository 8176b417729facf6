"""tools/test_npy.py parity: the two reference dump flavors decode with
the right depth SCALE (reference tools/test_npy.py:105-122 — plain dumps
hold uint16 millimeters, debug_info dumps hold meters + a 3x3 intrinsics
matrix).  A round-2 review found the mm->m conversion missing, which
scaled every point cloud by 1000x; this locks the fix, and the end-to-end
CLI run covers the -label.npy output path.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))


def test_read_npy_sample_plain_mm():
    import tempfile

    from test_npy import read_npy_sample

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    depth_mm = (500 + 1500 * rng.rand(48, 64)).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.npy")
        np.save(p, {"rgb": rgb, "depth": depth_mm})
        got_rgb, depth_m, (fx, fy, px, py) = read_npy_sample(p)
    np.testing.assert_array_equal(got_rgb, rgb)
    # millimeters -> meters (the 1000x-scale regression this guards)
    np.testing.assert_allclose(depth_m, depth_mm.astype(np.float32) / 1000.0)
    assert depth_m.max() < 3.0
    assert (px, py) == (32.0, 24.0)


def test_read_npy_sample_debug_info():
    import tempfile

    from test_npy import read_npy_sample

    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    depth_m_in = (0.5 + rng.rand(48, 64)).astype(np.float32)
    k = np.array([[600.0, 0, 31.5], [0, 601.0, 23.5], [0, 0, 1]])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.npy")
        np.save(p, {"debug_info": {"rgb": rgb, "depth_image": depth_m_in,
                                   "intrinsics": k}})
        got_rgb, depth_m, intr = read_npy_sample(p)
    np.testing.assert_array_equal(got_rgb, rgb)
    # already meters: passed through unscaled
    np.testing.assert_allclose(depth_m, depth_m_in)
    assert intr == (600.0, 601.0, 31.5, 23.5)


def test_cli_end_to_end(tmp_path, monkeypatch):
    """Full CLI run on a tiny dump: writes a -label.npy with the frame's
    shape (random-init weights; only the mechanics are under test)."""
    import test_npy as mod

    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    depth_mm = (500 + 1500 * rng.rand(48, 64)).astype(np.uint16)
    np.save(tmp_path / "frame.npy", {"rgb": rgb, "depth": depth_mm})

    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "test_npy.py", "--imgdir", str(tmp_path), "--outdir", str(out)])
    mod.main()
    labels = np.load(out / "frame-label.npy")
    assert labels.shape == (48, 64)
    assert labels.dtype.kind in "iu"
