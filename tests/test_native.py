"""Native C++ IO library tests: build, and equivalence vs pure-Python."""

import numpy as np
import pytest

from unseenobjectclustering_tpu.data import native
from unseenobjectclustering_tpu.data.pcd import _lzf_decompress_py

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def lzf_compress_literals(data: bytes) -> bytes:
    """Literal-only LZF encoding (valid input for any decompressor)."""
    out = b""
    for i in range(0, len(data), 32):
        chunk = data[i:i + 32]
        out += bytes([len(chunk) - 1]) + chunk
    return out


def test_lzf_native_matches_python():
    rng = np.random.RandomState(0)
    raw = rng.bytes(10_000)
    comp = lzf_compress_literals(raw)
    assert native.lzf_decompress(comp, len(raw)) == raw
    assert _lzf_decompress_py(comp, len(raw)) == raw


def test_lzf_backrefs():
    # 'AB' + backref len 3 -> 'ABABA' (overlapping copy)
    comp = bytes([1, 65, 66, 32, 1])
    assert native.lzf_decompress(comp, 5) == b"ABABA"
    # malformed stream raises
    with pytest.raises(ValueError):
        native.lzf_decompress(bytes([255, 0]), 4)


def test_extract_strided():
    rng = np.random.RandomState(1)
    n, stride, offset = 100, 16, 4
    raw = bytearray(rng.bytes(n * stride))
    want = rng.randn(n).astype(np.float32)
    for p in range(n):
        raw[p * stride + offset:p * stride + offset + 4] = want[p].tobytes()
    got = native.extract_strided_f32(bytes(raw), n, stride, offset)
    np.testing.assert_array_equal(got, want)


def test_nearest_paste_matches_numpy():
    from unseenobjectclustering_tpu.ops.resize import _nearest_index_legacy

    rng = np.random.RandomState(2)
    src = rng.randint(0, 4, (16, 16)).astype(np.int32)
    dst_native = rng.randint(0, 3, (64, 80)).astype(np.int32)
    dst_numpy = dst_native.copy()
    region_n = dst_native[5:40, 7:50]
    region_p = dst_numpy[5:40, 7:50]

    assert native.nearest_paste_nonzero(src, region_n)

    iy = _nearest_index_legacy(src.shape[0], region_p.shape[0])
    ix = _nearest_index_legacy(src.shape[1], region_p.shape[1])
    resized = src[iy][:, ix]
    nz = resized > 0
    region_p[nz] = resized[nz]

    np.testing.assert_array_equal(dst_native, dst_numpy)


def test_pcd_binary_uses_native(tmp_path):
    from unseenobjectclustering_tpu.data.pcd import load_pcd_xyz, save_pcd_xyz

    xyz = np.random.RandomState(3).randn(480 * 64, 3).astype(np.float32)
    p = tmp_path / "big.pcd"
    save_pcd_xyz(p, xyz, binary=True)
    got = load_pcd_xyz(p)
    np.testing.assert_array_equal(got, xyz)
