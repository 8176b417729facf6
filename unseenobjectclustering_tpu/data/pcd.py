"""Minimal PCD (Point Cloud Data) reader.

Replaces the reference's `python-pcl` binding (`pcl.load(...).to_array()`,
lib/datasets/ocid_object.py:104-112, lib/datasets/osd_object.py:94-100) with
a dependency-free parser for the PCD v0.7 format: ascii, binary, and
binary_compressed (LZF) encodings.

Only the x/y/z float32 fields are extracted — that is all the pipeline
consumes (the reference's `to_array()` on XYZ[RGB] clouds likewise yields
[N, 3]).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_HEADER_FIELDS = ("VERSION", "FIELDS", "SIZE", "TYPE", "COUNT", "WIDTH",
                  "HEIGHT", "VIEWPOINT", "POINTS", "DATA")


def _parse_header(f) -> dict:
    header: dict = {}
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PCD header")
        line = line.decode("ascii", errors="replace").strip()
        if not line or line.startswith("#"):
            continue
        key, _, rest = line.partition(" ")
        key = key.upper()
        if key in _HEADER_FIELDS:
            header[key] = rest.split()
        if key == "DATA":
            header["DATA"] = rest.strip()
            break
    for req in ("FIELDS", "SIZE", "TYPE", "COUNT", "POINTS", "DATA"):
        if req not in header:
            raise ValueError(f"PCD header missing {req}")
    return header


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    """LZF decompression (the PCL binary_compressed codec) — native C++ fast
    path (native/ucio.cpp) with this pure-python fallback."""
    from unseenobjectclustering_tpu.data import native

    fast = native.lzf_decompress(data, expected_size)
    if fast is not None:
        return fast
    return _lzf_decompress_py(data, expected_size)


def _lzf_decompress_py(data: bytes, expected_size: int) -> bytes:
    """Pure-python LZF decompression."""
    out = bytearray(expected_size)
    i, o, n = 0, 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            length = ctrl + 1
            out[o:o + length] = data[i:i + length]
            i += length
            o += length
        else:          # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            length += 2
            for _ in range(length):  # may overlap; byte-by-byte copy
                out[o] = out[ref]
                o += 1
                ref += 1
    return bytes(out[:o])


def lzf_compress(data: bytes) -> bytes:
    """LZF compression (the PCL binary_compressed codec's encoder side).

    Standard LZF format: control bytes < 32 start a literal run of ctrl+1
    bytes; otherwise a back-reference of (ctrl >> 5) + 2 bytes (7 -> +ext
    byte) at offset ((ctrl & 0x1F) << 8 | next) + 1.  Used to WRITE
    reference-format OCID/OSD-style fixtures (the real datasets ship
    binary_compressed PCDs, lib/datasets/ocid_object.py:104-112); round-trip
    safety is pinned against both decompressors in tests/test_data.py.
    """
    n = len(data)
    out = bytearray()
    htab: dict[bytes, int] = {}
    i = 0
    lit = 0  # start of the pending literal run

    def flush(end: int) -> None:
        s = lit
        while s < end:
            run = min(32, end - s)
            out.append(run - 1)
            out.extend(data[s:s + run])
            s += run

    while i < n - 2:
        key = data[i:i + 3]
        ref = htab.get(key, -1)
        htab[key] = i
        off = i - ref - 1
        if ref >= 0 and off < 8192:
            max_len = min(n - i, 264)  # 2 + 7 + 255
            length = 3
            while length < max_len and data[ref + length] == data[i + length]:
                length += 1
            flush(i)
            enc = length - 2
            if enc < 7:
                out.append((enc << 5) | (off >> 8))
            else:
                out.append((7 << 5) | (off >> 8))
                out.append(enc - 7)
            out.append(off & 0xFF)
            i += length
            lit = i
        else:
            i += 1
    flush(n)
    return bytes(out)


def _numpy_dtype(type_char: str, size: int):
    return np.dtype({"F": f"<f{size}", "I": f"<i{size}",
                     "U": f"<u{size}"}[type_char])


def load_pcd_xyz(path: str | os.PathLike) -> np.ndarray:
    """Read a PCD file and return its x, y, z fields as [N, 3] float32.

    NaNs are preserved (callers zero them, matching
    lib/datasets/ocid_object.py:106).
    """
    with open(path, "rb") as f:
        header = _parse_header(f)
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        points = int(header["POINTS"][0])
        data_kind = header["DATA"].lower()

        # per-point record layout
        offsets, offset = [], 0
        for sz, cnt in zip(sizes, counts):
            offsets.append(offset)
            offset += sz * cnt
        point_size = offset

        def field_slice(name: str):
            i = fields.index(name)
            return offsets[i], sizes[i], types[i]

        if data_kind == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, ndmin=2)
            cols = []
            col = 0
            col_index = {}
            for name, cnt in zip(fields, counts):
                col_index[name] = col
                col += cnt
            for name in ("x", "y", "z"):
                cols.append(rows[:, col_index[name]])
            return np.stack(cols, axis=1).astype(np.float32)

        if data_kind == "binary":
            from unseenobjectclustering_tpu.data import native

            raw = f.read(point_size * points)
            out = np.empty((points, 3), np.float32)
            for j, name in enumerate(("x", "y", "z")):
                off, sz, tc = field_slice(name)
                if tc == "F" and sz == 4:
                    col = native.extract_strided_f32(raw, points, point_size,
                                                     off)
                    if col is not None:
                        out[:, j] = col
                        continue
                # strided view over the packed per-point records
                arr = np.ndarray((points,), dtype=_numpy_dtype(tc, sz),
                                 buffer=raw, offset=off,
                                 strides=(point_size,))
                out[:, j] = arr.astype(np.float32)
            return out

        if data_kind == "binary_compressed":
            comp_size, uncomp_size = struct.unpack("<II", f.read(8))
            raw = lzf_decompress(f.read(comp_size), uncomp_size)
            # compressed PCDs store fields contiguously (SoA), not interleaved
            out = np.empty((points, 3), np.float32)
            field_off = 0
            for name, sz, tc, cnt in zip(fields, sizes, types, counts):
                n_bytes = sz * cnt * points
                if name in ("x", "y", "z"):
                    arr = np.frombuffer(raw, dtype=_numpy_dtype(tc, sz),
                                        count=points, offset=field_off)
                    out[:, ("x", "y", "z").index(name)] = arr.astype(
                        np.float32)
                field_off += n_bytes
            return out

    raise ValueError(f"unsupported PCD DATA encoding: {data_kind}")


def save_pcd_xyz(path: str | os.PathLike, xyz: np.ndarray,
                 width: int | None = None, height: int | None = None,
                 binary: bool = True, compressed: bool = False) -> None:
    """Write an [N, 3] (or [H, W, 3]) float32 cloud as a PCD file (testing
    and dataset-preparation helper).

    compressed=True writes DATA binary_compressed — LZF over the SoA field
    layout with the <compressed_size, uncompressed_size> prefix, the format
    the real OCID/OSD datasets ship."""
    if xyz.ndim == 3:
        height, width = xyz.shape[:2]
        xyz = xyz.reshape(-1, 3)
    n = xyz.shape[0]
    width = width or n
    height = height or 1
    kind = "binary_compressed" if compressed else (
        "binary" if binary else "ascii")
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {width}\nHEIGHT {height}\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA {kind}\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if compressed:
            # compressed PCDs store fields contiguously (SoA): all x, all
            # y, all z — the layout load_pcd_xyz's branch expects
            soa = np.ascontiguousarray(
                np.asarray(xyz, np.float32).T).tobytes()
            comp = lzf_compress(soa)
            f.write(struct.pack("<II", len(comp), len(soa)))
            f.write(comp)
        elif binary:
            f.write(np.ascontiguousarray(xyz, np.float32).tobytes())
        else:
            np.savetxt(f, xyz, fmt="%.8g")
