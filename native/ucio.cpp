// Native IO hot paths for unseenobjectclustering_tpu.
//
// The reference relies on the python-pcl C++ binding for PCD loading
// (lib/datasets/ocid_object.py:104-112); this library is our equivalent
// native component: LZF decompression (the PCL binary_compressed codec) and
// strided field extraction run ~100x faster than the pure-Python fallbacks
// in data/pcd.py.  Exposed via ctypes (see data/native.py); no pybind11
// dependency.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// LZF decompression (PCL-compatible).  Returns the number of bytes written,
// or -1 on malformed input / output overflow.
long ucio_lzf_decompress(const uint8_t* in, long in_len,
                         uint8_t* out, long out_len) {
    long i = 0, o = 0;
    while (i < in_len) {
        uint32_t ctrl = in[i++];
        if (ctrl < 32) {  // literal run of ctrl+1 bytes
            long run = (long)ctrl + 1;
            if (i + run > in_len || o + run > out_len) return -1;
            std::memcpy(out + o, in + i, run);
            i += run;
            o += run;
        } else {          // back reference
            long len = ctrl >> 5;
            if (len == 7) {
                if (i >= in_len) return -1;
                len += in[i++];
            }
            if (i >= in_len) return -1;
            long ref = o - (long)((ctrl & 0x1f) << 8) - (long)in[i++] - 1;
            len += 2;
            if (ref < 0 || o + len > out_len) return -1;
            // overlapping copy must run byte-by-byte
            for (long k = 0; k < len; ++k) {
                out[o] = out[ref];
                ++o;
                ++ref;
            }
        }
    }
    return o;
}

// Gather a strided float32 field out of packed per-point PCD records:
// out[p] = *(float*)(raw + p*stride + offset).
void ucio_extract_strided_f32(const uint8_t* raw, long n_points, long stride,
                              long offset, float* out) {
    for (long p = 0; p < n_points; ++p) {
        std::memcpy(out + p, raw + p * stride + offset, sizeof(float));
    }
}

// Nearest-neighbor paste of a label crop into a region (the inner loop of
// the zoom-in paste-back; ops/roi.paste_back).  src is [sh x sw] int32;
// dst region is [dh x dw] with row stride dst_stride (in elements);
// nonzero src pixels overwrite.  Legacy torch nearest mapping:
// src_idx = floor(dst_idx * s / d).
void ucio_nearest_paste_nonzero(const int32_t* src, long sh, long sw,
                                int32_t* dst, long dh, long dw,
                                long dst_stride) {
    for (long y = 0; y < dh; ++y) {
        long sy = (long)((double)y * sh / dh);
        if (sy >= sh) sy = sh - 1;
        const int32_t* srow = src + sy * sw;
        int32_t* drow = dst + y * dst_stride;
        for (long x = 0; x < dw; ++x) {
            long sx = (long)((double)x * sw / dw);
            if (sx >= sw) sx = sw - 1;
            int32_t v = srow[sx];
            if (v > 0) drow[x] = v;
        }
    }
}

}  // extern "C"
