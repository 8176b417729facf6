"""Resize primitives with PyTorch-legacy semantics, built TPU-first.

The reference upsamples logits with ``nn.functional.upsample_bilinear``
(= bilinear, align_corners=True; lib/networks/resnet_dilated.py:325) and masks
with ``F.upsample_nearest`` (floor index mapping; lib/fcn/test_dataset.py:106).
``jax.image.resize`` implements neither convention, so we build them directly.

For the fixed-ratio upsample in the backbone (60x80 -> 480x640) the
interpolation is expressed as two dense matmuls (out = W_h @ x @ W_w^T), which
XLA maps straight onto the MXU — far faster than gather-based sampling on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] interpolation matrix, align_corners=True.

    Output coordinate i samples input position i*(in-1)/(out-1).
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    if out_size == 1:
        # align_corners=True with a single output samples position 0
        w[0, 0] = 1.0
        return w
    pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = pos - lo
    w[np.arange(out_size), lo] = (1.0 - frac).astype(np.float32)
    w[np.arange(out_size), lo + 1] = frac.astype(np.float32)
    return w


@functools.lru_cache(maxsize=64)
def _nearest_index_legacy(in_size: int, out_size: int) -> np.ndarray:
    """[out_size] source indices with legacy torch nearest semantics:
    src = floor(dst * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def upsample_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True upsample via two MXU matmuls.

    Args:
      x: [..., H, W, C] (NHWC; leading batch dims allowed).
      out_hw: target (H_out, W_out).
    Returns:
      [..., H_out, W_out, C] in x.dtype.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_bilinear_matrix_align_corners(h_in, h_out), dtype=jnp.float32)
    ww = jnp.asarray(_bilinear_matrix_align_corners(w_in, w_out), dtype=jnp.float32)
    orig_dtype = x.dtype
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", ww, y)
    return y.astype(orig_dtype)


def resize_nearest_legacy(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize with legacy torch index mapping
    (src = floor(dst * in/out)); used for label masks.

    Args:
      x: [..., H, W] or [..., H, W, C].
    """
    h_in, w_in = (x.shape[-2], x.shape[-1])
    h_out, w_out = out_hw
    iy = jnp.asarray(_nearest_index_legacy(h_in, h_out))
    ix = jnp.asarray(_nearest_index_legacy(w_in, w_out))
    y = jnp.take(x, iy, axis=-2)
    y = jnp.take(y, ix, axis=-1)
    return y


def resize_nearest_legacy_nhwc(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize for [..., H, W, C] arrays."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    iy = jnp.asarray(_nearest_index_legacy(h_in, h_out))
    ix = jnp.asarray(_nearest_index_legacy(w_in, w_out))
    y = jnp.take(x, iy, axis=-3)
    y = jnp.take(y, ix, axis=-2)
    return y
