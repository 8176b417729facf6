"""On-device RGB-D preprocessing.

The reference does per-sample numpy preprocessing on CPU dataloader workers
(depth mm->m, pinhole backprojection to XYZ, BGR/255 - pixel_mean;
lib/datasets/tabletop_object.py:57-93,303-306 and tools/test_images.py:96-135).
Here the hot path is one jitted host-to-device function so a 640x480 RGB-D
frame is normalized and backprojected on the TPU.

Layout note: this framework is NHWC end to end (TPU-native); the reference is
NCHW.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


def focal_from_fov(img_width: int, img_height: int, fov_deg: float,
                   near: float) -> float:
    """Focal length of the synthetic TOD frustum camera.

    Parity with lib/datasets/tabletop_object.py:71-78 (fov is the vertical
    field of view in degrees).
    """
    aspect_ratio = img_width / img_height
    e = 1.0 / np.tan(np.radians(fov_deg / 2.0))
    t = near / e
    r = t * aspect_ratio
    alpha = img_width / (2.0 * r)  # pixels per meter
    return float(near * alpha)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def compute_xyz(depth_m: jax.Array, fx: jax.Array, fy: jax.Array,
                px: jax.Array, py: jax.Array, *, height: int,
                width: int) -> jax.Array:
    """Backproject a depth map (meters) to an ordered XYZ point cloud.

    x = (u - px) * z / fx ; y = (v - py) * z / fy — parity with
    lib/datasets/tabletop_object.py:87-93.

    Args:
      depth_m: [H, W] depth in meters.
    Returns:
      [H, W, 3] float32 XYZ image.
    """
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    z = depth_m.astype(jnp.float32)
    x = (u - px) * z / fx
    y = (v - py) * z / fy
    return jnp.stack([x, y, z], axis=-1)


@jax.jit
def normalize_bgr(image_bgr_u8: jax.Array, pixel_means: jax.Array) -> jax.Array:
    """BGR uint8 image -> float32 (x/255 - mean) normalization.

    Parity with lib/datasets/tabletop_object.py:303-305 (the reference keeps
    OpenCV's BGR channel order; the pretrained checkpoints expect it).

    Args:
      image_bgr_u8: [..., H, W, 3] BGR image, uint8 or float in 0..255.
      pixel_means: [3] BGR means in 0..255 (cfg.PIXEL_MEANS).
    Returns:
      [..., H, W, 3] float32 normalized image (NHWC).
    """
    img = image_bgr_u8.astype(jnp.float32) / 255.0
    return img - pixel_means.astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("height", "width"))
def preprocess_rgbd(image_bgr_u8: jax.Array, depth_m: jax.Array,
                    pixel_means: jax.Array, fx: jax.Array, fy: jax.Array,
                    px: jax.Array, py: jax.Array, *, height: int,
                    width: int) -> tuple[jax.Array, jax.Array]:
    """One fused host->device step: normalize RGB + backproject depth.

    Returns (image [H,W,3] float32 NHWC, xyz [H,W,3] float32).
    """
    image = normalize_bgr(image_bgr_u8, pixel_means)
    xyz = compute_xyz(depth_m, fx, fy, px, py, height=height, width=width)
    return image, xyz


def pad_to_multiple(im: np.ndarray, factor: int, value: float = 0.0) -> np.ndarray:
    """Pad bottom/right so H and W are multiples of `factor`.

    Parity with lib/utils/blob.py:48-58 (host-side; used at data-loading time
    for real camera streams whose sizes aren't multiples of 16).
    """
    h, w = im.shape[:2]
    ph = int(np.ceil(h / float(factor)) * factor - h)
    pw = int(np.ceil(w / float(factor)) * factor - w)
    if im.ndim == 3:
        return np.pad(im, ((0, ph), (0, pw), (0, 0)), constant_values=value)
    return np.pad(im, ((0, ph), (0, pw)), constant_values=value)


def unpad(im: np.ndarray, orig_hw: tuple[int, int]) -> np.ndarray:
    """Inverse of pad_to_multiple; crops back to the original (H, W).

    (The reference's unpad_im, lib/utils/blob.py:61-71, recomputes the pad
    from the padded shape — a no-op; we take the original size explicitly.)
    """
    h, w = orig_hw
    return im[:h, :w] if im.ndim == 2 else im[:h, :w, :]


def camera_params_to_arrays(params: Mapping[str, float]) -> tuple[float, float, float, float]:
    """Extract (fx, fy, px, py) from a camera_params.json-style dict, falling
    back to the synthetic-frustum model (tabletop_object.py:68-86)."""
    if "fx" in params and "fy" in params:
        fx, fy = float(params["fx"]), float(params["fy"])
    else:
        f = focal_from_fov(int(params["img_width"]), int(params["img_height"]),
                           float(params["fov"]), float(params["near"]))
        fx = fy = f
    if "x_offset" in params and "y_offset" in params:
        px, py = float(params["x_offset"]), float(params["y_offset"])
    else:
        px = params["img_width"] / 2.0
        py = params["img_height"] / 2.0
    return fx, fy, px, py
