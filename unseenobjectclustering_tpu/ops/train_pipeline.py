"""TPU-native training input pipeline: the whole per-sample augmentation +
normalization stack as one compiled device function.

The reference runs its augmentation in CPU dataloader workers
(lib/datasets/tabletop_object.py:135-155,241-254,299-306).  This container's
host has ONE core, so the host path (~45 ms/sample at 480x640) starves the
chip; here the loader emits raw cached scenes (bgr uint8, depth_mm uint16,
label uint8) and everything else runs inside the training step's XLA program:

  depth:  multiplicative gamma noise (augmentation.py:58-71) ->
          random-ellipse dropout (augmentation.py:92-126; analytic
          rasterization instead of cv2.ellipse — same center/radius/angle
          distributions) -> mm->m -> pinhole backprojection
          (tabletop_object.py:57-93) -> GP additive XYZ noise
          (augmentation.py:73-90; the coarse noise field is upsampled
          bilinearly on the MXU instead of bicubically — it is iid noise,
          so the interpolant only shapes its spectrum slightly).
  rgb:    chromatic HLS jitter + Gaussian/motion-blur noise at 90%
          probability each (blob.py:74-129, tabletop_object.py:299-302)
          via ops.augment, then BGR/255 - pixel_mean.
  labels: per-cluster pixel sampling to EMBEDDING_SAMPLING_NUM, rest -1
          (tabletop_object.py:241-254) — one argsort groups pixels by
          (cluster, random) and a rank-within-group test keeps exactly N
          per cluster, replacing the reference's per-cluster permutation
          loop.

Everything is per-sample pure-functional and vmapped over the batch, so it
shards trivially over a data-parallel mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.augment import (add_noise_device,
                                                    chromatic_transform_device)
from unseenobjectclustering_tpu.ops.preprocess import compute_xyz
from unseenobjectclustering_tpu.ops.resize import upsample_bilinear

# DEFAULT_NOISE_PARAMS (data/augmentation.py / tabletop_object.py:23-55)
GAMMA_SHAPE = 1000.0
GAMMA_SCALE = 0.001
GAUSSIAN_SCALE = 0.005
GP_RESCALE = 4
ELLIPSE_DROPOUT_MEAN = 10.0
ELLIPSE_GAMMA_SHAPE = 5.0
ELLIPSE_GAMMA_SCALE = 1.0
# Poisson(10) rarely exceeds this; the tail is clamped (the reference has no
# cap, but P[X>24] < 5e-5 — a per-image distribution deviation far below the
# augmentation's own variance)
MAX_ELLIPSES = 24


def dropout_random_ellipses_device(depth_m: jax.Array,
                                   key: jax.Array) -> jax.Array:
    """Zero Poisson-many random ellipses over valid-depth pixels.

    Distribution parity with augmentation.py:92-126: centers uniform over
    depth>0 pixels, gamma(5,1) pixel radii, uniform rotation; the ellipse
    test is analytic per pixel instead of a cv2 raster.
    """
    h, w = depth_m.shape
    k_num, k_ctr, k_rad, k_ang = jax.random.split(key, 4)
    num = jnp.minimum(
        jax.random.poisson(k_num, ELLIPSE_DROPOUT_MEAN), MAX_ELLIPSES)
    live = jnp.arange(MAX_ELLIPSES) < num                       # [E]

    valid = (depth_m > 0).reshape(-1).astype(jnp.float32)       # [HW]
    probs = valid / jnp.maximum(valid.sum(), 1.0)
    centers = jax.random.choice(k_ctr, h * w, shape=(MAX_ELLIPSES,), p=probs)
    cy = (centers // w).astype(jnp.float32)                     # [E]
    cx = (centers % w).astype(jnp.float32)
    radii = jnp.rint(
        jax.random.gamma(k_rad, ELLIPSE_GAMMA_SHAPE,
                         shape=(MAX_ELLIPSES, 2)) * ELLIPSE_GAMMA_SCALE)
    rx = jnp.maximum(radii[:, 0], 0.5)                          # [E]
    ry = jnp.maximum(radii[:, 1], 0.5)
    theta = jax.random.uniform(k_ang, (MAX_ELLIPSES,), maxval=2 * jnp.pi)

    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    du = u[None] - cx[:, None, None]                            # [E, H, W]
    dv = v[None] - cy[:, None, None]
    ct, st = jnp.cos(theta)[:, None, None], jnp.sin(theta)[:, None, None]
    a = (du * ct + dv * st) / rx[:, None, None]
    b = (-du * st + dv * ct) / ry[:, None, None]
    inside = (a * a + b * b <= 1.0) & live[:, None, None]
    return jnp.where(inside.any(axis=0), 0.0, depth_m)


MAX_SHADOW_W = 12


def add_depth_artifacts_device(depth_m: jax.Array, key: jax.Array
                               ) -> jax.Array:
    """RealSense-style structured depth dropout (cfg.TRAIN.DEPTH_ARTIFACTS).

    Device twin of data/augmentation.add_realsense_artifacts (see its
    docstring for the demo-capture measurements this models): one-sided
    stereo-occlusion shadows at horizontal depth discontinuities, large
    low-frequency glossy blobs, and a ragged border band — each gated by
    its own per-frame coin (0.8 / 0.7 / 0.5).  The dynamic shadow width is
    a masked OR over MAX_SHADOW_W pre-rolled edge maps (no dynamic shapes
    under jit)."""
    h, w = depth_m.shape
    ks = jax.random.split(key, 10)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    # 1. stereo occlusion shadows
    dx = jnp.abs(jnp.diff(depth_m, axis=1, prepend=depth_m[:, :1]))
    edge = (dx > 0.04) & (depth_m > 0)
    width = jax.random.randint(ks[0], (), 2, MAX_SHADOW_W + 1)
    live = (jnp.arange(MAX_SHADOW_W) < width)[:, None, None]
    rolled_p = jnp.stack([jnp.roll(edge, k, axis=1) & (cols >= k)
                          for k in range(1, MAX_SHADOW_W + 1)])
    rolled_n = jnp.stack([jnp.roll(edge, -k, axis=1) & (cols < w - k)
                          for k in range(1, MAX_SHADOW_W + 1)])
    shadow = jnp.where(jax.random.bernoulli(ks[1]),
                       (rolled_p & live).any(0), (rolled_n & live).any(0))
    drop = shadow & jax.random.bernoulli(ks[2], 0.8)

    # 2. low-frequency glossy blobs
    field = upsample_bilinear(
        jax.random.uniform(ks[3], (h // 40 + 2, w // 40 + 2, 1)),
        (h, w))[..., 0]
    thr = jax.random.uniform(ks[4], (), minval=0.80, maxval=0.95)
    drop = drop | ((field > thr) & jax.random.bernoulli(ks[5], 0.7))

    # 3. ragged border band (left or right)
    base = jax.random.randint(ks[6], (), 8, 48).astype(jnp.float32)
    jag = upsample_bilinear(
        jax.random.uniform(ks[7], (h // 16 + 2, 1, 1)), (h, 1))[:, 0, 0]
    widths = base * (0.5 + jag)                                  # [h]
    colf = cols.astype(jnp.float32)
    band = jnp.where(jax.random.bernoulli(ks[8]),
                     colf < widths[:, None],
                     colf >= jnp.float32(w) - widths[:, None])
    drop = drop | (band & jax.random.bernoulli(ks[9], 0.5))
    return jnp.where(drop, 0.0, depth_m)


def add_gp_noise_to_xyz_device(xyz: jax.Array, depth_m: jax.Array,
                               key: jax.Array) -> jax.Array:
    """Coarse Gaussian field, upsampled, added where depth is valid
    (augmentation.py:73-90; bilinear instead of bicubic upsampling)."""
    h, w, c = xyz.shape
    field = GAUSSIAN_SCALE * jax.random.normal(
        key, (h // GP_RESCALE, w // GP_RESCALE, c))
    field = upsample_bilinear(field, (h, w))
    return jnp.where((depth_m > 0)[..., None], xyz + field, xyz)


def sample_pixels_device(label: jax.Array, key: jax.Array,
                         num: int) -> jax.Array:
    """Keep <= num random pixels per cluster, rest -> -1
    (tabletop_object.py:241-254).

    One argsort of (label + U[0,1)) orders pixels grouped by cluster with a
    random order inside each group; rank-within-group < num selects exactly
    the reference's per-cluster sample counts.
    """
    h, w = label.shape
    n = h * w
    flat = label.reshape(-1)
    r = jax.random.uniform(key, (n,))
    order = jnp.argsort(flat.astype(jnp.float32) + r)
    sorted_lab = flat[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lab[1:] != sorted_lab[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_new, iota, 0))
    keep_sorted = (iota - group_start) < num
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return jnp.where(keep, flat, -1).reshape(h, w).astype(jnp.int32)


def _dense_relabel(label: jax.Array, max_id: int = 255) -> jax.Array:
    """process_label on device: remap ids to {0..K-1} preserving order
    (tabletop_object.py:158-172; datasets.process_label).

    presence-rank instead of np.unique+searchsorted: rank[i] = #present ids
    < i, computed from a one-hot histogram (a bf16 one-hot einsum — TPU
    scatter-adds are ~3x slower for small-bin histograms).

    The final rank lookup is ALSO a one-hot matvec, not rank[flat]: the
    [H*W] gather costs ~2.7 ms/frame on v5e while the einsum costs ~0.04 ms
    (measured; the CLAUDE.md one-hot-over-gather rule).  Requires
    label >= 0 everywhere (true for every caller: raw scene labels and
    stage-1 cluster ids) and max_id <= 255 so ranks are exact in bf16
    (integers <= 256)."""
    assert max_id <= 255, "bf16 rank matvec requires max_id <= 255"
    flat = label.reshape(-1)
    onehot = (flat[:, None] == jnp.arange(max_id + 1)[None, :]
              ).astype(jnp.bfloat16)
    counts = jnp.einsum("nk->k", onehot)
    present = counts > 0
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1
    out = jnp.einsum("nk,k->n", onehot, rank.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).reshape(label.shape)


def _crop_bilinear_cv2(img: jax.Array, box: jax.Array, size: int
                       ) -> jax.Array:
    """img[y0:y1+1, x0:x1+1] bilinear-resized to [size, size, C] with
    cv2.resize's half-pixel-center convention (src = (dst+0.5)*scale - 0.5),
    as a coordinate-mapped gather under a static output shape.

    (ops.roi._roi_bilinear_crop is the inference-path variant with torch's
    align_corners=True convention, test_dataset.py:96-101; the TRAIN crop
    path goes through cv2.resize, tabletop_object.py:231-237.)"""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    ch = (y1 - y0 + 1).astype(jnp.float32)
    cw = (x1 - x0 + 1).astype(jnp.float32)
    d = jnp.arange(size, dtype=jnp.float32) + 0.5
    ys = y0.astype(jnp.float32) + d * ch / size - 0.5
    xs = x0.astype(jnp.float32) + d * cw / size - 0.5
    ys = jnp.clip(ys, y0.astype(jnp.float32),
                  y1.astype(jnp.float32))          # cv2 border replicate
    xs = jnp.clip(xs, x0.astype(jnp.float32), x1.astype(jnp.float32))
    y_lo = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y_hi = jnp.clip(y_lo + 1, 0, h - 1)
    x_lo = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x_hi = jnp.clip(x_lo + 1, 0, w - 1)
    wy = (ys - y_lo.astype(jnp.float32))[:, None, None]
    wx = (xs - x_lo.astype(jnp.float32))[None, :, None]
    g = lambda yy, xx: img[yy][:, xx]
    return ((1 - wy) * (1 - wx) * g(y_lo, x_lo)
            + (1 - wy) * wx * g(y_lo, x_hi)
            + wy * (1 - wx) * g(y_hi, x_lo)
            + wy * wx * g(y_hi, x_hi))


def _crop_nearest_cv2(img: jax.Array, box: jax.Array, size: int) -> jax.Array:
    """Crop + nearest resize, cv2 INTER_NEAREST convention
    (src = floor(dst * scale))."""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    ch = (y1 - y0 + 1).astype(jnp.float32)
    cw = (x1 - x0 + 1).astype(jnp.float32)
    d = jnp.arange(size, dtype=jnp.float32)
    ys = jnp.clip(y0 + jnp.floor(d * ch / size).astype(jnp.int32), 0, h - 1)
    xs = jnp.clip(x0 + jnp.floor(d * cw / size).astype(jnp.int32), 0, w - 1)
    return img[ys][:, xs]


def make_device_augment_crop(cfg, *, fx: float, fy: float, px: float,
                             py: float):
    """Object-centric crop-training augmentation (cfg.TRAIN.SYN_CROP) as one
    device function: the reference's pad_crop_resize + process_label +
    sample_pixels + chromatic/noise recipe (tabletop_object.py:175-237,
    241-254, 299-306) on device-resident raw scenes.

    Per sample: full-image depth augmentation + backprojection, pick a random
    instance, tight box -> squared -> random-percentage padding (pad
    >= 25 px), crop-resize to SYN_CROP_SIZE^2 (cv2 conventions: bilinear for
    BGR, nearest for label/XYZ), dense-relabel, per-cluster pixel sampling,
    RGB jitter + normalize.

    Deviation from the host path: the reference retries degenerate boxes
    (tabletop_object.py:175 `while True`); after the >= 25 px pad a box can
    only degenerate if the image is < 50 px wide, so the device path skips
    the retry.

    augment(bgr_u8 [B,H,W,3], depth_mm_u16 [B,H,W], label_u8 [B,H,W], key)
      -> (image [B,S,S,3], xyz [B,S,S,3], label [B,S,S])
    """
    input_type = str(cfg.INPUT)
    use_chromatic = bool(cfg.TRAIN.CHROMATIC)
    use_noise = bool(cfg.TRAIN.ADD_NOISE)
    use_artifacts = bool(cfg.TRAIN.DEPTH_ARTIFACTS)
    sampling_num = (int(cfg.TRAIN.EMBEDDING_SAMPLING_NUM)
                    if bool(cfg.TRAIN.EMBEDDING_SAMPLING) else 0)
    pixel_means = jnp.asarray(cfg.pixel_means, jnp.float32)
    size = int(cfg.TRAIN.SYN_CROP_SIZE)
    pct_min = float(cfg.TRAIN.min_padding_percentage)
    pct_max = float(cfg.TRAIN.max_padding_percentage)

    def one(bgr, depth_mm, label_u8, key):
        ks = jax.random.split(key, 11)
        h, w = depth_mm.shape
        label = label_u8.astype(jnp.int32)

        # full-image depth pipeline first (tabletop_object.py:135-155 runs
        # process_depth before pad_crop_resize)
        depth = depth_mm.astype(jnp.float32) / 1000.0
        mult = jax.random.gamma(ks[0], GAMMA_SHAPE) * GAMMA_SCALE
        depth = dropout_random_ellipses_device(depth * mult, ks[1])
        if use_artifacts:
            depth = add_depth_artifacts_device(depth, ks[10])
        xyz = compute_xyz(depth, fx, fy, px, py, height=h, width=w)
        xyz = add_gp_noise_to_xyz_device(xyz, depth, ks[2])

        # random instance -> tight box (tabletop_object.py:169-181)
        k = jnp.max(label)
        pick = 1 + jax.random.randint(ks[3], (), 0, jnp.maximum(k, 1))
        fg = jnp.where(k > 0, label == pick, label >= 0)
        ygrid = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xgrid = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        big = jnp.int32(1 << 30)
        x0 = jnp.min(jnp.where(fg, xgrid, big)).astype(jnp.float32)
        y0 = jnp.min(jnp.where(fg, ygrid, big)).astype(jnp.float32)
        x1 = jnp.max(jnp.where(fg, xgrid, -big)).astype(jnp.float32)
        y1 = jnp.max(jnp.where(fg, ygrid, -big)).astype(jnp.float32)

        # square around the center, then random-percentage pad (:175-188)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        xd, yd = x1 - x0, y1 - y0
        side = jnp.maximum(xd, yd)
        y0s = jnp.where(xd > yd, cy - xd / 2, y0)
        y1s = jnp.where(xd > yd, cy + xd / 2, y1)
        x0s = jnp.where(xd > yd, x0, cx - yd / 2)
        x1s = jnp.where(xd > yd, x1, cx + yd / 2)
        pct = jax.random.uniform(ks[4], (), minval=pct_min, maxval=pct_max)
        pad = jnp.rint(side * pct)
        pad = jnp.where(pad == 0, 25.0, pad)
        box = jnp.stack([
            jnp.maximum(jnp.floor(x0s - pad), 0),
            jnp.maximum(jnp.floor(y0s - pad), 0),
            jnp.minimum(jnp.floor(x1s + pad), w - 1),
            jnp.minimum(jnp.floor(y1s + pad), h - 1)]).astype(jnp.int32)

        lab_c = _crop_nearest_cv2(label, box, size)
        lab_c = _dense_relabel(lab_c)
        xyz_c = None
        if input_type in ("DEPTH", "RGBD"):
            xyz_c = _crop_nearest_cv2(xyz, box, size)

        image = None
        if input_type in ("COLOR", "RGBD"):
            img = _crop_bilinear_cv2(bgr.astype(jnp.float32), box, size)
            if use_chromatic:
                img = jax.lax.cond(
                    jax.random.uniform(ks[5]) > 0.1,
                    lambda im: chromatic_transform_device(im, ks[6]),
                    lambda im: im, img)
            if use_noise:
                img = jax.lax.cond(
                    jax.random.uniform(ks[7]) > 0.1,
                    lambda im: add_noise_device(im, ks[8]),
                    lambda im: im, img)
            image = img / 255.0 - pixel_means / 255.0

        if sampling_num:
            lab_c = sample_pixels_device(lab_c, ks[9], sampling_num)
        return image, xyz_c, lab_c

    def augment(bgr, depth_mm, label_u8, key):
        keys = jax.random.split(key, label_u8.shape[0])
        return jax.vmap(one)(bgr, depth_mm, label_u8, keys)

    return augment


def make_device_augment(cfg, *, fx: float, fy: float, px: float, py: float):
    """Build augment(bgr_u8 [B,H,W,3], depth_mm_u16 [B,H,W],
    label_u8 [B,H,W], key) -> (image, xyz, label) for cfg.

    Returned arrays follow cfg.INPUT: image/xyz are None for DEPTH/COLOR
    respectively.  Call inside a jit (engine.train.make_train_step_raw fuses
    it into the training step so each step is ONE device dispatch).
    """
    input_type = str(cfg.INPUT)
    use_chromatic = bool(cfg.TRAIN.CHROMATIC)
    use_noise = bool(cfg.TRAIN.ADD_NOISE)
    use_artifacts = bool(cfg.TRAIN.DEPTH_ARTIFACTS)
    sampling_num = (int(cfg.TRAIN.EMBEDDING_SAMPLING_NUM)
                    if bool(cfg.TRAIN.EMBEDDING_SAMPLING) else 0)
    pixel_means = jnp.asarray(cfg.pixel_means, jnp.float32)

    def one(bgr, depth_mm, label_u8, key):
        ks = jax.random.split(key, 9)
        h, w = depth_mm.shape
        label = label_u8.astype(jnp.int32)

        xyz = None
        if input_type in ("DEPTH", "RGBD"):
            depth = depth_mm.astype(jnp.float32) / 1000.0
            mult = jax.random.gamma(ks[0], GAMMA_SHAPE) * GAMMA_SCALE
            depth = dropout_random_ellipses_device(depth * mult, ks[1])
            if use_artifacts:
                depth = add_depth_artifacts_device(depth, ks[8])
            xyz = compute_xyz(depth, fx, fy, px, py, height=h, width=w)
            xyz = add_gp_noise_to_xyz_device(xyz, depth, ks[2])

        image = None
        if input_type in ("COLOR", "RGBD"):
            img = bgr.astype(jnp.float32)
            if use_chromatic:  # 90% probability (tabletop_object.py:299)
                img = jax.lax.cond(
                    jax.random.uniform(ks[3]) > 0.1,
                    lambda im: chromatic_transform_device(im, ks[4]),
                    lambda im: im, img)
            if use_noise:
                img = jax.lax.cond(
                    jax.random.uniform(ks[5]) > 0.1,
                    lambda im: add_noise_device(im, ks[6]),
                    lambda im: im, img)
            image = img / 255.0 - pixel_means / 255.0

        if sampling_num:
            label = sample_pixels_device(label, ks[7], sampling_num)
        return image, xyz, label

    def augment(bgr, depth_mm, label_u8, key):
        keys = jax.random.split(key, label_u8.shape[0])
        return jax.vmap(one)(bgr, depth_mm, label_u8, keys)

    return augment
