"""On-device (jit) image augmentation — the TPU equivalent of the
reference's CUDA-tensor augmentation variants (lib/utils/blob.py:141-192:
chromatic_transform_cuda / add_noise_cuda).

The host pipeline (data/augmentation.py) covers dataloader-side parity; these
run inside a compiled training graph so augmentation can move on-device when
the input pipeline is the bottleneck.  Semantics mirror the host versions:
HLS jitter with hue in [0, 180) and L/S in [0, 255] (OpenCV conventions),
and 90%-Gaussian / 10%-motion-blur noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bgr_to_hls(bgr: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """BGR [0,255] float -> (H [0,180), L [0,255], S [0,255]); OpenCV HLS."""
    b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    vsum = maxc + minc
    vdiff = maxc - minc
    l = vsum / 2.0

    safe_diff = jnp.where(vdiff > 0, vdiff, 1.0)
    s = jnp.where(
        vdiff > 0,
        jnp.where(l < 127.5, 255.0 * vdiff / jnp.maximum(vsum, 1e-6),
                  255.0 * vdiff / jnp.maximum(510.0 - vsum, 1e-6)),
        0.0)
    rc = (maxc - r) / safe_diff
    gc = (maxc - g) / safe_diff
    bc = (maxc - b) / safe_diff
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h * 30.0) % 180.0  # OpenCV: H/2 in degrees
    h = jnp.where(vdiff > 0, h, 0.0)
    return h, l, s


def _hls_to_bgr(h: jax.Array, l: jax.Array, s: jax.Array) -> jax.Array:
    """(H [0,180), L, S [0,255]) -> BGR [0,255] float."""
    hn = h * 2.0 / 360.0        # [0,1)
    ln = l / 255.0
    sn = s / 255.0
    m2 = jnp.where(ln <= 0.5, ln * (1.0 + sn), ln + sn - ln * sn)
    m1 = 2.0 * ln - m2

    def channel(hue):
        hue = hue % 1.0
        return jnp.where(
            hue < 1.0 / 6.0, m1 + (m2 - m1) * hue * 6.0,
            jnp.where(hue < 0.5, m2,
                      jnp.where(hue < 2.0 / 3.0,
                                m1 + (m2 - m1) * (2.0 / 3.0 - hue) * 6.0,
                                m1)))

    r = channel(hn + 1.0 / 3.0)
    g = channel(hn)
    b = channel(hn - 1.0 / 3.0)
    return jnp.stack([b, g, r], axis=-1) * 255.0


@jax.jit
def chromatic_transform_device(bgr: jax.Array, key: jax.Array) -> jax.Array:
    """HLS jitter on device (blob.py:74-99 / :141-166 semantics): hue
    +-9 deg-of-180, luminosity/saturation +-25.6 of 255.

    Args:
      bgr: [..., 3] image in 0..255 (any float/uint dtype).
    Returns float32 BGR in 0..255.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    d_h = (jax.random.uniform(k1) - 0.5) * 0.1 * 180.0
    d_l = (jax.random.uniform(k2) - 0.5) * 0.2 * 256.0
    d_s = (jax.random.uniform(k3) - 0.5) * 0.2 * 256.0
    h, l, s = _bgr_to_hls(bgr.astype(jnp.float32))
    h = (h + d_h) % 180.0
    l = jnp.clip(l + d_l, 0.0, 255.0)
    s = jnp.clip(s + d_s, 0.0, 255.0)
    return jnp.clip(_hls_to_bgr(h, l, s), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("level",))
def add_noise_device(image: jax.Array, key: jax.Array,
                     level: float = 0.1) -> jax.Array:
    """90% Gaussian / 10% motion blur on device (blob.py:102-129 / :169-192).

    Args:
      image: [H, W, 3] in 0..255.
    """
    k_sel, k_lvl, k_sig, k_noise, k_size, k_dir = jax.random.split(key, 6)
    img = image.astype(jnp.float32)
    h, w, c = img.shape

    def gaussian(_):
        noise_level = jax.random.uniform(k_lvl, maxval=level)
        sigma = jax.random.uniform(k_sig) * noise_level * 256.0
        gauss = sigma * jax.random.normal(k_noise, (h, w, 1))
        return jnp.clip(img + gauss, 0.0, 255.0)

    def motion_blur(_):
        sizes = jnp.array([3, 5, 7, 9, 11, 15])
        size = sizes[jax.random.randint(k_size, (), 0, 6)]
        # build a max-size line kernel, masked to the sampled length
        kmax = 15
        idx = jnp.arange(kmax)
        on = (jnp.abs(idx - kmax // 2) <= (size - 1) // 2).astype(jnp.float32)
        horiz = jax.random.uniform(k_dir) < 0.5
        k2d = jnp.where(horiz,
                        jnp.zeros((kmax, kmax)).at[kmax // 2, :].set(on),
                        jnp.zeros((kmax, kmax)).at[:, kmax // 2].set(on))
        k2d = k2d / jnp.maximum(k2d.sum(), 1.0)
        out = jax.lax.conv_general_dilated(
            img.transpose(2, 0, 1)[:, None],          # [C, 1, H, W]
            k2d[None, None],                          # [1, 1, kh, kw]
            window_strides=(1, 1), padding="SAME")
        return out[:, 0].transpose(1, 2, 0)

    use_gauss = jax.random.uniform(k_sel) < 0.9
    return jax.lax.cond(use_gauss, gaussian, motion_blur, None)
