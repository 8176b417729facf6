"""U-Net and VGG-style alternate embedding backbones (flax/NHWC).

Capability parity with the reference's selectable-but-unshipped encoders
(lib/networks/unets.py): a GroupNorm U-Net encoder/decoder with skip fusion
(UNet_Encoder :141-174, UNet_Decoder :176-241) and the VGG string-DSL
encoder/decoder (make_encoder_layers :90-104, make_decoder_layers :107-136).
All 10 shipped configs use the ResNet backbone; these exist so every
`--network` choice of the reference has an equivalent here.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvGNReLU(nn.Module):
    """conv3x3 (no bias) + GroupNorm + ReLU (unets.py:9-30)."""

    features: int
    num_groups: int
    ksize: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = 0 if self.ksize < 2 else self.ksize // 2
        x = nn.Conv(self.features, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="gn")(x)
        return nn.relu(x)


class ConvGNReLUx2(nn.Module):
    features: int
    num_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvGNReLU(self.features, self.num_groups, dtype=self.dtype,
                       name="layer1")(x)
        x = ConvGNReLU(self.features, self.num_groups, dtype=self.dtype,
                       name="layer2")(x)
        return x


def _maxpool2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample2x_bilinear(x):
    """nn.Upsample(scale_factor=2, mode='bilinear') — half-pixel, no corner
    alignment (torch default align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class UNetEncoder(nn.Module):
    """4-level GroupNorm U-Net encoder (unets.py:141-174)."""

    feature_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fd = self.feature_dim
        x1 = ConvGNReLUx2(fd, fd, dtype=self.dtype, name="layer1")(x)
        x2 = ConvGNReLUx2(fd * 2, fd, dtype=self.dtype, name="layer2")(_maxpool2x2(x1))
        x3 = ConvGNReLUx2(fd * 4, fd, dtype=self.dtype, name="layer3")(_maxpool2x2(x2))
        x4 = ConvGNReLUx2(fd * 8, fd, dtype=self.dtype, name="layer4")(_maxpool2x2(x3))
        x5 = ConvGNReLU(fd * 16, fd, dtype=self.dtype, name="last_layer")(_maxpool2x2(x4))
        return x5, [x1, x2, x3, x4]


class UpsampleConcatConv(nn.Module):
    """Channel-reduce + 2x bilinear upsample + skip-concat + conv
    (unets.py:54-82)."""

    in_channels: int
    out_channels: int
    num_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips: Sequence[jax.Array]):
        x = ConvGNReLU(self.in_channels // 2, self.num_groups,
                       dtype=self.dtype, name="channel_reduction_layer")(x)
        x = _upsample2x_bilinear(x)
        x = jnp.concatenate([x] + list(skips), axis=-1)
        x = ConvGNReLU(self.out_channels, self.num_groups, dtype=self.dtype,
                       name="conv_gn_relu")(x)
        return x


class UNetDecoder(nn.Module):
    """Multi-encoder U-Net decoder with skip fusion (unets.py:176-241)."""

    feature_dim: int = 64
    num_encoders: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoder_outputs):
        fd = self.feature_dim
        out = jnp.concatenate([e[0] for e in encoder_outputs], axis=-1)
        out = ConvGNReLU(fd * 16, fd, ksize=1, dtype=self.dtype,
                         name="fuse_layer")(out)
        for i, mult_in, mult_out in ((1, 16, 8), (2, 8, 4), (3, 4, 2), (4, 2, 1)):
            skips = [e[1][4 - i] for e in encoder_outputs]
            out = UpsampleConcatConv(fd * mult_in, fd * mult_out, fd,
                                     dtype=self.dtype,
                                     name=f"layer{i}")(out, skips)
        out = ConvGNReLU(fd, fd, dtype=self.dtype, name="layer5")(out)
        out = nn.Conv(fd, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="last_conv")(out)
        return out


class UNetEmbedding(nn.Module):
    """Single-encoder U-Net embedding net (SEG.py:62-67 'unet' branch)."""

    num_units: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc = UNetEncoder(self.num_units, dtype=self.dtype, name="encoder")(x)
        return UNetDecoder(self.num_units, num_encoders=1, dtype=self.dtype,
                           name="decoder")([enc])


# VGG string DSL (SEG.py:21-23,47-50; unets.py:90-136)
VGG_ENCODER_ARCH: tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                           512, 512, 512, "M", 512, 512, 512, "M", 1024, 1024)


def vgg_decoder_arch(num_units: int) -> tuple:
    return (1024, "d512", 512, 512, "D", "d512", 512, 512, "D", "d256", 256,
            256, "d128", 128, 128, "d64", 64, num_units)


class VGGEmbedding(nn.Module):
    """VGG16-based encoder-decoder embedding net ('vgg' branch of SEGNET).

    Encoder: conv3x3+LeakyReLU(0.2) stacks with 2x2 maxpools per the 'M'
    tokens; decoder: transpose-conv 4x4 s2 upsamples per 'dN' tokens, dropout
    per 'D', and a final linear conv (no activation) for the embedding.

    batch_norm mirrors the reference's make_encoder/decoder_layers flag
    (unets.py:90-136, plumbed from SEG.py:28): BatchNorm between each
    conv/tconv and its LeakyReLU.  Deviation: with batch_norm=True the
    reference also wraps the FINAL embedding conv in BN+LeakyReLU
    (unets.py:127-129 has no last-layer exception in that branch), which
    would clamp the embedding to the positive orthant before L2
    normalization; here the final conv stays linear in both modes.
    Without normalization layers the 20-conv stack trains extremely
    slowly (see docs/synthetic_experiment.md), so the BN variant is the
    one worth training.
    """

    num_units: int = 64
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(x, i):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name=f"bn{i}")(x)

        idx = 0
        nrm = 0
        for v in VGG_ENCODER_ARCH:
            if v == "M":
                x = _maxpool2x2(x)
            else:
                x = nn.Conv(int(v), (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"enc_conv{idx}")(x)
                if self.batch_norm:
                    x = bn(x, nrm)
                    nrm += 1
                x = nn.leaky_relu(x, negative_slope=0.2)
                idx += 1
        arch = vgg_decoder_arch(self.num_units)
        idx = 0
        for i, v in enumerate(arch):
            last = i == len(arch) - 1
            if isinstance(v, str) and v[0] == "d":
                # 'SAME' here == torch ConvTranspose2d(k=4, s=2, p=1):
                # exact 2x upsample (flax pads the *output*, not the input)
                x = nn.ConvTranspose(int(v[1:]), (4, 4), strides=(2, 2),
                                     padding="SAME",
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name=f"dec_tconv{idx}")(x)
                if self.batch_norm:
                    x = bn(x, nrm)
                    nrm += 1
                x = nn.leaky_relu(x, negative_slope=0.2)
                idx += 1
            elif isinstance(v, str) and v[0] == "D":
                x = nn.Dropout(rate=0.2, deterministic=not train)(x)
            else:
                x = nn.Conv(int(v), (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"dec_conv{idx}")(x)
                if not last:
                    if self.batch_norm:
                        x = bn(x, nrm)
                        nrm += 1
                    x = nn.leaky_relu(x, negative_slope=0.2)
                idx += 1
        return x
