"""Dilated ResNet fully-convolutional backbones, TPU-native (flax/NHWC).

Re-implements the capability of the reference's modified torchvision ResNet
(lib/networks/resnet.py:116-270) and the output-stride-8 FCN wrappers
(lib/networks/resnet_dilated.py:287-327, :433-468):

  * stride->dilation conversion once the running stride reaches the requested
    output stride (reference lib/networks/resnet.py:200-211): for
    output_stride=8, layer3 becomes dilation 2 and layer4 dilation 4, both
    stride 1.
  * "full padding" for dilated 3x3 convs — padding == dilation
    (lib/networks/resnet.py:24-41).
  * 1x1 scoring conv replacing the classifier, then bilinear
    (align_corners=True) upsampling back to the input resolution
    (lib/networks/resnet_dilated.py:303,325).

Design departures (TPU-first, intentional):
  * NHWC layout; weights are flax-standard [kh, kw, in, out].
  * Explicit torch-style symmetric padding (XLA 'SAME' pads asymmetrically for
    even inputs with stride 2, which would break checkpoint parity).
  * The x8 upsample is two dense matmuls on the MXU (ops/resize.py) instead of
    a gather-based resize.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.resize import upsample_bilinear

ModuleDef = Any


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          padding: int | None = None, use_bias: bool = False,
          name: str | None = None, dtype=jnp.float32) -> nn.Conv:
    """Conv2D with torch-style symmetric padding (default: 'full padding' for
    the dilated kernel, i.e. pad = dilation for a 3x3)."""
    if padding is None:
        # upsampled kernel size k' = (k-1)*(d-1)+k ; full pad = (k'-1)//2
        k_up = (kernel - 1) * (dilation - 1) + kernel
        padding = (k_up - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection residual (expansion 1)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        residual = x
        out = _conv(self.planes, 3, self.stride, self.dilation,
                    name="conv1", dtype=self.dtype)(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation,
                    name="conv2", dtype=self.dtype)(out)
        out = norm("bn2")(out)
        if self.has_downsample:
            residual = _conv(self.planes * self.expansion, 1, self.stride,
                             padding=0, name="downsample_conv",
                             dtype=self.dtype)(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck residual (expansion 4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        residual = x
        out = _conv(self.planes, 1, padding=0, name="conv1", dtype=self.dtype)(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation,
                    name="conv2", dtype=self.dtype)(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, padding=0, name="conv3",
                    dtype=self.dtype)(out)
        out = norm("bn3")(out)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, padding=0,
                             name="downsample_conv", dtype=self.dtype)(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(out + residual)


def _plan_layers(block_expansion: int, layers: Sequence[int],
                 output_stride: int) -> list[list[dict]]:
    """Replicates the stride->dilation bookkeeping of
    lib/networks/resnet.py:188-234, returning per-block specs."""
    current_stride = 4
    current_dilation = 1
    inplanes = 64
    plan: list[list[dict]] = []
    for layer_idx, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layers)):
        stride = 1 if layer_idx == 0 else 2
        has_downsample = False
        if stride != 1 or inplanes != planes * block_expansion:
            if current_stride == output_stride:
                current_dilation *= stride
                stride = 1
            else:
                current_stride *= stride
            has_downsample = True
        specs = [dict(planes=planes, stride=stride,
                      dilation=current_dilation,
                      has_downsample=has_downsample)]
        inplanes = planes * block_expansion
        for _ in range(1, blocks):
            specs.append(dict(planes=planes, stride=1,
                              dilation=current_dilation,
                              has_downsample=False))
        plan.append(specs)
    return plan


def _max_pool_3x3_s2(x):
    """Torch MaxPool2d(kernel=3, stride=2, padding=1) — pad with -inf."""
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


class ResNetFCN(nn.Module):
    """Dilated ResNet trunk + 1x1 scoring conv + x(output_stride) bilinear
    upsample.  Equivalent capability to Resnet34_8s / Resnet50_8s
    (lib/networks/resnet_dilated.py:287-327,:433-468).
    """

    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]
    num_classes: int = 64
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = block_cls.expansion
        in_hw = (x.shape[-3], x.shape[-2])

        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = _max_pool_3x3_s2(x)

        plan = _plan_layers(expansion, self.layers, self.output_stride)
        for layer_idx, specs in enumerate(plan):
            for block_idx, spec in enumerate(specs):
                x = block_cls(
                    planes=spec["planes"], stride=spec["stride"],
                    dilation=spec["dilation"],
                    has_downsample=spec["has_downsample"],
                    dtype=self.dtype,
                    name=f"layer{layer_idx + 1}_{block_idx}")(x, train=train)

        # 1x1 scoring conv (the reference's replaced `fc`,
        # resnet_dilated.py:303) — has a bias.
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True, name="fc",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        # upsample back to input resolution, align_corners=True
        x = upsample_bilinear(x.astype(jnp.float32), in_hw)
        return x


def resnet34_8s(num_classes: int = 64, dtype=jnp.float32) -> ResNetFCN:
    return ResNetFCN(block="basic", layers=(3, 4, 6, 3),
                     num_classes=num_classes, output_stride=8, dtype=dtype)


def resnet50_8s(num_classes: int = 64, dtype=jnp.float32) -> ResNetFCN:
    return ResNetFCN(block="bottleneck", layers=(3, 4, 6, 3),
                     num_classes=num_classes, output_stride=8, dtype=dtype)
