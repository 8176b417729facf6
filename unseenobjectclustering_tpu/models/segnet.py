"""SEGNET: top-level embedding network with RGB-D modality fusion.

Capability parity with the reference SEGNET (lib/networks/SEG.py:26-119):

  * backbone selection by network name (resnet34_8s / resnet50_8s / unet /
    vgg),
  * input modality handling (COLOR / DEPTH / RGBD) and fusion type:
      - 'early': channel-concat RGB+XYZ into one 6-channel tower
        (SEG.py:101-103)
      - 'add':   two towers, features summed (SEG.py:105-108)
      - 'cat':   two towers, features channel-concatenated -> 2*num_units
        embedding (SEG.py:110)
  * L2 feature normalization (SEG.py:112-114).

Unlike the reference, the loss is NOT computed inside the module (that was a
DataParallel artifact); the training engine composes
models.losses.embedding_loss with the features explicitly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.models.losses import \
    l2_normalize as _l2_normalize
from unseenobjectclustering_tpu.models.resnet import ResNetFCN


class SEGNET(nn.Module):
    """Pixel-embedding segmentation network.

    Call: features = model.apply(vars, img, depth, train=...)
      img:   [B, H, W, 3] normalized BGR (or None when input_type == 'DEPTH')
      depth: [B, H, W, 3] XYZ point-cloud image (or None for COLOR)
    Returns [B, H, W, E] unit-norm embeddings (E = num_units, or 2*num_units
    for fusion 'cat').
    """

    network_name: str = "resnet34_8s"
    input_type: str = "RGBD"       # COLOR | DEPTH | RGBD
    fusion_type: str = "add"       # early | add | cat
    num_units: int = 64
    normalize: bool = True
    batch_norm: bool = False       # VGG DSL batch_norm flag (SEG.py:28)
    dtype: Any = jnp.float32

    def _make_backbone(self, name: str) -> nn.Module:
        if self.network_name == "resnet18_8s":
            # reference resnet_dilated.py:90-107 (not exposed by its SEG
            # factories); 18's 2-2-2-2 BasicBlock plan, same OS8 machinery
            return ResNetFCN(block="basic", layers=(2, 2, 2, 2),
                             num_classes=self.num_units, output_stride=8,
                             dtype=self.dtype, name=name)
        if self.network_name == "resnet34_8s":
            return ResNetFCN(block="basic", layers=(3, 4, 6, 3),
                             num_classes=self.num_units, output_stride=8,
                             dtype=self.dtype, name=name)
        if self.network_name == "resnet50_8s":
            return ResNetFCN(block="bottleneck", layers=(3, 4, 6, 3),
                             num_classes=self.num_units, output_stride=8,
                             dtype=self.dtype, name=name)
        if self.network_name == "unet":
            from unseenobjectclustering_tpu.models.unets import UNetEmbedding
            return UNetEmbedding(num_units=self.num_units, dtype=self.dtype,
                                 name=name)
        if self.network_name == "vgg":
            from unseenobjectclustering_tpu.models.unets import VGGEmbedding
            return VGGEmbedding(num_units=self.num_units,
                                batch_norm=self.batch_norm, dtype=self.dtype,
                                name=name)
        raise ValueError(f"unknown network_name: {self.network_name}")

    @nn.compact
    def __call__(self, img: Optional[jax.Array],
                 depth: Optional[jax.Array] = None, *,
                 train: bool = False) -> jax.Array:
        fcn = self._make_backbone("fcn")
        if self.input_type == "DEPTH":
            features = fcn(depth, train=train)
        elif self.input_type == "COLOR":
            features = fcn(img, train=train)
        elif self.input_type == "RGBD" and self.fusion_type == "early":
            features = fcn(jnp.concatenate([img, depth], axis=-1), train=train)
        else:
            fcn_depth = self._make_backbone("fcn_depth")
            f_rgb = fcn(img, train=train)
            f_d = fcn_depth(depth, train=train)
            if self.fusion_type == "add":
                features = f_rgb + f_d
            else:  # 'cat' -> 2*num_units channels
                features = jnp.concatenate([f_rgb, f_d], axis=-1)
        if self.normalize:
            features = _l2_normalize(features, axis=-1)
        return features

    @property
    def embedding_dim(self) -> int:
        if self.input_type == "RGBD" and self.fusion_type == "cat":
            return 2 * self.num_units
        return self.num_units
