"""PyTorch twin of the reference SEGNET/ResNet34-8s topology.

Built from the architecture spec (lib/networks/resnet.py:116-270,
resnet_dilated.py:287-327, SEG.py:96-114): dilated ResNet at output-stride
8, 1x1 scoring conv, bilinear align_corners upsample, dual-tower add
fusion, L2 normalize.  Shared by the checkpoint-converter test and the
whole-pipeline parity oracle.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF


def conv3x3(inp, out, stride=1, dilation=1):
    k_up = (3 - 1) * (dilation - 1) + 3
    pad = (k_up - 1) // 2
    return tnn.Conv2d(inp, out, 3, stride, pad, dilation=dilation, bias=False)


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride, dilation)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, 1, dilation)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        res = x
        out = tF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            res = self.downsample(x)
        return tF.relu(out + res)


class TorchResNet8s(tnn.Module):
    """Dilated ResNet-34 trunk, output-stride 8, 1x1 fc, x8 upsample."""

    def __init__(self, layers=(3, 4, 6, 3), num_units=64, in_ch=3,
                 output_stride=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.current_stride = 4
        self.current_dilation = 1
        self.output_stride = output_stride
        self.layer1 = self._make_layer(64, layers[0], stride=1)
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.fc = tnn.Conv2d(512, num_units, 1)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            if self.current_stride == self.output_stride:
                self.current_dilation *= stride
                stride = 1
            else:
                self.current_stride *= stride
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        layers = [TorchBasicBlock(self.inplanes, planes, stride,
                                  self.current_dilation, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TorchBasicBlock(planes, planes, 1,
                                          self.current_dilation))
        return tnn.Sequential(*layers)

    def forward(self, x):
        size = x.shape[2:]
        x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.fc(x)
        return tF.interpolate(x, size=size, mode="bilinear",
                              align_corners=True)


class TorchTower(tnn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.resnet34_8s = TorchResNet8s(**kw)

    def forward(self, x):
        return self.resnet34_8s(x)


class TorchSegnetAdd(tnn.Module):
    """RGBD 'add' fusion + L2 normalize (SEG.py:105-114 semantics)."""

    def __init__(self, **kw):
        super().__init__()
        self.fcn = TorchTower(**kw)
        self.fcn_depth = TorchTower(**kw)

    def forward(self, img, depth):
        f = self.fcn(img) + self.fcn_depth(depth)
        return tF.normalize(f, p=2, dim=1)


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so mean/var mapping is actually exercised."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.tensor(
                0.5 + rng.rand(m.num_features).astype(np.float32)))
