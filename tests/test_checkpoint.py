"""Checkpoint-converter tests.

The oracle is a PyTorch twin of the reference SEGNET/ResNet34-8s topology
(built here from the architecture spec: dilated ResNet-34 at output-stride 8,
1x1 scoring conv, bilinear align_corners upsample, dual-tower add fusion,
L2 normalize).  Converting its randomly-initialized state_dict into flax
variables and comparing forward outputs validates every mapping detail:
kernel transposes, BN scale/bias/mean/var, stride->dilation plan, padding,
and upsample semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.utils.checkpoint import (
    convert_torch_checkpoint, normalize_torch_keys)


# ---------------------------------------------------------------------------
# torch twin of the reference topology
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_normalize_torch_keys():
    out = normalize_torch_keys({"model": {"module.a": 3}})
    assert out == {"a": 3}
    out = normalize_torch_keys({"module.fcn.resnet34_8s.conv1.weight": 1})
    assert "fcn.resnet34_8s.conv1.weight" in out
    out = normalize_torch_keys({"decoder.features.3.weight": 5})
    assert out == {"decoder.3.weight": 5}


def test_converted_checkpoint_matches_torch_forward():
    rng = np.random.RandomState(0)
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)  # one block per stage: exercises every mapping
    twin = TorchSegnetAdd(layers=layers, num_units=8)
    with torch.no_grad():
        _randomize_bn_stats(twin, rng)
    twin.eval()

    # wrap keys like a DataParallel checkpoint
    sd = {"module." + k: v for k, v in twin.state_dict().items()}

    # SEGNET hardcodes layers=(3,4,6,3); build a matching shallow twin from
    # the same ResNetFCN blocks so the test runs fast on CPU
    import flax.linen as nn
    from unseenobjectclustering_tpu.models.resnet import ResNetFCN

    class SmallSegnet(nn.Module):
        @nn.compact
        def __call__(self, img, depth, *, train=False):
            f1 = ResNetFCN(block="basic", layers=layers, num_classes=8,
                           output_stride=8, name="fcn")(img, train=train)
            f2 = ResNetFCN(block="basic", layers=layers, num_classes=8,
                           output_stride=8, name="fcn_depth")(depth,
                                                              train=train)
            f = f1 + f2
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(f * f, axis=-1, keepdims=True), 1e-24))
            return f / jnp.maximum(norm, 1e-12)

    fmodel = SmallSegnet()
    img = rng.rand(1, 32, 48, 3).astype(np.float32)
    dep = rng.rand(1, 32, 48, 3).astype(np.float32)
    init_vars = fmodel.init(__import__("jax").random.PRNGKey(0),
                            jnp.asarray(img), jnp.asarray(dep), train=False)

    variables = convert_torch_checkpoint(sd, expected=init_vars)

    out_flax = np.asarray(fmodel.apply(variables, jnp.asarray(img),
                                       jnp.asarray(dep), train=False))

    with torch.no_grad():
        out_torch = twin(torch.tensor(img.transpose(0, 3, 1, 2)),
                         torch.tensor(dep.transpose(0, 3, 1, 2)))
    out_torch = out_torch.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4)


def test_converter_rejects_missing_keys():
    import jax

    from unseenobjectclustering_tpu.models.segnet import SEGNET
    cfg = Config.from_dict({"INPUT": "COLOR",
                            "TRAIN": {"NUM_UNITS": 4}})
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    init_vars = model.init(jax.random.PRNGKey(0), img, None, train=False)
    with pytest.raises(KeyError):
        convert_torch_checkpoint({}, expected=init_vars)
