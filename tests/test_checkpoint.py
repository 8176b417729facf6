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

from torch_twin import (TorchBasicBlock, TorchResNet8s, TorchSegnetAdd,
                        TorchTower, _randomize_bn_stats, conv3x3)

import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.utils.checkpoint import (
    convert_torch_checkpoint, normalize_torch_keys)


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


def _torchvision_like_state_dict(rng):
    """A raw torchvision-resnet-shaped dict (bare trunk + Linear fc) built
    from the twin's trunk — torchvision itself is not in this container.
    Shapes match the real resnet34 family exactly (dilation does not change
    conv weight shapes)."""
    trunk = TorchResNet8s(layers=(1, 1, 1, 1), num_units=8)
    with torch.no_grad():
        _randomize_bn_stats(trunk, rng)
    sd = {k: v for k, v in trunk.state_dict().items()
          if not k.startswith("fc.")}
    sd["fc.weight"] = torch.tensor(rng.randn(1000, 512).astype(np.float32))
    sd["fc.bias"] = torch.tensor(rng.randn(1000).astype(np.float32))
    return trunk, sd


def test_imagenet_partial_load_both_towers():
    """EMBEDDING_PRETRAIN semantics (lib/networks/resnet.py:293-317): the
    ImageNet trunk loads into BOTH towers by name+size; the fc head and
    everything unmatched keep their init values."""
    import jax

    from unseenobjectclustering_tpu.utils.checkpoint import (
        convert_imagenet_checkpoint)

    rng = np.random.RandomState(3)
    torch.manual_seed(3)
    trunk, sd = _torchvision_like_state_dict(rng)

    import flax.linen as nn
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.models.resnet import ResNetFCN

    class TwoTower(nn.Module):
        @nn.compact
        def __call__(self, img, depth, *, train=False):
            f1 = ResNetFCN(block="basic", layers=(1, 1, 1, 1), num_classes=8,
                           output_stride=8, name="fcn")(img, train=train)
            f2 = ResNetFCN(block="basic", layers=(1, 1, 1, 1), num_classes=8,
                           output_stride=8, name="fcn_depth")(depth,
                                                              train=train)
            return f1 + f2

    model = TwoTower()
    z = jnp.zeros((1, 16, 16, 3), jnp.float32)
    init_vars = model.init(jax.random.PRNGKey(0), z, z, train=False)

    variables = convert_imagenet_checkpoint(sd, expected=init_vars)

    conv1_t = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    for tower in ("fcn", "fcn_depth"):
        np.testing.assert_array_equal(
            variables["params"][tower]["conv1"]["kernel"], conv1_t)
        np.testing.assert_array_equal(
            variables["batch_stats"][tower]["bn1"]["mean"],
            sd["bn1.running_mean"].numpy())
        np.testing.assert_array_equal(
            variables["params"][tower]["layer4_0"]["conv2"]["kernel"],
            sd["layer4.0.conv2.weight"].numpy().transpose(2, 3, 1, 0))
        # fc head must keep its init (torchvision Linear never matches)
        np.testing.assert_array_equal(
            variables["params"][tower]["fc"]["kernel"],
            np.asarray(init_vars["params"][tower]["fc"]["kernel"]))


def test_imagenet_partial_load_skips_early_fusion_conv1():
    """With a 6-channel early-fusion tower, conv1 is skipped by size (the
    reference's name+size filter) while the rest of the trunk loads."""
    import jax

    from unseenobjectclustering_tpu.utils.checkpoint import (
        convert_imagenet_checkpoint)

    rng = np.random.RandomState(4)
    torch.manual_seed(4)
    _, sd = _torchvision_like_state_dict(rng)

    import flax.linen as nn
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.models.resnet import ResNetFCN

    class EarlyFusion(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return ResNetFCN(block="basic", layers=(1, 1, 1, 1),
                             num_classes=8, output_stride=8,
                             name="fcn")(x, train=train)

    model = EarlyFusion()
    z = jnp.zeros((1, 16, 16, 6), jnp.float32)
    init_vars = model.init(jax.random.PRNGKey(0), z, train=False)

    variables = convert_imagenet_checkpoint(sd, expected=init_vars)
    # conv1 kept init (shape [7,7,6,64] vs ImageNet [7,7,3,64])
    np.testing.assert_array_equal(
        variables["params"]["fcn"]["conv1"]["kernel"],
        np.asarray(init_vars["params"]["fcn"]["conv1"]["kernel"]))
    # trunk still loaded
    np.testing.assert_array_equal(
        variables["params"]["fcn"]["layer2_0"]["conv1"]["kernel"],
        sd["layer2.0.conv1.weight"].numpy().transpose(2, 3, 1, 0))


def test_export_roundtrip():
    """export_torch_state_dict is the exact inverse of
    convert_torch_checkpoint: flax -> torch keys -> flax is bit-identical,
    and the exported dict loads into the torch twin."""
    import jax

    import flax.linen as nn
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.models.resnet import ResNetFCN
    from unseenobjectclustering_tpu.utils.checkpoint import (
        convert_torch_checkpoint, export_torch_state_dict)

    class TwoTower(nn.Module):
        @nn.compact
        def __call__(self, img, depth, *, train=False):
            f1 = ResNetFCN(block="basic", layers=(1, 1, 1, 1), num_classes=8,
                           output_stride=8, name="fcn")(img, train=train)
            f2 = ResNetFCN(block="basic", layers=(1, 1, 1, 1), num_classes=8,
                           output_stride=8, name="fcn_depth")(depth,
                                                              train=train)
            return f1 + f2

    model = TwoTower()
    z = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), z, z, train=False)

    sd = export_torch_state_dict(variables)
    back = convert_torch_checkpoint(sd, expected=variables)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    import numpy as np
    for path, leaf in flat_a:
        node = back
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)

    # loads into the torch twin (same topology) without missing keys
    twin = TorchSegnetAdd(layers=(1, 1, 1, 1), num_units=8)
    tensors = {k: torch.tensor(v) for k, v in sd.items()}
    missing, unexpected = twin.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    # only num_batches_tracked buffers may be missing
    assert all("num_batches_tracked" in k for k in missing), missing
