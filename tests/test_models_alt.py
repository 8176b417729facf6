"""Alternate-backbone (U-Net / VGG) and stream-serving tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models import get_network


@pytest.mark.parametrize("name", ["seg_unet_embedding", "seg_vgg_embedding",
                                  "seg_resnet18_8s_embedding"])
def test_alternate_backbones_forward(name):
    cfg = Config.from_dict({"INPUT": "COLOR", "TRAIN": {"NUM_UNITS": 8}})
    model = get_network(name, cfg, num_units=8)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, None, train=False)
    out = model.apply(variables, img, None, train=False)
    assert out.shape == (1, 64, 64, 8)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # L2-normalized


def test_early_fusion_six_channel_tower():
    cfg = Config.from_dict({"INPUT": "RGBD", "TRAIN": {"NUM_UNITS": 4}})
    model = get_network("seg_resnet34_8s_embedding_early", cfg, num_units=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    xyz = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, xyz, train=False)
    # one tower, 6 input channels
    k = variables["params"]["fcn"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)
    out = model.apply(variables, img, xyz, train=False)
    assert out.shape == (1, 32, 32, 4)


def test_cat_fusion_doubles_embedding_dim():
    cfg = Config.from_dict({"INPUT": "RGBD",
                            "TRAIN": {"NUM_UNITS": 4, "FUSION_TYPE": "cat"}})
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    out = model.apply(variables, img, img, train=False)
    assert out.shape == (1, 32, 32, 8)  # 2 * num_units


def test_stream_segmentor():
    from unseenobjectclustering_tpu.engine.pipeline import Segmentor
    from unseenobjectclustering_tpu.engine.stream import StreamSegmentor

    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False},
    })
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    seg = Segmentor(cfg, variables, depth_threshold=None)
    ss = StreamSegmentor(cfg, seg)

    assert ss.process_latest() is None  # nothing pending

    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 255, (32, 32, 3), np.uint8)
    depth = 0.5 + rng.rand(32, 32).astype(np.float32)
    ss.submit(bgr, depth, (30.0, 30.0, 16.0, 16.0), stamp="f1")
    ss.submit(bgr, depth, (30.0, 30.0, 16.0, 16.0), stamp="f2")
    res = ss.process_latest(refine=False)
    assert res is not None
    assert res.stamp == "f2"          # newest wins, f1 dropped
    assert res.labels.shape == (32, 32)
    # the frame rides along so transports can render label overlays
    # (the reference node publishes seg_image/_refined overlay topics)
    np.testing.assert_array_equal(res.bgr, bgr)
    assert ss.process_latest() is None  # buffer consumed


def test_se3_roundtrip():
    from unseenobjectclustering_tpu.utils.se3 import (mat2quat, quat2mat,
                                                      se3_inverse, se3_mul)
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    m = quat2mat(q)
    assert np.allclose(m @ m.T, np.eye(3), atol=1e-10)
    q2 = mat2quat(m)
    assert np.allclose(q, q2 * np.sign(q2[0]) * np.sign(q[0]), atol=1e-8)

    rt = np.zeros((3, 4))
    rt[:3, :3] = m
    rt[:3, 3] = rng.randn(3)
    ident = se3_mul(rt, se3_inverse(rt))
    assert np.allclose(ident[:3, :3], np.eye(3), atol=1e-10)
    assert np.allclose(ident[:3, 3], 0, atol=1e-10)


def test_vgg_train_step_with_dropout_rng():
    """The VGG decoder trains with Dropout(0.2) (reference unets.py:124);
    the engine must thread a dropout rng or train-mode apply raises
    InvalidRngError."""
    from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                         make_train_step)
    cfg = Config.default().replace(INPUT="COLOR")
    state = create_train_state(cfg, network_name="seg_vgg_embedding",
                               height=32, width=32)
    step = make_train_step(cfg, max_k=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    label = jnp.zeros((1, 32, 32), jnp.int32)
    step_before = int(state.step)  # state is donated by the jitted step
    new_state, metrics = step(state, img, None, label,
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == step_before + 1


def test_vgg_batch_norm_variant():
    """VGG_BATCH_NORM=True mirrors the reference's batch_norm DSL flag
    (SEG.py:28 -> unets.py:90-136): BN between every hidden conv/tconv
    and its LeakyReLU.  The variant must create running batch_stats, train
    through make_train_step (stats updated), and eval deterministically."""
    from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                         make_train_step)
    cfg = Config.from_dict({"INPUT": "COLOR",
                            "TRAIN": {"NUM_UNITS": 8,
                                      "VGG_BATCH_NORM": True}})
    model = get_network("seg_vgg_embedding", cfg, num_units=8)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, None, train=False)
    assert "batch_stats" in variables  # BN layers present
    out = model.apply(variables, img, None, train=False)
    assert out.shape == (1, 64, 64, 8)

    state = create_train_state(cfg, network_name="seg_vgg_embedding",
                               height=32, width=32)
    # materialize: the jitted step donates state buffers
    stats_before = [np.asarray(x)
                    for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert stats_before, "BN variant must carry running stats"
    step = make_train_step(cfg, max_k=4)
    label = jnp.zeros((1, 32, 32), jnp.int32)
    new_state, metrics = step(state, jnp.zeros((1, 32, 32, 3), jnp.float32),
                              None, label, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    stats_after = jax.tree_util.tree_leaves(new_state.batch_stats)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(stats_before, stats_after))
    assert changed, "train step must update BN running stats"
