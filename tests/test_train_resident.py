"""Device-resident training path (engine.train.make_train_step_resident).

The resident step gathers scenes from HBM-resident tensors by index and must
be bit-identical to the streaming raw step (make_train_step_raw) given the
same gathered batch and key — the two paths differ only in where the batch
bytes come from.  Also exercises the epoch loop end-to-end on the 8-device
CPU mesh (replicated data, sharded indices).
"""

import os
import tempfile

import jax
import numpy as np
import pytest

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data.resident import load_resident_scenes
from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                     make_train_step_raw,
                                                     make_train_step_resident,
                                                     train_epochs_resident)
from unseenobjectclustering_tpu.parallel import make_mesh, replicate

pytestmark = pytest.mark.slow  # multi-minute: full CI tier only (pytest --runslow)

H, W, N = 32, 32, 12
FX = FY = 16.0
PX, PY = W / 2.0, H / 2.0


def small_cfg():
    return Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"EMBEDDING_METRIC": "cosine", "NUM_UNITS": 4,
                  "EMBEDDING_ALPHA": 0.02, "EMBEDDING_DELTA": 0.5,
                  "EMBEDDING_LAMBDA_INTRA": 1.0,
                  "EMBEDDING_LAMBDA_INTER": 1.0,
                  "CHROMATIC": True, "ADD_NOISE": True,
                  "EMBEDDING_SAMPLING": True,
                  "EMBEDDING_SAMPLING_NUM": 64,
                  "LEARNING_RATE": 1e-3, "WEIGHT_DECAY": 1e-4,
                  "SNAPSHOT_EPOCHS": 16},
    })


def _scenes(rng, n=N):
    bgr = rng.randint(0, 256, size=(n, H, W, 3)).astype(np.uint8)
    depth = rng.randint(300, 2000, size=(n, H, W)).astype(np.uint16)
    label = rng.randint(0, 4, size=(n, H, W)).astype(np.uint8)
    return bgr, depth, label


def test_resident_step_matches_raw_step():
    cfg = small_cfg()
    bgr, depth, label = _scenes(np.random.RandomState(0))
    kw = dict(fx=FX, fy=FY, px=PX, py=PY, max_k=8)
    step_raw = make_train_step_raw(cfg, **kw)
    step_res = make_train_step_resident(cfg, **kw)
    key = jax.random.PRNGKey(7)
    idx = np.array([3, 0, 9, 5], np.int32)

    s1 = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                            height=H, width=W)
    s2 = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                            height=H, width=W)
    s1, m1 = step_raw(s1, bgr[idx], depth[idx], label[idx], key)
    s2, m2 = step_res(s2, jax.numpy.asarray(bgr), jax.numpy.asarray(depth),
                      jax.numpy.asarray(label), idx, key)
    assert float(m1["loss"]) == float(m2["loss"])
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_epoch_loop_on_mesh():
    cfg = small_cfg()
    mesh = make_mesh()
    bgr, depth, label = _scenes(np.random.RandomState(1), n=16)
    scenes = replicate((bgr, depth, label), mesh)
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=H, width=W)
    state = replicate(state, mesh)
    state = train_epochs_resident(
        cfg, state, scenes, epochs=1, batch_size=8, mesh=mesh, max_k=8,
        intrinsics=(FX, FY, PX, PY), log_every=100)
    assert int(state.step) == 2  # 16 scenes / batch 8


def test_load_resident_scenes_roundtrip(tmp_path):
    bgr, depth, label = _scenes(np.random.RandomState(2), n=3)
    for i in range(3):
        np.savez(os.path.join(tmp_path, f"{i:06d}.npz"), bgr=bgr[i],
                 depth_mm=depth[i], label=label[i])
    b, d, l = load_resident_scenes(str(tmp_path), limit=2)
    assert b.shape == (2, H, W, 3) and d.dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(b), bgr[:2])
    np.testing.assert_array_equal(np.asarray(l), label[:2])


def test_load_resident_scenes_rejects_partial_cache(tmp_path):
    """With a requested count, a partially-populated cache must raise
    rather than silently shrink + re-map index->scene (which would break
    the streaming<->resident data-order parity)."""
    import pytest

    bgr, depth, label = _scenes(np.random.RandomState(2), n=3)
    # populate scenes 0 and 2 — scene 1 missing (lazily-filled cache)
    for i in (0, 2):
        np.savez(os.path.join(tmp_path, f"{i:06d}.npz"), bgr=bgr[i],
                 depth_mm=depth[i], label=label[i])
    with pytest.raises(FileNotFoundError, match="000001.npz"):
        load_resident_scenes(str(tmp_path), limit=3)
