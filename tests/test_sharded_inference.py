"""Sharded stage-1 inference over the 8-device CPU mesh must match the
unsharded path exactly, and filter_labels_boxes must match its spec."""

import numpy as np

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.pipeline import Segmentor
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.ops.roi import filter_labels_boxes
from unseenobjectclustering_tpu.parallel import make_mesh


def test_sharded_stage1_matches_unsharded():
    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False},
    })
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zeros, zeros, train=False)
    mesh = make_mesh()
    n = len(mesh.devices.ravel())

    rng = np.random.RandomState(0)
    img = rng.rand(n, 32, 32, 3).astype(np.float32)
    xyz = rng.rand(n, 32, 32, 3).astype(np.float32)

    # two segmentors so the internal PRNG streams stay aligned
    seg_a = Segmentor(cfg, variables, depth_threshold=None, seed=7)
    seg_b = Segmentor(cfg, variables, depth_threshold=None, seed=7)

    want = seg_a.segment(img, xyz, refine=False).labels
    got = seg_b.segment_sharded(mesh, img, xyz)
    np.testing.assert_array_equal(got, want)


def test_filter_labels_boxes():
    labels = np.zeros((32, 32), np.int32)
    labels[2:10, 2:10] = 1     # fully inside box -> dropped
    labels[20:30, 20:30] = 2   # outside -> kept
    boxes = jnp.asarray([[0, 0, 16, 16]], jnp.float32)
    out = np.asarray(filter_labels_boxes(jnp.asarray(labels), boxes,
                                         threshold=0.8, max_labels=8))
    assert (out[2:10, 2:10] == 0).all()
    assert (out[20:30, 20:30] == 2).all()


def test_sharded_eval_matches_per_image():
    """evaluate_dataset_sharded must produce the same averaged metrics as
    the per-image evaluate_dataset (stage-1 only), incl. a padded tail."""
    from unseenobjectclustering_tpu.engine.evaluate import (
        evaluate_dataset, evaluate_dataset_sharded)

    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False},
    })
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zeros, zeros, train=False)
    mesh = make_mesh()

    class DS:
        def __len__(self):
            return 11  # not a multiple of 8: exercises tail padding

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            lab = np.zeros((32, 32), np.int32)
            lab[4:12, 4:12] = 1
            return {"image_color": rng.rand(32, 32, 3).astype(np.float32),
                    "depth": rng.rand(32, 32, 3).astype(np.float32),
                    "label": lab, "filename": str(i)}

    ds = DS()
    seg_a = Segmentor(cfg, variables, depth_threshold=None, seed=5)
    seg_b = Segmentor(cfg, variables, depth_threshold=None, seed=5)
    # align RNG streams: per-image eval draws one key per image; sharded
    # draws one key per batch split into B -- streams differ, so compare
    # metrics through deterministic clustering instead: same variables,
    # same inputs => embeddings identical; metrics must agree to ~1e-6
    # as long as clustering is seed-robust on this easy input.
    want, _ = evaluate_dataset(ds, seg_a, refine=False, verbose=False,
                               save_results=False)
    got = evaluate_dataset_sharded(ds, seg_b, mesh, batch_size=8,
                                   verbose=False)
    assert got["obj_gt"] == want["obj_gt"]
    assert abs(got["Objects F-measure"] - want["Objects F-measure"]) < 0.05
