"""Spatially-partitioned stage-1 (one frame sharded across the mesh width)
must match the single-device program exactly — XLA SPMD partitioning is
semantics-preserving, so the halo-exchanged convolutions and the collective
clustering reductions cannot change a single label."""

import numpy as np

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.pipeline import Segmentor
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.parallel import make_mesh


def test_spatial_stage1_matches_single_device():
    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False},
    })
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    zeros = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zeros, zeros, train=False)
    mesh = make_mesh()   # 8 CPU devices; W=64 -> 8 pixel-wide shards

    rng = np.random.RandomState(0)
    img = rng.rand(1, 32, 64, 3).astype(np.float32)
    xyz = rng.rand(1, 32, 64, 3).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), 1)

    seg = Segmentor(cfg, variables, depth_threshold=None, seed=7)
    spatial = seg.make_spatial_stage1(mesh)

    want_feat, want_lab = seg._stage1(variables, img, xyz, keys)
    got_feat, got_lab = spatial(variables, jnp.asarray(img),
                                jnp.asarray(xyz), keys)
    np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(want_lab))
    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(want_feat),
                               atol=1e-5)
