"""Depth filter must handle cluster ids beyond MAX_INSTANCES (mean shift can
emit up to NUM_SEEDS clusters; regression for a max_labels clamp bug)."""

import numpy as np

import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.roi import filter_labels_depth


def test_high_cluster_ids_filtered():
    labels = np.zeros((16, 16), np.int32)
    labels[2:6, 2:6] = 40     # high id, all-invalid depth -> dropped
    labels[10:14, 10:14] = 77  # high id, valid depth -> kept
    xyz = np.zeros((16, 16, 3), np.float32)
    xyz[10:14, 10:14, 2] = 1.0
    out = np.asarray(filter_labels_depth(jnp.asarray(labels),
                                         jnp.asarray(xyz), 0.8,
                                         max_labels=101))
    assert (out[2:6, 2:6] == 0).all()
    assert (out[10:14, 10:14] == 77).all()
