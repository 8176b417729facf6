"""Device-resident dataset: upload the whole render cache to HBM once.

Why this exists: the reference streams every batch host->device each step
(lib/fcn/train.py:46-56 moves CUDA tensors per iteration).  On this TPU the
host->device path is an experimental tunnel whose client retains a host-side
copy of every upload (~16.5 MB/step at 480x640 batch 8 -> ~13 GB of host RSS
per epoch, measured; a 16-epoch run OOMs the 125 GB host).  It also pays
~85 ms dispatch latency per transfer.

The TPU-native fix: the cached scene tensors (uint8 BGR + uint16 depth_mm +
uint8 labels = 1.84 MB/scene, 11 GB for 6000 scenes) fit in a v5e's 16 GB
HBM.  Upload them ONCE; every training step then consumes only an int32
index vector and a PRNG key, and the gather + augmentation + fwd/bwd/update
run as one XLA program (engine.train.make_train_step_resident).

Host streaming (data.loader.DataLoader) remains the path for datasets larger
than HBM and for multi-host runs.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np


def load_resident_scenes(cache_dir: str, limit: Optional[int] = None,
                         mesh=None):
    """Read every cached scene into three device arrays (one-time upload).

    When `limit` is given, scenes are addressed BY INDEX (`000000.npz` ..
    `{limit-1:06d}.npz`) and every file must exist — a partially-populated
    cache raises instead of silently shrinking the dataset and re-mapping
    index->scene (which would break the streaming<->resident resume-order
    parity that RandomState(seed+epoch) shuffles rely on).

    Returns (bgr [N,H,W,3] u8, depth_mm [N,H,W] u16, label [N,H,W] u8) as
    committed jax arrays — replicated over `mesh` if given, else on the
    default device.
    """
    import jax

    if limit is not None:
        files = [os.path.join(cache_dir, f"{i:06d}.npz")
                 for i in range(limit)]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"render cache {cache_dir} holds only "
                f"{limit - len(missing)} of the {limit} requested scenes "
                f"(first missing: {os.path.basename(missing[0])}); "
                "re-render with tools/render_dataset.py or lower "
                "--resident-limit")
    else:
        files = sorted(glob.glob(os.path.join(cache_dir, "*.npz")))
        # the index-parity guarantee must hold here too: file i must BE
        # scene i, so a cache with holes (interrupted prerender) is an
        # error, not a silent re-mapping
        for i, f in enumerate(files):
            if os.path.basename(f) != f"{i:06d}.npz":
                raise FileNotFoundError(
                    f"render cache {cache_dir} is not contiguous: expected "
                    f"{i:06d}.npz at position {i}, found "
                    f"{os.path.basename(f)}; re-render or pass an explicit "
                    "limit")
    if not files:
        raise FileNotFoundError(f"no cached scenes in {cache_dir}")
    first = np.load(files[0])
    h, w = first["depth_mm"].shape
    n = len(files)
    bgr = np.empty((n, h, w, 3), np.uint8)
    depth = np.empty((n, h, w), np.uint16)
    label = np.empty((n, h, w), np.uint8)
    for i, f in enumerate(files):
        z = np.load(f)
        bgr[i] = z["bgr"]
        depth[i] = z["depth_mm"]
        label[i] = z["label"]

    if mesh is not None:
        from unseenobjectclustering_tpu.parallel import replicate
        return replicate((bgr, depth, label), mesh)
    return tuple(jax.device_put(x) for x in (bgr, depth, label))
