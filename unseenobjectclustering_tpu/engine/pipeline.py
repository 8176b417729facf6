"""Two-stage unseen-object instance segmentation pipeline (inference).

The de-facto public API of the reference is ``test_sample``
(lib/fcn/test_dataset.py:232-267): RGB-D sample in, stage-1 labels +
zoom-in-refined labels out.  This module is its TPU-native counterpart:

  stage 1 (one jit-compiled XLA program, static 480x640 shapes):
    backbone forward -> unit-norm pixel embeddings -> vMF mean-shift
    clustering (fused Pallas hill climb) -> depth validity filter.

  stage 2 (one jit-compiled program, padded to a static MAX_INSTANCES):
    batched RoI tight-box extraction + 25%-padded crop-resize to 224^2
    (ops/roi.py) -> zoom-in network forward on all crops at once ->
    per-crop mean-shift re-clustering (sequential lax.map so invalid
    padded crops can be skipped with lax.cond).

  paste-back (host, numpy): order-dependent overwrite by depth
  (ops/roi.match_label_crop; test_dataset.py:116-179) — inherently
  sequential, tiny, and final-output-only, so it stays off-device.

Design notes vs the reference:
  * The reference loops clustering per image in Python
    (test_dataset.py:44-59); here the batch axis is a lax.map inside the
    compiled program — no host round-trips between phases.
  * The full stage-1 program is compiled once per (H, W, B) and cached.
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
from unseenobjectclustering_tpu.ops.roi import (crop_rois, filter_labels_depth,
                                                paste_back, veto_and_order)


class SegmentationResult(NamedTuple):
    """Outputs of one segmentation call (numpy, host-side)."""
    labels: np.ndarray                     # [B, H, W] int32 stage-1 labels
    labels_refined: Optional[np.ndarray]   # [B, H, W] int32 or None
    features: Optional[np.ndarray]         # [B, H, W, C] embeddings or None
    timing: dict


def _cluster_batch(features: jax.Array, keys: jax.Array,
                   z_valid: Optional[jax.Array] = None,
                   filter_threshold: float = 0.0, **ms_kw) -> jax.Array:
    """Mean-shift cluster each image's pixel embeddings.

    features: [B, H, W, C]; keys: [B] PRNG keys.  Returns [B, H, W] int32.
    Sequential lax.map over the batch: each image's clustering already
    saturates the chip (307k x 100 similarity), so batching them would only
    multiply peak memory.  z_valid [B, H, W] + filter_threshold fuse the
    depth-validity filter into the assignment kernel's X sweep.
    """
    b, h, w, c = features.shape

    if z_valid is None:
        def one(args):
            feat, k = args
            res = mean_shift_smart_init(feat.reshape(h * w, c), k, **ms_kw)
            return res.labels.reshape(h, w)

        return jax.lax.map(one, (features, keys))

    def one_filtered(args):
        feat, k, zv = args
        res = mean_shift_smart_init(feat.reshape(h * w, c), k,
                                    z_valid=zv.reshape(h * w),
                                    filter_threshold=filter_threshold,
                                    **ms_kw)
        return res.labels.reshape(h, w)

    return jax.lax.map(one_filtered, (features, keys, z_valid))


def _cluster_crops(features: jax.Array, valid: jax.Array, keys: jax.Array,
                   **ms_kw) -> jax.Array:
    """Cluster each RoI crop's embeddings, skipping invalid padded slots.

    features: [M, S, S, C]; valid: [M] bool.  Returns [M, S, S] int32.

    Sequential lax.map + lax.cond, NOT a batched vmap: measured on v5e
    (8 x 224^2 crops), map+cond with the fused Pallas kernels runs 6.5 ms
    fast / 14.3 ms parity per frame vs 12.6 / 37.4 ms for a vmapped XLA
    path and 6.9 / 34.0 ms for vmapped Pallas — the cond skip of invalid
    padded slots and the VMEM-resident hill climb beat lockstep batching,
    whose per-crop [n, m] kernel matrices round-trip HBM.
    """
    m, s, _, c = features.shape

    def one(args):
        feat, ok, k = args
        def run(_):
            res = mean_shift_smart_init(feat.reshape(s * s, c), k, **ms_kw)
            return res.labels.reshape(s, s)
        return jax.lax.cond(ok, run,
                            lambda _: jnp.zeros((s, s), jnp.int32), None)

    return jax.lax.map(one, (features, valid, keys))


class Segmentor:
    """Two-stage segmentation engine with compiled stage graphs.

    Mirrors the call surface of the reference's ``test_sample``:

        seg = Segmentor(cfg, variables, variables_crop)
        result = seg.segment(image, xyz)   # normalized BGR + XYZ, NHWC

    ``variables`` / ``variables_crop`` are flax variable dicts
    ({'params': ..., 'batch_stats': ...}) for the main and zoom-in networks.
    """

    def __init__(self, cfg: Config, variables: Any,
                 variables_crop: Optional[Any] = None,
                 network_name: str = "seg_resnet34_8s_embedding",
                 crop_network_name: Optional[str] = None,
                 depth_threshold: Optional[float] = 0.8,
                 seed: int = 3, model_dtype: Any = None):
        self.cfg = cfg
        # model_dtype=bfloat16 runs the conv stack on the MXU at 2x; params
        # stay float32 and the embedding head/normalization are float32
        self.model = get_network(network_name, cfg, dtype=model_dtype)
        self.variables = variables
        self.variables_crop = variables_crop
        self.model_crop = (get_network(crop_network_name or network_name, cfg,
                                       dtype=model_dtype)
                           if variables_crop is not None else None)
        # depth filter threshold: 0.5 OCID / 0.8 OSD & demo
        # (test_dataset.py:299-305,250-252); None disables.
        self.depth_threshold = depth_threshold
        self._key = jax.random.PRNGKey(seed)

        ms = dict(kappa=float(cfg.CLUSTER.KAPPA),
                  num_seeds=int(cfg.CLUSTER.NUM_SEEDS),
                  max_iters=int(cfg.CLUSTER.MAX_ITERS),
                  epsilon=float(cfg.cluster_epsilon),
                  metric=str(cfg.TRAIN.EMBEDDING_METRIC),
                  use_pallas=bool(cfg.CLUSTER.USE_PALLAS),
                  seed_subsample=int(cfg.CLUSTER.SEED_SUBSAMPLE),
                  compute_dtype=str(cfg.CLUSTER.DTYPE))
        self._ms_kw = ms
        self.max_instances = int(cfg.CLUSTER.MAX_INSTANCES)
        self.crop_size = int(cfg.TRAIN.SYN_CROP_SIZE)
        # keep all-vetoed stage-1 instances instead of deleting them
        # (cfg.CLUSTER.REFINE_FALLBACK; ops/roi.paste_back)
        self.refine_fallback = bool(
            getattr(cfg.CLUSTER, "REFINE_FALLBACK", False))

        self._stage1 = jax.jit(functools.partial(
            self._stage1_impl,
            threshold=(-1.0 if depth_threshold is None
                       else float(depth_threshold))))
        self._stage2 = jax.jit(self._stage2_impl,
                               static_argnames=("has_depth",
                                                "max_instances"))
        # stage-2 crop batches compile per bucket: a frame with 5 instances
        # runs the zoom-in network on 8 padded crops, not MAX_INSTANCES=32
        # (the conv forward dominates stage 2 and scales with the padding)
        self._buckets = sorted({b for b in (8, 16, self.max_instances)
                                if b <= self.max_instances})

    # -- compiled graphs -----------------------------------------------------

    def _stage1_impl(self, variables, img, xyz, keys, *, threshold: float,
                     ms_kw: Optional[dict] = None):
        """img/xyz: [B, H, W, 3], keys: [B] -> (features [B,H,W,C],
        labels [B,H,W])."""
        features = self.model.apply(variables, img, xyz, train=False)
        if xyz is not None and threshold > 0:
            # depth filter fused into the assignment kernel's X sweep
            # (z_valid histograms ride along; no separate one-hot pass)
            labels = _cluster_batch(features, keys,
                                    z_valid=(xyz[..., 2] > 0),
                                    filter_threshold=float(threshold),
                                    **(ms_kw or self._ms_kw))
        else:
            labels = _cluster_batch(features, keys,
                                    **(ms_kw or self._ms_kw))
        return features, labels

    def make_sharded_stage1(self, mesh, axis_name: str = "data"):
        """Data-parallel stage-1 over a device Mesh: each device runs the
        identical per-image program on its batch shard (shard_map; no
        cross-device communication — eval BatchNorm is elementwise).

        Returns fn(variables, img [B,...], xyz [B,...], keys [B]) with B
        divisible by the mesh size; numerics match the unsharded path.
        """
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map  # jax >= 0.4.35
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        threshold = (-1.0 if self.depth_threshold is None
                     else float(self.depth_threshold))
        local = functools.partial(self._stage1_impl, threshold=threshold)
        specs = dict(
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name)))
        try:
            # varying-manual-axes checking rejects plain-constant loop
            # carries inside the clustering fori_loops; disable it
            sharded = shard_map(local, mesh=mesh, check_vma=False, **specs)
        except TypeError:  # older jax spells it check_rep
            sharded = shard_map(local, mesh=mesh, check_rep=False, **specs)
        return jax.jit(sharded)

    def make_spatial_stage1(self, mesh, axis_name: str = "data"):
        """SINGLE-FRAME latency scaling: shard the width axis of one frame
        across the mesh and let XLA's SPMD partitioner compile the program
        multi-chip — halo exchanges for the convolutions, all-gathers/psums
        for the global clustering reductions — with no manual communication
        code.  This is a capability the reference has no analogue for:
        torch.nn.DataParallel (its only parallelism) cannot split one image.

        Numerics match the single-device program exactly (SPMD partitioning
        is semantics-preserving).  The clustering runs the pure-XLA path:
        Pallas kernels are written against a single chip's VMEM and do not
        auto-partition.

        Returns fn(variables, img [B,H,W,3], xyz, keys [B]) -> (features,
        labels), with W divisible by the mesh size.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        threshold = (-1.0 if self.depth_threshold is None
                     else float(self.depth_threshold))
        ms_kw = dict(self._ms_kw, use_pallas=False)
        local = functools.partial(self._stage1_impl, threshold=threshold,
                                  ms_kw=ms_kw)
        col = NamedSharding(mesh, P(None, None, axis_name))      # [B, H, W]
        col4 = NamedSharding(mesh, P(None, None, axis_name, None))
        rep = NamedSharding(mesh, P())
        return jax.jit(local,
                       in_shardings=(rep, col4, col4, rep),
                       out_shardings=(col4, col))

    def segment_sharded(self, mesh, image: Optional[np.ndarray],
                        xyz: Optional[np.ndarray]) -> np.ndarray:
        """Stage-1 labels for a batch sharded across `mesh` (throughput-
        oriented dataset evaluation; BASELINE.json 'batched on-device
        inference' config).  Returns [B, H, W] int32."""
        if not hasattr(self, "_sharded_stage1_cache"):
            self._sharded_stage1_cache = {}
        # Mesh is hashable; keying on the object (not id()) keeps a live
        # reference and can't alias a recycled address to a stale closure
        if mesh not in self._sharded_stage1_cache:
            self._sharded_stage1_cache[mesh] = self.make_sharded_stage1(mesh)
        fn = self._sharded_stage1_cache[mesh]
        b = (image if image is not None else xyz).shape[0]
        keys = jax.random.split(self.next_key(), b)
        _, labels = fn(self.variables,
                       jnp.asarray(image) if image is not None else None,
                       jnp.asarray(xyz) if xyz is not None else None, keys)
        return np.asarray(labels, dtype=np.int32)

    def _stage2_impl(self, variables_crop, img, labels, xyz, key,
                     *, has_depth: bool, max_instances: Optional[int] = None):
        """Per image: RoI crops -> zoom-in forward -> per-crop clustering ->
        on-device veto + paste ordering.

        img/xyz: [H, W, 3]; labels: [H, W].  Returns only the small arrays
        the host paste-back needs (int8 label crops, order keys, rois,
        valid) — the full float crop stack never leaves the device.
        """
        max_instances = max_instances or self.max_instances
        # dense-remap instance ids on device: after the depth filter the
        # cluster ids can be sparse (e.g. {0, 2, 11}) while crop_rois scans
        # ids 1..max_instances — the remap makes every instance reachable
        # (the reference crops every unique id, test_dataset.py:68-70).
        # Device-side (one-hot presence rank) so the caller never re-uploads
        # a [H,W] map through the tunnel (~85 ms dispatch + host-RSS leak).
        from unseenobjectclustering_tpu.ops.train_pipeline import (
            _dense_relabel)
        labels = _dense_relabel(labels,
                                max_id=int(self._ms_kw["num_seeds"]))
        crops = crop_rois(img, labels, xyz,
                          max_instances=max_instances,
                          crop_size=self.crop_size)
        input_type = self.cfg.INPUT
        rgb_in = crops.rgb_crops if input_type != "DEPTH" else None
        xyz_in = crops.depth_crops if input_type != "COLOR" else None
        feats = self.model_crop.apply(variables_crop, rgb_in, xyz_in,
                                      train=False)
        keys = jax.random.split(key, max_instances)
        labels_crop = _cluster_crops(feats, crops.valid, keys, **self._ms_kw)
        labels_veto, order_key = veto_and_order(
            labels_crop, crops.mask_crops,
            crops.depth_crops[..., 2] if has_depth else None, crops.valid,
            max_labels=max(int(self._ms_kw["num_seeds"]) + 1, 2))
        if not has_depth:
            # RoI-area ordering (test_dataset.py:138-145)
            x0, y0, x1, y1 = (crops.rois[:, 0], crops.rois[:, 1],
                              crops.rois[:, 2], crops.rois[:, 3])
            area = ((y1 - y0 + 1) * (x1 - x0 + 1)).astype(jnp.float32)
            order_key = jnp.where(crops.valid, area, -jnp.inf)
        return labels_veto, order_key, crops.rois, crops.valid

    # -- public API -----------------------------------------------------------

    def next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def segment_sample(self, sample: dict, *, refine: bool = True,
                       return_features: bool = False) -> SegmentationResult:
        """The reference's de-facto public API shape: a sample dict in,
        labels out (test_sample, lib/fcn/test_dataset.py:232-267 — the ROS
        node and test_npy both call through this surface).

        Accepts {'image_color': [H,W,3] or [B,H,W,3], 'depth': optional
        [.,H,W,3] XYZ} (normalized, NHWC).
        """
        image = sample.get("image_color")
        depth = sample.get("depth")
        if image is not None and image.ndim == 3:
            image = image[None]
        if depth is not None and depth.ndim == 3:
            depth = depth[None]
        return self.segment(image, depth, refine=refine,
                            return_features=return_features)

    def segment(self, image: Optional[np.ndarray],
                xyz: Optional[np.ndarray] = None, *,
                refine: bool = True,
                return_features: bool = False) -> SegmentationResult:
        """Segment a batch of preprocessed RGB-D frames.

        Args:
          image: [B, H, W, 3] normalized BGR (ops.preprocess.normalize_bgr)
            or None when cfg.INPUT == 'DEPTH'.
          xyz: [B, H, W, 3] XYZ point-cloud image (ops.preprocess.compute_xyz)
            or None when cfg.INPUT == 'COLOR'.
          refine: run the stage-2 zoom-in network (if one was given).

        Arbitrary sizes: inputs whose H/W are not multiples of 16 are
        zero-padded bottom/right before the compiled graphs and the label
        outputs cropped back (the reference pads every demo/ROS frame the
        same way, lib/utils/blob.py:48-71 via tools/test_images.py:105-135;
        padded depth is z=0, so pad-region clusters fail the depth-validity
        filter exactly like the reference's).  Each distinct padded (H, W)
        compiles once (jit caches per shape).
        """
        timing: dict[str, float] = {}
        t0 = time.perf_counter()
        ref_shape = (image if image is not None else xyz).shape
        orig_hw = (int(ref_shape[1]), int(ref_shape[2]))
        ph = (-orig_hw[0]) % 16
        pw = (-orig_hw[1]) % 16
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            image = np.pad(np.asarray(image), pad) if image is not None \
                else None
            xyz = np.pad(np.asarray(xyz), pad) if xyz is not None else None
        img_d = jnp.asarray(image) if image is not None else None
        xyz_d = jnp.asarray(xyz) if xyz is not None else None

        b = (img_d if img_d is not None else xyz_d).shape[0]
        features, labels = self._stage1(self.variables, img_d, xyz_d,
                                        jax.random.split(self.next_key(), b))
        # host fetch, NOT block_until_ready: through the axon tunnel only a
        # host fetch reliably synchronizes, so timing["stage1"] would
        # under-report on the real chip otherwise (CLAUDE.md gotcha)
        labels_np = np.asarray(labels, dtype=np.int32)
        timing["stage1"] = time.perf_counter() - t0

        labels_refined = None
        if refine and self.model_crop is not None:
            t1 = time.perf_counter()
            b = labels.shape[0]
            refined = []
            for i in range(b):
                img_i = img_d[i] if img_d is not None else jnp.zeros(
                    xyz_d[i].shape, jnp.float32)
                xyz_i = (xyz_d[i] if xyz_d is not None
                         else jnp.zeros(img_d[i].shape, jnp.float32))
                # instance count from the already-fetched stage-1 labels
                # picks the smallest compiled bucket; the sparse->dense id
                # remap itself runs on device inside _stage2_impl
                k = int((np.unique(labels_np[i]) > 0).sum())
                bucket = next((bk for bk in self._buckets if bk >= k),
                              self.max_instances)
                labels_veto, order_key, rois, valid = self._stage2(
                    self.variables_crop, img_i, labels[i], xyz_i,
                    self.next_key(), has_depth=xyz is not None,
                    max_instances=bucket)
                fallback = None
                if self.refine_fallback:
                    # crop slot s holds dense id s+1; _dense_relabel maps
                    # each present id to its presence rank (rank(uniq[j])
                    # = j, background-0 present or not), which the host
                    # recovers from the sparse stage-1 labels it already
                    # fetched as a searchsorted against their uniques
                    uniq = np.unique(labels_np[i])
                    fallback = np.searchsorted(uniq, labels_np[i]).astype(
                        labels_np.dtype)
                ref = paste_back(labels_np[i],
                                 np.asarray(labels_veto),
                                 np.asarray(order_key), np.asarray(rois),
                                 np.asarray(valid), fallback_labels=fallback)
                refined.append(ref)
            labels_refined = np.stack(refined).astype(np.int32)
            timing["stage2"] = time.perf_counter() - t1

        timing["total"] = time.perf_counter() - t0
        if ph or pw:  # crop back to the caller's (H, W)
            h, w = orig_hw
            labels_np = labels_np[:, :h, :w]
            if labels_refined is not None:
                labels_refined = labels_refined[:, :h, :w]
        feats_np = None
        if return_features:
            feats_np = np.asarray(features)
            if ph or pw:
                feats_np = feats_np[:, :orig_hw[0], :orig_hw[1]]
        return SegmentationResult(
            labels=labels_np,
            labels_refined=labels_refined,
            features=feats_np,
            timing=timing)
