"""Real-time serving: camera-stream segmentation loop.

The TPU-native counterpart of the reference ROS node's processing core
(ros/test_images_segmentation.py:47-194) with the transport decoupled:
`StreamSegmentor` owns the latest-frame buffer (lock-guarded, newest wins —
:106-131), on-device preprocessing (normalize + backprojection), and the
two-stage Segmentor; the ROS wrapper (ros/test_images_segmentation.py in
this repo) is a thin topic adapter around it, so any transport (ROS, gRPC,
zmq, plain callbacks) can serve the same engine.
"""

from __future__ import annotations

import threading
import time
from typing import Any, NamedTuple, Optional

import numpy as np

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
from unseenobjectclustering_tpu.engine.pipeline import Segmentor


class Frame(NamedTuple):
    bgr: np.ndarray                 # [H, W, 3] uint8
    depth_m: Optional[np.ndarray]   # [H, W] float32 meters (or None)
    intrinsics: tuple               # (fx, fy, px, py)
    stamp: Any                      # opaque (e.g. ROS header)


class StreamResult(NamedTuple):
    labels: np.ndarray
    labels_refined: Optional[np.ndarray]
    stamp: Any
    latency_s: float
    # the frame the labels belong to, for overlay rendering downstream
    # (the reference node publishes label AND overlay topics)
    bgr: Optional[np.ndarray] = None


class StreamSegmentor:
    """Latest-frame poll-loop segmentation engine.

    Usage (transport-agnostic):
        ss = StreamSegmentor(cfg, segmentor)
        ss.submit(bgr, depth_m, (fx, fy, px, py), stamp)   # from any thread
        result = ss.process_latest()                        # worker loop
    """

    def __init__(self, cfg: Config, segmentor: Segmentor):
        self.cfg = cfg
        self.segmentor = segmentor
        self.pixel_means = cfg.pixel_means.astype(np.float32) / 255.0
        self._lock = threading.Lock()
        self._frame: Optional[Frame] = None

    def submit(self, bgr: np.ndarray, depth_m: Optional[np.ndarray],
               intrinsics: tuple, stamp: Any = None) -> None:
        """Store the newest frame (older unprocessed frames are dropped,
        matching the reference's latest-wins buffer)."""
        with self._lock:
            self._frame = Frame(bgr, depth_m, intrinsics, stamp)

    def process_latest(self, refine: bool = True
                       ) -> Optional[StreamResult]:
        """Segment the most recent frame; returns None when no frame is
        pending (ros/test_images_segmentation.py:134-161 semantics)."""
        with self._lock:
            frame, self._frame = self._frame, None
        if frame is None:
            return None
        t0 = time.perf_counter()
        image = (frame.bgr.astype(np.float32) / 255.0
                 - self.pixel_means)[None]
        xyz = None
        if frame.depth_m is not None and self.cfg.INPUT in ("DEPTH", "RGBD"):
            fx, fy, px, py = frame.intrinsics
            xyz = compute_xyz_np(frame.depth_m, fx, fy, px, py)[None]
        res = self.segmentor.segment(
            image if self.cfg.INPUT != "DEPTH" else None, xyz, refine=refine)
        return StreamResult(
            labels=res.labels[0],
            labels_refined=(res.labels_refined[0]
                            if res.labels_refined is not None else None),
            stamp=frame.stamp,
            latency_s=time.perf_counter() - t0,
            bgr=frame.bgr)

    def run_forever(self, callback, refine: bool = True,
                    poll_interval_s: float = 0.001,
                    should_stop=lambda: False) -> None:
        """Poll loop: segment frames as they arrive, invoke callback(result)
        (the reference's main loop, ros/test_images_segmentation.py:283-285).
        """
        while not should_stop():
            result = self.process_latest(refine=refine)
            if result is None:
                time.sleep(poll_interval_s)
                continue
            callback(result)
