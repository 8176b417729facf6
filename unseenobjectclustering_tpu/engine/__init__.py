"""Engine: two-stage inference pipeline, training step, evaluation loops."""

from unseenobjectclustering_tpu.engine.pipeline import (SegmentationResult,
                                                        Segmentor)

__all__ = ["Segmentor", "SegmentationResult"]
