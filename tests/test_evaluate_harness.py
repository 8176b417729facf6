"""evaluate_dataset harness tests (stubbed segmentor, no model)."""

import os

import numpy as np

from unseenobjectclustering_tpu.engine.evaluate import (average_metrics,
                                                        depth_threshold_for,
                                                        evaluate_dataset)
from unseenobjectclustering_tpu.engine.pipeline import SegmentationResult


class StubDataset:
    def __init__(self, n=3, h=32, w=48):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        label = np.zeros((self.h, self.w), np.int32)
        label[4:12, 4:12] = 1
        label[16:28, 20:40] = 2
        return {"image_color": rng.rand(self.h, self.w, 3).astype(np.float32),
                "depth": rng.rand(self.h, self.w, 3).astype(np.float32),
                "label": label, "filename": f"img{i}"}


class StubSegmentor:
    """Returns ground truth as the prediction (perfect model)."""

    def __init__(self, dataset):
        self.dataset = dataset
        self.i = 0

    def segment(self, image, xyz=None, refine=True, **kw):
        gt = self.dataset[self.i]["label"]
        self.i += 1
        return SegmentationResult(
            labels=gt[None].astype(np.int32),
            labels_refined=gt[None].astype(np.int32) if refine else None,
            features=None, timing={})


def test_perfect_segmentor_scores_one(tmp_path):
    ds = StubDataset()
    seg = StubSegmentor(ds)
    out = str(tmp_path / "results")
    result, result_refined = evaluate_dataset(ds, seg, output_dir=out,
                                              refine=True, verbose=False)
    assert result["Objects F-measure"] == 1.0
    assert result_refined["Objects F-measure"] == 1.0
    assert result["obj_detected_075_percentage"] == 1.0
    # per-image .mat results persisted (test_dataset.py:337-340 parity)
    assert sorted(os.listdir(out)) == ["000000.mat", "000001.mat",
                                      "000002.mat"]
    import scipy.io
    m = scipy.io.loadmat(os.path.join(out, "000001.mat"))
    assert m["labels"].shape == (32, 48)


def test_depth_thresholds():
    assert depth_threshold_for("ocid_object_test") == 0.5
    assert depth_threshold_for("osd_object_test") == 0.8
    assert depth_threshold_for("tabletop_object_test") is None


def test_average_metrics():
    out = average_metrics([{"a": 1.0, "b": 0.0}, {"a": 0.0, "b": 1.0}])
    assert out == {"a": 0.5, "b": 0.5}
    assert average_metrics([]) == {}
