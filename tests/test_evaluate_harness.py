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


def test_segment_sample_dict_api():
    """test_sample-shaped dict API (reference lib/fcn/test_dataset.py:232)."""
    import jax
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.engine.pipeline import Segmentor
    from unseenobjectclustering_tpu.models import get_network

    cfg = Config.from_dict({
        "INPUT": "RGBD", "TRAIN": {"NUM_UNITS": 4},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False}})
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    z = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
    seg = Segmentor(cfg, variables, depth_threshold=None)

    rng = np.random.RandomState(0)
    sample = {"image_color": rng.rand(32, 32, 3).astype(np.float32),
              "depth": rng.rand(32, 32, 3).astype(np.float32)}
    res = seg.segment_sample(sample, refine=False)
    assert res.labels.shape == (1, 32, 32)


def test_visualize_flag_saves_grids(tmp_path):
    ds = StubDataset(n=2)
    seg = StubSegmentor(ds)
    # give the stub a cfg with VISUALIZE on
    from unseenobjectclustering_tpu.config import Config
    seg.cfg = Config.from_dict({"TEST": {"VISUALIZE": True}})
    out = str(tmp_path / "viz")
    evaluate_dataset(ds, seg, output_dir=out, refine=False, verbose=False)
    names = sorted(os.listdir(out))
    assert "000000_vis.png" in names and "000001_vis.png" in names
